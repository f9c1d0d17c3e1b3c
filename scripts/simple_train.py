#!/usr/bin/env python
"""Minimal alternative trainer over the raw step functions.

Capability of the reference's scripts/hg_train.py (a pure-HF-Trainer
alternative to the Lightning harness): a flat script over the framework's
building blocks, handy for quick experiments without the Trainer class.

    python scripts/simple_train.py train.parquet --epochs 3 --model cnn
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data", help="parquet or FASTQ with |start:end annotations")
    ap.add_argument("--model", default="hyenadna-tiny-1k-seqlen")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--max-length", type=int, default=1024)
    ap.add_argument("--tokens-per-batch", type=int, default=1 << 14)
    ap.add_argument("--out", default="simple_train_out")
    args = ap.parse_args()

    import jax
    import numpy as np
    import optax

    from deepchopper_tpu.data.parquet_module import DataModule
    from deepchopper_tpu.models.registry import DeepChopper, save_checkpoint
    from deepchopper_tpu.train.metrics import BinaryStats, stats_from_array
    from deepchopper_tpu.train.step import init_train_state, make_eval_step, make_train_step

    bundle = DeepChopper.new(args.model)
    tx = optax.adam(args.lr)
    state = init_train_state(bundle.params, tx)
    train_step = jax.jit(make_train_step(bundle.module.apply, tx, 0.0))
    eval_step = jax.jit(make_eval_step(bundle.module.apply, 0.0))

    dm = DataModule(
        train_data_path=args.data,
        max_length=args.max_length,
        tokens_per_batch=args.tokens_per_batch,
    )

    def device_batch(b):
        return {"input_ids": b.input_ids, "input_quals": b.quals, "labels": b.labels}

    for epoch in range(args.epochs):
        t0 = time.monotonic()
        losses = []
        for batch in dm.train_batches(epoch):
            state, aux = train_step(state, device_batch(batch))
            losses.append(float(aux["loss"]))
        stats = BinaryStats()
        vlosses = []
        for batch in dm.val_batches():
            out = eval_step(state.params, device_batch(batch))
            vlosses.append(float(out["loss"]))
            stats = stats + stats_from_array(np.asarray(out["stats"]))
        print(
            f"epoch {epoch}: train/loss={np.mean(losses):.4f} "
            f"val/loss={np.mean(vlosses):.4f} val/f1={stats.f1:.4f} "
            f"({time.monotonic() - t0:.1f}s)"
        )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_checkpoint(out / "final.ckpt", state.params, {"name": args.model})
    print(f"saved {out / 'final.ckpt'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
