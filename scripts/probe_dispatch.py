"""Probe per-dispatch overhead vs steady-state device throughput on one bucket.

Answers the tuning question from the round-2 profile (89% device-wait): how
much of each device step is fixed dispatch/tunnel latency vs compute, i.e.
whether fewer-larger dispatches (bigger --tokens) would pay.

Usage: python scripts/probe_dispatch.py [--width 1024] [--rows 256] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    bundle = DeepChopper.new("hyenadna-small-32k-seqlen", seed=0)
    engine = PredictEngine(
        bundle,
        max_length=32768,
        tokens_per_batch=args.rows * args.width,
        return_labels=True,
    )
    shape = (args.rows, args.width)
    step = engine._get_step(shape)
    ids = jnp.asarray(np.full(shape, 7, np.int8))
    quals = jnp.asarray(np.full(shape, 20, np.uint8))

    # One warm call + fetch (absorbs transfer-path setup).
    np.asarray(step(engine._params, ids, quals))

    # A) fully synchronous: dispatch -> block, per step.
    t0 = time.monotonic()
    for _ in range(args.steps):
        np.asarray(step(engine._params, ids, quals))
    sync_s = (time.monotonic() - t0) / args.steps

    # B) pipelined: dispatch all, block once (device queue stays full).
    t0 = time.monotonic()
    outs = [step(engine._params, ids, quals) for _ in range(args.steps)]
    for o in outs:
        np.asarray(o)
    pipe_s = (time.monotonic() - t0) / args.steps

    flops = engine.estimated_flops()
    per_step_flops = (flops or 0.0) / max(engine.stats.shape_counts.get(shape, 1), 1)
    # stats.shape_counts only counts predict_batches dispatches; compute directly:
    try:
        ca = (
            step.lower(
                engine._params,
                jax.ShapeDtypeStruct(shape, jnp.int8),
                jax.ShapeDtypeStruct(shape, jnp.uint8),
            )
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        per_step_flops = float(ca.get("flops", 0.0))
    except Exception:
        pass

    tokens = args.rows * args.width
    print(f"shape {shape} = {tokens} tokens, {args.steps} steps")
    print(f"  sync     : {sync_s*1e3:8.1f} ms/step  ({tokens/sync_s/1e6:6.2f} Mtok/s)")
    print(f"  pipelined: {pipe_s*1e3:8.1f} ms/step  ({tokens/pipe_s/1e6:6.2f} Mtok/s)")
    print(f"  dispatch overhead ~ {max(sync_s-pipe_s,0)*1e3:.1f} ms/step")
    if per_step_flops:
        print(
            f"  XLA flops/step {per_step_flops/1e9:.2f} GFLOP -> "
            f"pipelined {per_step_flops/pipe_s/1e12:.2f} TFLOP/s "
            f"({per_step_flops/pipe_s/197e12*100:.1f}% of v5e bf16 peak)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
