"""Measure the flagship TRAIN step on the real chip -> TRAIN_PROFILE.json.

VERDICT-r4 item 4: inference had three rounds of hardware numbers, training
had none. This measures the full production train step — forward (fused
Pallas mixer), backward (custom VJPs recompute the forward through the
XLA composed reference, ops/pallas_fft.py _mixer_bwd), loss, Adam update —
at a production shape, and attributes forward vs backward+update cost:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_profile.py

Writes TRAIN_PROFILE.json at the repo root:
  step_ms, tokens_per_s, mfu (vs 197 TFLOP/s v5e bf16 peak, using 3x the
  forward FLOPs as the standard fwd+bwd estimate), plus forward-only and
  grad-only timings so the backward's recompute overhead is visible.

Methodology per docs/performance.md: within-process, min of >=3 trials of
>=5 iterations, scalar host fetch to force completion (block_until_ready
returns early on the tunneled backend).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=5, trials=3, fetch=lambda r: None):
    best = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        r = None
        for _ in range(iters):
            r = fn(*args)
        fetch(r)
        best = min(best, (time.monotonic() - t0) / iters)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--width", type=int, default=8192)
    ap.add_argument("--model", default="hyenadna-small-32k-seqlen")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "TRAIN_PROFILE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepchopper_tpu.models.registry import DeepChopper
    from deepchopper_tpu.train.step import init_train_state, make_optimizer, make_train_step
    from deepchopper_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    b, w = args.rows, args.width
    tokens = b * w
    bundle = DeepChopper.new(args.model, seed=0)
    tx = make_optimizer(2e-4)
    state = init_train_state(bundle.params, tx)
    train_step = jax.jit(make_train_step(bundle.module.apply, tx))

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(7, 11, (b, w)), jnp.int32),
        "input_quals": jnp.asarray(rng.random((b, w)) * 0.05, jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, (b, w)), jnp.int32),
    }

    t0 = time.monotonic()
    state2, aux = train_step(state, batch)
    float(aux["loss"])
    compile_s = time.monotonic() - t0
    print(f"train step compile+first: {compile_s:.1f}s  loss={float(aux['loss']):.4f}")

    def run_step(state):
        s2, aux2 = train_step(state, batch)
        return s2, aux2

    # steady-state step time (state threading donates nothing here — keep the
    # same state input so timing is pure step cost, not Python churn)
    step_s = timeit(
        lambda: train_step(state, batch),
        iters=args.iters,
        fetch=lambda r: float(r[1]["loss"]),
    )

    # forward-only (same loss computation, no grad/opt)
    from deepchopper_tpu.train.loss import continuous_interval_loss

    def fwd_only(params, batch):
        logits = bundle.module.apply({"params": params}, batch["input_ids"], batch["input_quals"])
        return continuous_interval_loss(logits, batch["labels"], 0.0)

    fwd_jit = jax.jit(fwd_only)
    float(fwd_jit(state.params, batch))
    fwd_s = timeit(lambda: fwd_jit(state.params, batch), iters=args.iters, fetch=float)

    # grad-only (no optimizer update): isolates the VJP recompute cost.
    # Returns loss + grad global-norm so the backward survives DCE.
    import optax

    def _loss_and_gnorm(p, bt):
        loss, g = jax.value_and_grad(fwd_only)(p, bt)
        return loss + 0.0 * optax.global_norm(g), optax.global_norm(g)

    grad_jit = jax.jit(_loss_and_gnorm)
    print("grad norm:", float(grad_jit(state.params, batch)[1]))
    grad_s = timeit(
        lambda: grad_jit(state.params, batch), iters=args.iters, fetch=lambda r: float(r[1])
    )

    # FLOPs: XLA's own cost analysis of the full train step
    try:
        ca = train_step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0

    peak = 197e12
    profile = {
        "model": args.model,
        "shape": f"{b}x{w}",
        "tokens_per_step": tokens,
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_s * 1e3, 2),
        "tokens_per_s": round(tokens / step_s, 0),
        "forward_only_ms": round(fwd_s * 1e3, 2),
        "grad_ms": round(grad_s * 1e3, 2),
        "opt_update_ms": round((step_s - grad_s) * 1e3, 2),
        "bwd_over_fwd": round((grad_s - fwd_s) / fwd_s, 2) if fwd_s else None,
        "xla_flops_per_step": flops or None,
        "mfu_vs_197tflops": round(flops / step_s / peak, 4) if flops else None,
    }
    # Merge into the existing profile keyed by model, so the flagship and
    # Caduceus measurements coexist in one TRAIN_PROFILE.json.
    out_path = Path(args.out)
    merged: dict = {}
    if out_path.exists():
        try:
            prev = json.loads(out_path.read_text())
            merged = prev if all(isinstance(v, dict) for v in prev.values()) else {prev["model"]: prev}
        except Exception:
            merged = {}
    merged[args.model] = profile
    out_path.write_text(json.dumps(merged, indent=1) + "\n")
    print(json.dumps(profile, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
