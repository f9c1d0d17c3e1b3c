"""Attribute per-step device time across model components by ablation.

Times a pipelined step (queue-full steady state, 20 steps) at one bucket shape
for: full model (pallas FFT), matmul-FFT conv, stock-FFT conv, backbone only,
head only. Differences localize where the 256x1024-step milliseconds go.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, params, *args, steps=20):
    import jax

    jfn = jax.jit(fn)
    np.asarray(jax.block_until_ready(jfn(params, *args)))  # compile + warm
    t0 = time.monotonic()
    outs = [jfn(params, *args) for _ in range(steps)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.monotonic() - t0) / steps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax.numpy as jnp

    from deepchopper_tpu.models import HeadConfig, HyenaTokenClassifier, init_params
    from deepchopper_tpu.models.config import SMALL_32K
    from deepchopper_tpu.models.hyena import HyenaBackbone
    from deepchopper_tpu.models.head import TokenClassificationHead
    from deepchopper_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    b, w = args.rows, args.width
    ids = jnp.asarray(np.full((b, w), 7, np.int32))
    quals = jnp.asarray(np.full((b, w), 0.03, np.float32))
    hidden = jnp.asarray(np.random.default_rng(0).random((b, w, 256), np.float32))

    head_cfg = HeadConfig()
    results = {}

    for impl in ("pallas_fft", "matmul_fft", "fft"):
        cfg = dataclasses.replace(SMALL_32K, conv_impl=impl)
        module = HyenaTokenClassifier(backbone_config=cfg, head_config=head_cfg)
        params = init_params(module, seq_len=128)

        def full(p, i, q, _m=module):
            return jnp.argmax(_m.apply({"params": p}, i, q), axis=-1).astype(jnp.int8)

        results[f"full[{impl}]"] = timed(full, params, ids, quals, steps=args.steps)

    import jax

    cfg = SMALL_32K
    bb = HyenaBackbone(cfg)
    bb_vars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 128), jnp.int32))

    def backbone_only(p, i):
        return bb.apply(p, i).astype(jnp.bfloat16)

    results["backbone_only"] = timed(backbone_only, bb_vars, ids, steps=args.steps)

    hd = TokenClassificationHead(head_cfg)
    hd_vars = hd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 256), jnp.float32), jnp.zeros((1, 128), jnp.float32)
    )

    def head_only(p, h, q):
        return jnp.argmax(hd.apply(p, h, q), axis=-1).astype(jnp.int8)

    results["head_only"] = timed(head_only, hd_vars, hidden, quals, steps=args.steps)

    tokens = b * w
    print(f"shape ({b}, {w}) = {tokens} tokens, {args.steps} steps (pipelined)")
    for name, s in results.items():
        print(f"  {name:18s}: {s*1e3:7.1f} ms/step  ({tokens/s/1e6:6.2f} Mtok/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
