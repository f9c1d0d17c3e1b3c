"""Per-op device profile of one predict step (the VERDICT-r4 'dense plane').

Captures a jax.profiler trace of the engine-equivalent labels step at one
bucket shape, parses the trace-viewer JSON, and prints the per-HLO-op time
table (device track), plus dumps the optimized HLO so fusion names can be
mapped back to their ops:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py \
        --rows 256 --width 1024 --steps 10

Timing methodology per docs/performance.md: within-process, warm executable,
min-of-trials wall check printed alongside the trace totals (the trace is
authoritative for attribution, the wall for absolute step time).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_step(model: str, fuse_short: bool):
    import jax
    import jax.numpy as jnp

    from deepchopper_tpu.models.registry import DeepChopper

    bundle = DeepChopper.from_pretrained(model, random_init=True)
    module = bundle.module

    def _labels_step(params, ids_i8, quals_u8):
        ids = ids_i8.astype(jnp.int32)
        q = quals_u8.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        q = q / jnp.maximum(norm, 1e-12)
        logits = module.apply({"params": params}, ids, q)
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    return bundle, jax.jit(_labels_step)


def parse_trace(trace_dir: str, steps: int) -> tuple[dict, float]:
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_op: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            name = e.get("name", "?")
            dur_ms = e.get("dur", 0) / 1000.0
            per_op[name] += dur_ms / steps
            counts[name] += 1
            if name not in ("copy-start", "copy-done") and not name.startswith("jit_"):
                total += dur_ms / steps
    return {k: (v, counts[k]) for k, v in per_op.items()}, total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--model", default="rna002")
    ap.add_argument("--trace-dir", default="/tmp/dc_step_trace")
    ap.add_argument("--hlo-out", default="/tmp/dc_step_hlo.txt")
    ap.add_argument("--json-out", default=None, help="write the per-op table as JSON")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepchopper_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    bundle, jfn = build_step(args.model, True)
    b, w = args.rows, args.width
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(7, 11, (b, w), dtype=np.int8))
    quals = jnp.asarray(rng.integers(1, 40, (b, w), dtype=np.uint8))
    params = jax.device_put(bundle.params)

    t0 = time.monotonic()
    out = jfn(params, ids, quals)
    np.asarray(out)
    print(f"compile+first-exec: {time.monotonic() - t0:.1f}s", flush=True)

    # HLO dump for fusion-name -> op mapping
    try:
        hlo = jfn.lower(params, ids, quals).compile().as_text()
        Path(args.hlo_out).write_text(hlo)
        print(f"optimized HLO -> {args.hlo_out} ({len(hlo)} bytes)")
    except Exception as exc:  # pragma: no cover
        print("HLO dump failed:", exc)

    # wall-clock step time (min of 3 trials x steps)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        outs = [jfn(params, ids, quals) for _ in range(args.steps)]
        np.asarray(outs[-1])  # host fetch forces completion on this backend
        best = min(best, (time.monotonic() - t0) / args.steps)
    print(f"wall step: {best * 1e3:.2f} ms  ({b}x{w} = {b*w} tokens, "
          f"{b*w/best/1e6:.2f} Mtok/s)")

    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    outs = [jfn(params, ids, quals) for _ in range(args.steps)]
    np.asarray(outs[-1])
    jax.profiler.stop_trace()

    per_op, total = parse_trace(args.trace_dir, args.steps)
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(f"\ndevice total (sum of op events / step): {total:.2f} ms")
    print(f"{'ms/step':>9}  {'count':>5}  op")
    for name, (ms, n) in rows:
        if ms < 0.01:
            continue
        print(f"{ms:9.3f}  {n:5d}  {name}")
    if args.json_out:
        Path(args.json_out).write_text(
            json.dumps({k: v[0] for k, v in rows}, indent=1)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
