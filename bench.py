"""Benchmark: single-chip fused predict+chop throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference documents 10-30 min for 1M reads on a single GPU
(reference: docs/faq.md:81) -> ~833 reads/s midpoint. vs_baseline is measured
reads/s divided by that.

Also writes BENCH_PROFILE.json beside this script with the host/device stage
breakdown (capability of the reference's scripts/measure.sh perf harness).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

BASELINE_READS_PER_S = 1_000_000 / (20 * 60)  # 833.3 reads/s (docs midpoint)


def synth_fastq(path: Path, n_reads: int, seed: int = 0, mean_len: int = 1200) -> None:
    """Nanopore-dRNA-like read lengths spanning the full bucket ladder.

    Body: lognormal around ~1.2 kb (the dRNA transcript bulk). Tail: 4% of
    reads drawn from a wider lognormal around ~7 kb so the 8k-32k buckets
    the engine compiles actually receive dispatches (round 3 clipped at
    8 kb, so warmup paid for long-read executables the measured run never
    exercised). Clip to [200, 32000]: 200 is the engine's shortest bucket
    regime, 32000 keeps reads inside the 32768-token window (longer reads
    take the truncation path, which is a correctness feature, not a
    throughput one)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    # BENCH_LEGACY_DIST=1 reproduces the round-3 distribution (clip at 8 kb,
    # no long tail) for apples-to-apples throughput comparison across rounds.
    legacy = os.environ.get("BENCH_LEGACY_DIST") == "1"
    with open(path, "wb") as fh:
        for i in range(n_reads):
            if legacy:
                n = int(np.clip(rng.lognormal(np.log(mean_len), 0.45), 200, 8000))
            elif rng.random() < 0.04:
                n = int(np.clip(rng.lognormal(np.log(7000), 0.7), 200, 32000))
            else:
                n = int(np.clip(rng.lognormal(np.log(mean_len), 0.45), 200, 32000))
            seq = rng.choice(bases, n).tobytes()
            qual = (rng.integers(33 + 5, 33 + 40, n).astype(np.uint8)).tobytes()
            fh.write(b"@bench_read_" + str(i).encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")


def current_rss_mb() -> float:
    """Current (not peak) RSS from /proc — lets the profile attribute memory
    to warmup/compile vs the streaming run (peak ru_maxrss can't)."""
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def main() -> int:
    # 12000 reads keeps the run short while amortizing per-bucket tail
    # batches closer to the 1M-read regime the baseline (docs/faq.md:81)
    # describes — at 6000 the 17-bucket ladder's tail batches were ~20% of
    # dispatched tokens, a regime no production run sits in.
    n_reads = int(os.environ.get("BENCH_READS", "12000"))
    tokens_per_batch = int(os.environ.get("BENCH_TOKENS", str(1 << 18)))

    from deepchopper_tpu.chop import ChopOptions
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.infer.fused import fused_predict_chop
    from deepchopper_tpu.models.registry import DeepChopper
    from deepchopper_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    print(f"# persistent compile cache: {cache_dir}", file=sys.stderr)

    import jax

    with tempfile.TemporaryDirectory() as tmp:
        fq = Path(tmp) / "bench.fq"
        synth_fastq(fq, n_reads)

        bundle = DeepChopper.new("hyenadna-small-32k-seqlen", seed=0)
        engine = PredictEngine(
            bundle,
            max_length=32768,
            tokens_per_batch=tokens_per_batch,
            return_labels=True,
        )

        # One-time Pallas runtime setup first (measured separately — its cost
        # is service-load-dependent and NOT a per-bucket compile cost), then
        # precompile every bucket shape so the timed region is compile-free.
        setup_s = engine.runtime_setup()
        print(f"# pallas runtime setup in {setup_s:.1f}s", file=sys.stderr)

        # Executed Pallas smoke at a tiny shape: a Mosaic regression in the
        # fused mixer kernel (the model's actual conv path) fails HERE in
        # seconds instead of mid-warmup. (AOT lower().compile() would NOT
        # catch it — the Mosaic compile happens at first execution, not at
        # XLA compile time.)
        if jax.default_backend() == "tpu":
            import jax.numpy as jnp
            import numpy as np

            from deepchopper_tpu.ops.pallas_fft import mixer_fft_conv_bm

            t_smoke = time.monotonic()
            y = mixer_fft_conv_bm(
                jnp.ones((2, 3 * 256, 256), jnp.bfloat16),
                jnp.ones((3, 1, 3 * 256), jnp.float32) * 0.1,
                jnp.zeros((3 * 256,), jnp.float32),
                jnp.ones((256, 256), jnp.float32) * 1e-3,
                jnp.zeros((256,), jnp.float32),
            )
            assert np.isfinite(np.asarray(y, np.float32)).all()
            print(
                f"# mixer pallas smoke ran in {time.monotonic() - t_smoke:.1f}s",
                file=sys.stderr,
            )

        # Cold-start phase (BENCH_STREAM_WARMUP=0 skips): start the bucket
        # ladder compiling in the BACKGROUND and stream a small slice
        # immediately — batches decompose onto whatever row variants have
        # landed (bit-exact), measuring time-to-first-chopped-record the way
        # the reference's Rust chop streams from t=0 (src/bin/predict.rs:275).
        time_to_first_record_s = None
        cold_reads_per_s = None
        if os.environ.get("BENCH_STREAM_WARMUP", "1") == "1":
            from deepchopper_tpu.infer.engine import PredictStats

            cold_fq = Path(tmp) / "cold.fq"
            cold_n = int(os.environ.get("BENCH_COLD_READS", "2000"))
            synth_fastq(cold_fq, cold_n, seed=1)
            fut = engine.warmup_async()
            t_cold = time.monotonic()
            cold_stats = fused_predict_chop(
                engine, cold_fq, ChopOptions(output_prefix=str(Path(tmp) / "cold_out"))
            )
            cold_elapsed = time.monotonic() - t_cold
            time_to_first_record_s = round(cold_stats.first_write_s, 2)
            cold_reads_per_s = round(cold_n / cold_elapsed, 1)
            print(
                f"# cold start: first chopped record at {time_to_first_record_s}s, "
                f"{cold_n} reads in {cold_elapsed:.1f}s during warmup",
                file=sys.stderr,
            )
            compile_s = fut.result()  # wait out the rest of the ladder
            # Touch every compiled executable with one real dispatch, then
            # fetch: the tunnel keeps recently-used programs hot, and the
            # big row variants (compiled in the background, never dispatched
            # during the cold stream) otherwise pay ~2s of one-time load
            # costs inside the timed region (measured: first post-warmup
            # pass 6.9s, second 4.9s).
            import jax.numpy as jnp
            import numpy as np

            t_touch = time.monotonic()
            out = None
            for r, w in sorted(engine._compiled):
                step = engine._get_step((r, w))
                out = step(
                    engine._params, jnp.zeros((r, w), jnp.int8), jnp.zeros((r, w), jnp.uint8)
                )
            if out is not None:
                np.asarray(out)
            print(f"# touch pass over {len(engine._compiled)} executables: "
                  f"{time.monotonic() - t_touch:.1f}s", file=sys.stderr)
            # Main phase measures steady state: keep compile_s, drop the
            # cold phase's read/dispatch counters.
            engine.stats = PredictStats(
                compile_s=engine.stats.compile_s, setup_s=engine.stats.setup_s
            )
        else:
            compile_s = engine.warmup()
        rss_after_warmup = current_rss_mb()
        print(
            f"# warmup compiled {len(engine.buckets)} buckets in {compile_s:.1f}s "
            f"(+{setup_s:.1f}s one-time runtime setup), RSS {rss_after_warmup:.0f} MB",
            file=sys.stderr,
        )

        t0 = time.monotonic()
        opts = ChopOptions(output_prefix=str(Path(tmp) / "bench_out"))
        stats = fused_predict_chop(engine, fq, opts)
        elapsed = time.monotonic() - t0

        reads_per_s = n_reads / elapsed
        print(
            json.dumps(
                {
                    "metric": "predict_chop_reads_per_s_1chip",
                    "value": round(reads_per_s, 1),
                    "unit": "reads/s",
                    "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 2),
                }
            )
        )
        # MFU bounds from XLA's own per-executable cost model (v5e bf16 peak
        # = 197 TFLOP/s). `device_s` is the feed thread's blocked-on-results
        # time — with the async pipeline the device is also busy while the
        # host works, so flops/device_s OVERSTATES utilization (upper bound);
        # flops/elapsed understates it (lower bound). Truth is in between.
        flops = engine.estimated_flops()
        device_s = stats.device_s or elapsed
        mfu_upper = mfu_lower = None
        if flops:
            mfu_upper = round(flops / device_s / 197e12, 4)
            mfu_lower = round(flops / elapsed / 197e12, 4)
        profile = {
            "n_reads": n_reads,
            "device_flops_dispatched": flops,
            "estimated_mfu_upper_vs_197tflops": mfu_upper,
            "estimated_mfu_lower_vs_197tflops": mfu_lower,
            "elapsed_s": round(elapsed, 3),
            "reads_per_s": round(reads_per_s, 1),
            "tokens": int(engine.stats.tokens),
            "tokens_per_s": round(engine.stats.tokens / elapsed, 0),
            "padded_tokens": int(engine.stats.padded_tokens),
            "padding_efficiency": round(
                engine.stats.tokens / max(engine.stats.padded_tokens, 1), 3
            ),
            "device_batches": int(engine.stats.batches),
            "tokens_per_batch": tokens_per_batch,
            "runtime_setup_s": round(setup_s, 1),
            "warmup_compile_s": round(compile_s, 1),
            # Streaming-warmup cold start: wall from stream start to the
            # first chopped record, and throughput DURING warmup.
            "time_to_first_record_s": time_to_first_record_s,
            "cold_phase_reads_per_s": cold_reads_per_s,
            "n_buckets": len(engine.buckets),
            # per compiled (rows, width) shape: dispatch count — shows which
            # buckets the measured run actually exercised
            "dispatches_by_shape": {
                f"{r}x{w}": c for (r, w), c in sorted(engine.stats.shape_counts.items())
            },
            "stage_breakdown_s": {
                "host_encode": round(stats.encode_s, 3),
                "device_wait": round(stats.device_s, 3),
                "smooth_extract": round(stats.smooth_s, 3),
                "chop_write": round(stats.chop_write_s, 3),
            },
            "output_records": stats.total_output_count,
            "peak_rss_mb": round(stats.peak_rss_bytes / 1e6, 1),
            # memory attribution: warmup/compile-held vs streaming growth
            "rss_after_warmup_mb": round(rss_after_warmup, 1),
            "rss_after_run_mb": round(current_rss_mb(), 1),
        }
        # Secondary metric: the Caduceus family end-to-end (the reference's
        # best-F1 checkpoint family is caduceus-ph, BASELINE.md). Small
        # bucket set, full-target row variants only: a throughput probe,
        # not a padding-efficiency run. BENCH_CADUCEUS=0 skips.
        if os.environ.get("BENCH_CADUCEUS", "1") == "1":
            cad_n = int(os.environ.get("BENCH_CADUCEUS_READS", "2000"))
            cad_fq = Path(tmp) / "cad.fq"
            synth_fastq(cad_fq, cad_n, seed=2)
            cad_bundle = DeepChopper.new(
                "caduceus-ph_seqlen-131k_d_model-256_n_layer-16", seed=0
            )
            os.environ["DEEPCHOPPER_ROW_VARIANTS"] = ""  # t-only ladder
            try:
                cad_engine = PredictEngine(
                    cad_bundle,
                    max_length=2048,
                    tokens_per_batch=1 << 15,
                    buckets=[512, 1024, 2048],
                    return_labels=True,
                )
                cad_warm = cad_engine.warmup()
                t0 = time.monotonic()
                cad_stats = fused_predict_chop(
                    cad_engine, cad_fq, ChopOptions(output_prefix=str(Path(tmp) / "cad_out"))
                )
                cad_elapsed = time.monotonic() - t0
                profile["caduceus"] = {
                    "model": "caduceus-ph_seqlen-131k_d_model-256_n_layer-16",
                    "n_reads": cad_n,
                    "max_length": 2048,
                    "reads_per_s": round(cad_n / cad_elapsed, 1),
                    "tokens_per_s": round(cad_engine.stats.tokens / cad_elapsed, 0),
                    "elapsed_s": round(cad_elapsed, 2),
                    "warmup_compile_s": round(cad_warm, 1),
                    "output_records": cad_stats.total_output_count,
                }
                print(f"# caduceus: {json.dumps(profile['caduceus'])}", file=sys.stderr)
            finally:
                os.environ.pop("DEEPCHOPPER_ROW_VARIANTS", None)

        Path(__file__).with_name("BENCH_PROFILE.json").write_text(
            json.dumps(profile, indent=1) + "\n"
        )
        print(f"# profile: {json.dumps(profile)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
