"""Benchmark: single-chip predict throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference documents 10-30 min for 1M reads on a single GPU
(reference: docs/faq.md:81) -> ~833 reads/s midpoint. vs_baseline is measured
reads/s divided by that.
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
    import numpy as np

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as fh:
        for i in range(n_reads):
            n = int(np.clip(rng.lognormal(np.log(mean_len), 0.45), 200, 8000))
            seq = rng.choice(bases, n).tobytes()
            qual = (rng.integers(33 + 5, 33 + 40, n).astype(np.uint8)).tobytes()
            fh.write(b"@bench_read_" + str(i).encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")


def main() -> int:
    n_reads = int(os.environ.get("BENCH_READS", "3000"))

    from deepchopper_tpu.chop import ChopOptions
    from deepchopper_tpu.chop.pipeline import stream_chop_with_predicts
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    with tempfile.TemporaryDirectory() as tmp:
        fq = Path(tmp) / "bench.fq"
        synth_fastq(fq, n_reads)

        bundle = DeepChopper.new("hyenadna-small-32k-seqlen", seed=0)
        engine = PredictEngine(
            bundle,
            max_length=32768,
            tokens_per_batch=1 << 17,
            return_labels=True,
        )

        # Precompile every bucket shape so the timed region is compile-free.
        compile_s = engine.warmup()
        print(f"# warmup compiled {len(engine.buckets)} buckets in {compile_s:.1f}s", file=sys.stderr)

        t0 = time.monotonic()
        predicts = engine.predict_to_predicts(fq)
        opts = ChopOptions(output_prefix=str(Path(tmp) / "bench_out"))
        stats = stream_chop_with_predicts(predicts, fq, opts)
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
        print(
            f"# {n_reads} reads in {elapsed:.2f}s end-to-end (predict+chop); "
            f"output {stats.total_output_count} records; compile excluded via warmup",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
