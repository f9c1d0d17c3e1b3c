"""Encode-only host throughput: how many chips can one host feed?

VERDICT-r4 item 6: the C++ encode plane (SpanBatchSource: native.fq_index
span scan + threaded encode_spans_batch) had no standalone throughput
number, so the multi-chip crossover — the point where the 2-vCPU host
becomes the bottleneck feeding data-parallel chips — was unquantified.

Streams a synthetic FASTQ through the EXACT production feed path with the
device mocked out (batches are consumed and dropped), measuring reads/s and
tokens/s of pure host encode:

    python scripts/probe_encode.py --reads 40000

Host-only: safe to run without the TPU. Prints a JSON line with the encode
ceiling and the implied chip crossover at the current flagship device
throughput (reads/s from BENCH_PROFILE.json when present).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=40000)
    ap.add_argument("--tokens-per-batch", type=int, default=1 << 18)
    ap.add_argument("--max-length", type=int, default=32768)
    args = ap.parse_args()

    from bench import synth_fastq  # same distribution as the device bench

    from deepchopper_tpu import native
    from deepchopper_tpu.data.span_batches import SpanBatchSource

    if not native.available():
        print("native host ops unavailable — the C++ encode plane is the subject", file=sys.stderr)
        return 1

    with tempfile.TemporaryDirectory() as tmp:
        fq = Path(tmp) / "encode.fq"
        synth_fastq(fq, args.reads)

        chunks = []
        source = SpanBatchSource(
            fq,
            max_length=args.max_length,
            tokens_per_batch=args.tokens_per_batch,
            on_chunk=chunks.append,
            max_lag_chunks=10**9,  # no backpressure: chunks are dropped below
        )
        n_reads = 0
        tokens = 0
        t0 = time.monotonic()
        for batch in source.batches():
            n_reads += batch.input_ids.shape[0]
            tokens += int(batch.lengths.sum())
            chunks.clear()  # release chunk buffers (no chop stage here)
        elapsed = time.monotonic() - t0

    reads_per_s = n_reads / elapsed
    tokens_per_s = tokens / elapsed
    result = {
        "metric": "host_encode_only",
        "n_reads": n_reads,
        "elapsed_s": round(elapsed, 2),
        "reads_per_s": round(reads_per_s, 1),
        "tokens_per_s": round(tokens_per_s, 0),
    }
    # implied crossover vs the measured 1-chip device throughput
    bench_profile = Path(__file__).resolve().parent.parent / "BENCH_PROFILE.json"
    if bench_profile.exists():
        prof = json.loads(bench_profile.read_text())
        chip = prof.get("reads_per_s")
        if chip:
            result["one_chip_reads_per_s"] = chip
            result["chips_one_host_can_feed"] = round(reads_per_s / chip, 2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
