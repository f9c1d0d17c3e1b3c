"""Generate the frozen golden chop outputs under tests/golden/.

The north-star regression for the chop stage is byte-identical output given
fixed predictions (reference oracle: src/bin/predict.rs:197-384 over the
`.pt` fixtures in tests/data/eval). This script:

1. loads the reference's own prediction fixtures
   (/root/reference/tests/data/eval/chunk{0,1}/*.pt, 72 reads),
2. reconstructs a deterministic FASTQ for them (sequences from the
   predictions; qualities from a seeded RNG — committed, so stable),
3. runs the chop pipeline under every output mode and freezes the
   DECOMPRESSED output bytes.

Re-run only when the chop contract intentionally changes:
    python tests/golden/make_golden.py
Any unintentional semantic drift in smooth/split/annotate then fails
tests/test_golden_chop.py byte-for-byte.
"""

from __future__ import annotations

import gzip
import sys
from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).resolve().parent
EVAL_FIXTURES = Path("/root/reference/tests/data/eval")

sys.path.insert(0, str(GOLDEN.parent.parent))

from deepchopper_tpu.chop import ChopOptions  # noqa: E402
from deepchopper_tpu.chop.pipeline import run_chop  # noqa: E402
from deepchopper_tpu.io.chop import ChopType  # noqa: E402
from deepchopper_tpu.io.parquet import write_predicts  # noqa: E402
from deepchopper_tpu.io.predicts import load_predicts_from_batch_pts  # noqa: E402

VARIANTS = {
    "chop_default": {},
    "chop_ocq": {"output_chopped_seqs": True},
    "chop_terminal": {"chop_type": ChopType.TERMINAL},
    "chop_internal": {"chop_type": ChopType.INTERNAL},
}


def build_fastq(path: Path) -> None:
    predicts = load_predicts_from_batch_pts(EVAL_FIXTURES)
    assert len(predicts) == 72, len(predicts)
    rng = np.random.default_rng(20260819)
    with open(path, "wb") as fh:
        for rid in sorted(predicts):
            p = predicts[rid]
            qual = (rng.integers(38, 74, len(p.seq)).astype(np.uint8)).tobytes()
            fh.write(b"@%s\n%s\n+\n%s\n" % (rid.encode(), p.seq.encode(), qual))


def main() -> int:
    fq = GOLDEN / "eval_reads.fq"
    build_fastq(fq)
    for name, kw in VARIANTS.items():
        opts = ChopOptions(output_prefix=str(GOLDEN / f".tmp_{name}"), **kw)
        stats = run_chop([EVAL_FIXTURES], fq, opts)
        raw = gzip.open(stats.output_file, "rb").read()
        (GOLDEN / f"{name}.fq").write_bytes(raw)
        Path(stats.output_file).unlink()
        print(f"{name}: {stats.total_fq_count} reads -> {stats.total_output_count} records, {len(raw)} bytes")

    # write_predicts path (reference: src/python.rs:710-782): labels +
    # sequences from a parquet dataset -> chopped fastq.
    from deepchopper_tpu.io.parquet import write_parquet

    predicts = load_predicts_from_batch_pts(EVAL_FIXTURES)
    rng = np.random.default_rng(99)
    items = sorted(predicts.items())
    rows = [
        {
            "id": rid,
            "seq": p.seq,
            "qual": rng.integers(5, 41, len(p.seq)).astype(np.int32).tolist(),
            "target": [0, 0],
        }
        for rid, p in items
    ]
    dataset = GOLDEN / ".tmp_dataset.parquet"
    write_parquet(rows, dataset)
    out = GOLDEN / ".tmp_write_predicts.fq.gz"
    write_predicts(
        dataset,
        out,
        [p.prediction for _, p in items],
        smooth_window_size=21,
        min_interval_size=13,
        approved_interval_number=20,
    )
    raw = gzip.open(out, "rb").read()
    (GOLDEN / "write_predicts.fq").write_bytes(raw)
    out.unlink()
    dataset.unlink()
    print(f"write_predicts: {len(rows)} rows, {len(raw)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
