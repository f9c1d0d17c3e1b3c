"""Golden byte-oracle: chop output is frozen byte-for-byte.

The chop stage's north star is byte-identical output given fixed predictions
(reference oracle: src/bin/predict.rs:197-384 over tests/data/eval fixtures).
tests/golden/ holds the frozen decompressed outputs for every output mode,
generated once by tests/golden/make_golden.py from the reference's own `.pt`
fixtures. ANY semantic drift in smoothing, region extraction, interval
complement math, passthrough rules, or id annotation fails these tests.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import pytest

from deepchopper_tpu.chop import ChopOptions
from deepchopper_tpu.chop.pipeline import run_chop
from deepchopper_tpu.io.chop import ChopType

GOLDEN = Path(__file__).resolve().parent / "golden"
EVAL_FIXTURES = Path("/root/reference/tests/data/eval")

pytestmark = pytest.mark.skipif(
    not EVAL_FIXTURES.exists(), reason="reference eval fixtures not available"
)

VARIANTS = {
    "chop_default": {},
    "chop_ocq": {"output_chopped_seqs": True},
    "chop_terminal": {"chop_type": ChopType.TERMINAL},
    "chop_internal": {"chop_type": ChopType.INTERNAL},
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_chop_bytes_match_golden(tmp_path, name):
    opts = ChopOptions(output_prefix=str(tmp_path / name), **VARIANTS[name])
    stats = run_chop([EVAL_FIXTURES], GOLDEN / "eval_reads.fq", opts)
    got = gzip.open(stats.output_file, "rb").read()
    want = (GOLDEN / f"{name}.fq").read_bytes()
    assert got == want, f"{name}: chop output drifted from golden ({len(got)} vs {len(want)} bytes)"


def test_chop_bytes_match_golden_numpy_fallback(tmp_path, monkeypatch):
    """The pure-NumPy (no native lib) path must produce the same bytes."""
    monkeypatch.setenv("DEEPCHOPPER_NO_NATIVE", "1")
    import importlib

    import deepchopper_tpu.native as native

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    opts = ChopOptions(output_prefix=str(tmp_path / "np"))
    stats = run_chop([EVAL_FIXTURES], GOLDEN / "eval_reads.fq", opts)
    got = gzip.open(stats.output_file, "rb").read()
    assert got == (GOLDEN / "chop_default.fq").read_bytes()


def test_write_predicts_matches_golden(tmp_path):
    import gzip as _gz

    import numpy as np

    from deepchopper_tpu.io.parquet import write_parquet, write_predicts
    from deepchopper_tpu.io.predicts import load_predicts_from_batch_pts

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
    dataset = tmp_path / "ds.parquet"
    write_parquet(rows, dataset)
    out = tmp_path / "wp.fq.gz"
    write_predicts(
        dataset,
        out,
        [p.prediction for _, p in items],
        smooth_window_size=21,
        min_interval_size=13,
        approved_interval_number=20,
    )
    assert _gz.open(out, "rb").read() == (GOLDEN / "write_predicts.fq").read_bytes()
