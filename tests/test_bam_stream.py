"""Streaming BAM reader/writer + replacebam semantics."""

from __future__ import annotations

from pathlib import Path

import pytest

from deepchopper_tpu.io.bam import (
    BamWriter,
    encode_bam_record,
    iter_bam_raw_blocks,
    iter_bam_records,
    make_bam_header,
    read_bam_header,
    read_bam_records,
)
from deepchopper_tpu.tools import replacebam

REF_BAM = Path("/root/reference/tests/data/4reads.bam")


def _write_bam(path, names, flags=None, cigars=None):
    flags = flags or [4] * len(names)
    cigars = cigars or [None] * len(names)
    with BamWriter(path, make_bam_header()) as w:
        for name, flag, cig in zip(names, flags, cigars):
            w.write_raw_block(
                encode_bam_record(name, flag=flag, cigar=cig, seq_len=8)
            )


def test_calc_softclips_reference_vectors():
    """Verbatim ports of the reference softclip cases
    (reference: src/output/bam.rs test_cigar_soft_clip)."""
    import pytest

    from deepchopper_tpu.io.bam import left_right_soft_clip

    assert left_right_soft_clip("5S10M5S") == (5, 5)
    assert left_right_soft_clip("5H10S5S") == (10, 5)  # hardclip skipped
    assert left_right_soft_clip("10S5M1D") == (10, 0)
    with pytest.raises(Exception):
        left_right_soft_clip("1D5M10S5A")  # invalid op 'A'


def test_bam_writer_reader_roundtrip(tmp_path):
    bam = tmp_path / "t.bam"
    _write_bam(
        bam,
        ["read1", "read2|10:20|I", "read3"],
        flags=[0, 16, 4],
        cigars=[[(5, "S"), (3, "M")], [(3, "M"), (2, "S")], None],
    )
    recs = list(iter_bam_records(bam))
    assert [r.qname for r in recs] == ["read1", "read2|10:20|I", "read3"]
    assert recs[0].left_softclip == 5 and recs[0].right_softclip == 0
    # reverse strand: softclips swap
    assert recs[1].is_forward is False
    assert recs[1].left_softclip == 2 and recs[1].right_softclip == 0
    assert recs[2].is_mapped is False


def test_raw_blocks_pass_through_byte_identical(tmp_path):
    src = tmp_path / "src.bam"
    _write_bam(src, ["a", "b", "c"])
    dst = tmp_path / "dst.bam"
    with BamWriter(dst, read_bam_header(src)) as w:
        for _q, _f, block in iter_bam_raw_blocks(src):
            w.write_raw_block(block)
    import gzip

    assert gzip.open(src, "rb").read() == gzip.open(dst, "rb").read()


def test_streaming_small_chunks(tmp_path, monkeypatch):
    """Records spanning chunk boundaries parse correctly."""
    import deepchopper_tpu.io.bam as bam_mod

    bam = tmp_path / "many.bam"
    names = [f"read_{i:04d}" for i in range(500)]
    _write_bam(bam, names)
    monkeypatch.setattr(bam_mod, "_STREAM_CHUNK", 97)
    got = [q for q, _f, _b in iter_bam_raw_blocks(bam)]
    assert got == names


@pytest.mark.skipif(not REF_BAM.exists(), reason="reference BAM fixture unavailable")
def test_reference_fixture_streaming():
    recs = read_bam_records(REF_BAM)
    assert len(recs) >= 1
    for rec in recs.values():
        assert rec.qname
        assert rec.read_len >= 0


def test_replacebam(tmp_path):
    # dc BAM: chopped names; read2 was internally chopped (two parts).
    dc = tmp_path / "dc.bam"
    _write_bam(
        dc,
        ["read1|0:100|T", "read2|0:50|I", "read2|60:110|I", "read3"],
    )
    # original BAM
    do = tmp_path / "do.bam"
    _write_bam(do, ["read1", "read2", "read3", "read4"])
    out = tmp_path / "out.bam"
    n = replacebam(dc, do, out)
    assert n == 2
    got = [q for q, _f, _b in iter_bam_raw_blocks(out)]
    # read2 dropped from original; both internal parts appended.
    assert got[:3] == ["read1", "read3", "read4"]
    assert sorted(got[3:]) == ["read2|0:50|I", "read2|60:110|I"]
