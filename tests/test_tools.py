"""Developer-utility tools (reference dev binaries, src/bin/*)."""

from __future__ import annotations

import gzip
import io

import numpy as np
import pytest

from deepchopper_tpu import tools


@pytest.fixture()
def sample_fq(tmp_path):
    path = tmp_path / "sample.fq"
    recs = [
        ("read1", "ACGTACGT"),
        ("read2|10:20|T", "ACGT"),
        ("read3|5:9|I", "GGGGGG"),
        ("longread", "A" * 500),
    ]
    with open(path, "w") as fh:
        for name, seq in recs:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return path


def test_fq2fa(sample_fq):
    buf = io.StringIO()
    n = tools.fq2fa(sample_fq, buf)
    assert n == 4
    lines = buf.getvalue().splitlines()
    assert lines[0] == ">read1" and lines[1] == "ACGTACGT"


def test_fqsearch_by_id_and_length(sample_fq):
    assert [r.name for r in tools.fqsearch(sample_fq, id_substring="read2")] == ["read2|10:20|T"]
    assert [r.name for r in tools.fqsearch(sample_fq, min_len=100)] == ["longread"]
    assert [r.name for r in tools.fqsearch(sample_fq, min_len=5, max_len=10)] == [
        "read1",
        "read3|5:9|I",
    ]


def test_select_by_chop_type(sample_fq, tmp_path):
    t = tools.select_by_chop_type(sample_fq, "terminal")
    assert [r.name for r in t] == ["read2|10:20|T"]
    out = tmp_path / "internal.fq.gz"
    i = tools.select_by_chop_type(sample_fq, "internal", out)
    assert [r.name for r in i] == ["read3|5:9|I"]
    assert gzip.decompress(out.read_bytes()).startswith(b"@read3|5:9|I\n")


def test_diff_fq(tmp_path):
    orig = tmp_path / "orig.fq"
    chop = tmp_path / "chop.fq"
    with open(orig, "w") as fh:
        for name, seq in [("a", "A" * 100), ("b", "C" * 50), ("c", "G" * 80)]:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(chop, "w") as fh:
        # a unchanged; b chopped into two parts; c removed entirely
        fh.write(f"@a\n{'A' * 100}\n+\n{'I' * 100}\n")
        fh.write(f"@b|0:10|I\n{'C' * 20}\n+\n{'I' * 20}\n")
        fh.write(f"@b|30:50|I\n{'C' * 15}\n+\n{'I' * 15}\n")
    res = tools.diff_fq(orig, chop)
    assert res.total_original == 3 and res.total_chopped == 3
    assert res.unchanged == 1 and res.shortened == 2
    assert res.removed == 1 and res.added_parts == 1
    assert res.bases_removed == (50 - 20) + (50 - 15)


def test_replacefq(tmp_path):
    target = tmp_path / "t.fq"
    repl = tmp_path / "r.fq"
    out = tmp_path / "out.fq"
    with open(target, "w") as fh:
        fh.write("@x\nAAAA\n+\nIIII\n@y\nCCCC\n+\nIIII\n")
    with open(repl, "w") as fh:
        fh.write("@y\nGGGG\n+\nJJJJ\n")
    n = tools.replacefq(target, repl, out)
    assert n == 1
    text = out.read_text()
    assert "GGGG" in text and "CCCC" not in text


def test_psl_top1(tmp_path):
    psl = tmp_path / "x.psl"
    psl.write_text(
        "h\nh\nh\nh\n-----\n"
        "40\t0\t0\t0\t0\t0\t0\t0\t+\tq1\t50\t0\t40\tchr1\t100\t0\t40\t1\t40,\t0,\t0,\n"
        "10\t0\t0\t0\t0\t0\t0\t0\t+\tq1\t50\t0\t10\tchr2\t100\t0\t10\t1\t10,\t0,\t0,\n"
        "25\t0\t0\t0\t0\t0\t0\t0\t+\tq2\t50\t0\t25\tchr3\t100\t0\t25\t1\t25,\t0,\t0,\n"
    )
    res = tools.psl_top1_summary(psl)
    assert res["queries"] == 2
    assert res["mean_top1_identity"] == pytest.approx((0.8 + 0.5) / 2)


def test_encode_smoke(sample_fq):
    res = tools.encode_smoke(sample_fq)
    assert res["reads"] == (4,)


def test_chimericstat_and_sa_on_reference_bam(reference_data):
    bam = reference_data / "4reads.bam"
    if not bam.exists():
        pytest.skip("reference bam fixture missing")
    s = tools.chimericstat(bam)
    assert s.total >= s.primary_mapped >= s.with_sa >= 0
    hist = tools.sa_summary(bam)
    assert all(int(k) > 0 for k in hist)


def test_cli_tools_dispatch(sample_fq, capsys):
    from deepchopper_tpu.cli import main

    assert main(["tools", "fq2fa", str(sample_fq)]) == 0
    outd = capsys.readouterr().out
    assert outd.startswith(">read1")
    assert main(["tools", "diff", str(sample_fq), str(sample_fq)]) == 0
