"""Streamed fused predict+chop vs the two-phase path: byte-identical output."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from deepchopper_tpu import native
from deepchopper_tpu.chop import ChopOptions
from deepchopper_tpu.chop.pipeline import stream_chop_with_predicts
from deepchopper_tpu.infer import PredictEngine
from deepchopper_tpu.infer.fused import fused_predict_chop
from deepchopper_tpu.io.chop import ChopType
from deepchopper_tpu.models.registry import DeepChopper

pytestmark = pytest.mark.skipif(not native.available(), reason="native host ops unavailable")


def _write_fastq(path, rng, n=60, min_len=40, max_len=600):
    with open(path, "wb") as fh:
        for i in range(n):
            length = int(rng.integers(min_len, max_len))
            seq = "".join(rng.choice(list("ACGTN"), length))
            qual = "".join(chr(c) for c in rng.integers(33, 74, length))
            fh.write(b"@fused_%d some desc\n%s\n+\n%s\n" % (i, seq.encode(), qual.encode()))


@pytest.fixture(scope="module")
def tiny_engine():
    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    return PredictEngine(
        bundle,
        max_length=256,
        tokens_per_batch=1 << 12,
        buckets=[64, 128, 256],
        return_labels=True,
    )


@pytest.mark.parametrize(
    "opts_kw",
    [
        {},
        {"output_chopped_seqs": True},
        {"chop_type": ChopType.TERMINAL},
        {"chop_type": ChopType.INTERNAL},
        {"min_read_len": 50},
    ],
)
def test_fused_matches_two_phase(tmp_path, tiny_engine, opts_kw):
    rng = np.random.default_rng(7)
    fq = tmp_path / "in.fq"
    # max_len 600 > engine max_length 256 exercises the truncation passthrough
    _write_fastq(fq, rng, n=60, max_len=600)

    old = ChopOptions(output_prefix=str(tmp_path / "old"), **opts_kw)
    predicts = tiny_engine.predict_to_predicts(fq)
    st_old = stream_chop_with_predicts(predicts, fq, old)

    new = ChopOptions(output_prefix=str(tmp_path / "new"), **opts_kw)
    st_new = fused_predict_chop(tiny_engine, fq, new)

    assert st_new.total_fq_count == st_old.total_fq_count
    assert st_new.total_output_count == st_old.total_output_count
    assert st_new.output_file.split("/")[-1].replace("new", "old") == st_old.output_file.split("/")[-1]
    old_bytes = gzip.open(st_old.output_file, "rb").read()
    new_bytes = gzip.open(st_new.output_file, "rb").read()
    assert old_bytes == new_bytes


def test_fused_multi_chunk_order(tmp_path, tiny_engine):
    """Tiny chunk_bytes: output must stay in FASTQ order across chunks."""
    rng = np.random.default_rng(11)
    fq = tmp_path / "in2.fq"
    _write_fastq(fq, rng, n=200, min_len=60, max_len=240)

    old = ChopOptions(output_prefix=str(tmp_path / "old2"))
    predicts = tiny_engine.predict_to_predicts(fq)
    st_old = stream_chop_with_predicts(predicts, fq, old)

    new = ChopOptions(output_prefix=str(tmp_path / "new2"))
    st_new = fused_predict_chop(tiny_engine, fq, new, chunk_bytes=8 << 10)

    assert gzip.open(st_new.output_file, "rb").read() == gzip.open(st_old.output_file, "rb").read()


def test_fused_stats_stages(tmp_path, tiny_engine):
    rng = np.random.default_rng(13)
    fq = tmp_path / "in3.fq"
    _write_fastq(fq, rng, n=30)
    stats = fused_predict_chop(tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "s")))
    assert stats.total_fq_count == 30
    assert stats.predicts_loaded == 30
    assert stats.elapsed_s > 0
    assert stats.device_s >= 0 and stats.smooth_s >= 0 and stats.chop_write_s >= 0


def test_shard_path_matches_fused(tmp_path, tiny_engine):
    """predict_file -> run_chop must byte-match the fused single pass."""
    from deepchopper_tpu.chop.pipeline import run_chop

    rng = np.random.default_rng(21)
    fq = tmp_path / "x.fq"
    _write_fastq(fq, rng, n=50, min_len=60, max_len=240)

    # Shard path needs a logits engine (the chop loader argmaxes).
    logits_engine = PredictEngine(
        tiny_engine.bundle,
        max_length=256,
        tokens_per_batch=1 << 12,
        buckets=[64, 128, 256],
        return_labels=False,
    )
    logits_engine.predict_file(fq, tmp_path / "shards", rank=0)
    st_a = run_chop(
        [tmp_path / "shards" / "0"], fq, ChopOptions(output_prefix=str(tmp_path / "a"))
    )
    st_b = fused_predict_chop(tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "b")))
    assert gzip.open(st_a.output_file, "rb").read() == gzip.open(st_b.output_file, "rb").read()


def test_fused_gzip_input(tmp_path, tiny_engine):
    """The span source must stream compressed FASTQ transparently."""
    import gzip as _gz

    rng = np.random.default_rng(31)
    fq = tmp_path / "z.fq"
    _write_fastq(fq, rng, n=40, min_len=60, max_len=200)
    fqgz = tmp_path / "z.fq.gz"
    fqgz.write_bytes(_gz.compress(fq.read_bytes()))

    st_plain = fused_predict_chop(tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "p")))
    st_gz = fused_predict_chop(tiny_engine, fqgz, ChopOptions(output_prefix=str(tmp_path / "g")))
    assert (
        gzip.open(st_plain.output_file, "rb").read()
        == gzip.open(st_gz.output_file, "rb").read()
    )


def test_fused_on_mesh_matches_single_device(tmp_path, tiny_engine):
    """Fused runner over an 8-device mesh: byte-identical output."""
    import jax

    from deepchopper_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    rng = np.random.default_rng(41)
    fq = tmp_path / "m.fq"
    _write_fastq(fq, rng, n=48, min_len=60, max_len=240)

    st_single = fused_predict_chop(tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "s1")))

    mesh_engine = PredictEngine(
        tiny_engine.bundle,
        max_length=256,
        tokens_per_batch=1 << 12,
        buckets=[64, 128, 256],
        return_labels=True,
        mesh=make_mesh(8),
    )
    st_mesh = fused_predict_chop(mesh_engine, fq, ChopOptions(output_prefix=str(tmp_path / "s8")))
    assert (
        gzip.open(st_single.output_file, "rb").read()
        == gzip.open(st_mesh.output_file, "rb").read()
    )


def test_native_chop_kernel_matches_python_fallback(tmp_path, tiny_engine, monkeypatch):
    """Force the Python _chop_chunk loop and compare bytes with the C++ kernel."""
    import deepchopper_tpu.native as native_mod

    rng = np.random.default_rng(53)
    fq = tmp_path / "k.fq"
    # include lowercase and U bases to exercise normalization in both paths
    with open(fq, "wb") as fh:
        for i in range(40):
            length = int(rng.integers(60, 500))
            seq = "".join(rng.choice(list("ACGTacgtuUN"), length))
            qual = "".join(chr(c) for c in rng.integers(33, 74, length))
            fh.write(b"@kn_%d desc here\n%s\n+\n%s\n" % (i, seq.encode(), qual.encode()))

    st_native = fused_predict_chop(tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "n")))
    monkeypatch.setattr(native_mod, "chop_records", lambda *a, **k: None)
    st_python = fused_predict_chop(tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "p")))
    assert st_native.total_output_count == st_python.total_output_count
    assert (
        gzip.open(st_native.output_file, "rb").read()
        == gzip.open(st_python.output_file, "rb").read()
    )


@pytest.mark.parametrize("opts_kw", [{"output_chopped_seqs": True}, {"chop_type": ChopType.TERMINAL}, {"min_read_len": 100}])
def test_native_chop_kernel_matches_python_fallback_modes(tmp_path, tiny_engine, monkeypatch, opts_kw):
    import deepchopper_tpu.native as native_mod

    rng = np.random.default_rng(59)
    fq = tmp_path / "km.fq"
    _write_fastq(fq, rng, n=40, min_len=60, max_len=400)
    st_native = fused_predict_chop(
        tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "n"), **opts_kw)
    )
    monkeypatch.setattr(native_mod, "chop_records", lambda *a, **k: None)
    st_python = fused_predict_chop(
        tiny_engine, fq, ChopOptions(output_prefix=str(tmp_path / "p"), **opts_kw)
    )
    assert (
        gzip.open(st_native.output_file, "rb").read()
        == gzip.open(st_python.output_file, "rb").read()
    )
