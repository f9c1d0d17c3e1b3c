"""Data pipeline + inference engine + CLI + aux IO tests."""

import numpy as np
import pytest

from deepchopper_tpu import default
from deepchopper_tpu.data import (
    bucketed_batches,
    default_buckets,
    encode_read,
    iter_batches,
    iter_encoded_reads,
    parse_fastq_file,
    pick_bucket,
)


class TestEncodeRead:
    def test_contract(self):
        enc = encode_read("r|3:6", "ACGTACGTAC", np.arange(10), [(3, 6)], max_length=32768)
        assert enc.input_ids.tolist() == [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, default.TOKEN_SEP]
        assert enc.labels.tolist() == [0, 0, 0, 1, 1, 1, 0, 0, 0, 0, default.IGNORE_LABEL]
        assert not enc.truncated
        # qual: L2-normalized with trailing 0 for SEP
        norm = np.sqrt((np.arange(10).astype(np.float64) ** 2).sum())
        np.testing.assert_allclose(enc.quals[:10], np.arange(10) / norm, rtol=1e-5)
        assert enc.quals[10] == 0.0

    def test_truncation_target_fits(self):
        # len >= max_length and target fits -> labels over max_length-1
        enc = encode_read("r", "A" * 100, np.zeros(100), [(10, 20)], max_length=50)
        assert enc.truncated
        assert len(enc.input_ids) == 50
        assert enc.input_ids[-1] == default.TOKEN_SEP
        assert enc.labels[:49].sum() == 10
        assert enc.labels[49] == default.IGNORE_LABEL

    def test_truncation_target_outside(self):
        # target[1] + 2 > max_length -> all-zero labels
        enc = encode_read("r", "A" * 100, np.zeros(100), [(60, 90)], max_length=50)
        assert enc.truncated
        assert enc.labels[:49].sum() == 0

    def test_no_targets(self):
        enc = encode_read("r", "ACGT", np.zeros(4), None, max_length=100)
        assert enc.labels.tolist() == [0, 0, 0, 0, default.IGNORE_LABEL]


class TestBucketing:
    def test_default_buckets(self):
        b = default_buckets(32768)
        assert b[0] == 256 and b[-1] == 32768
        assert all(x % 128 == 0 for x in b)

    def test_pick(self):
        b = [256, 512, 1024]
        assert pick_bucket(10, b) == 256
        assert pick_bucket(257, b) == 512
        assert pick_bucket(9999, b) == 1024

    def test_batches_fixed_shapes(self):
        reads = [
            encode_read(f"r{i}", "A" * n, np.zeros(n), None, 32768)
            for i, n in enumerate([100, 120, 300, 700, 100, 100])
        ]
        batches = list(bucketed_batches(reads, buckets=[256, 1024], tokens_per_batch=512))
        widths = sorted({b.input_ids.shape[1] for b in batches})
        assert widths == [256, 1024]
        total = sum(b.input_ids.shape[0] for b in batches)
        assert total == 6
        for b in batches:
            assert b.input_ids.dtype == np.int32
            assert (b.input_ids[b.labels == default.IGNORE_LABEL] != 0).all()


class TestParseFastq:
    def test_reference_fixture(self, reference_data):
        recs = list(parse_fastq_file(reference_data / "one_record.fq"))
        assert len(recs) == 1
        assert recs[0]["target"] == [(462, 528)]
        assert set(recs[0]["seq"]) <= set("ACGTN")

    def test_iter_batches(self, reference_data):
        batches = list(
            iter_batches(reference_data / "twenty_five_records.fq", tokens_per_batch=1 << 14)
        )
        assert sum(b.input_ids.shape[0] for b in batches) == 25
        for b in batches:
            assert b.input_ids.shape[1] % 128 == 0


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        from deepchopper_tpu.infer import PredictEngine
        from deepchopper_tpu.models import HeadConfig, HyenaConfig, HyenaTokenClassifier, init_params
        from deepchopper_tpu.models.registry import ModelBundle

        cfg = HyenaConfig(d_model=32, n_layer=1, d_inner=64, max_seq_len=2048)
        head = HeadConfig(input_size=32, lin1_size=48, lin2_size=48, num_class=2)
        module = HyenaTokenClassifier(backbone_config=cfg, head_config=head)
        params = init_params(module, seq_len=64)
        bundle = ModelBundle(module=module, params=params, name="tiny", config=cfg)
        from deepchopper_tpu.infer.engine import PredictEngine

        return PredictEngine(bundle, max_length=1024, tokens_per_batch=4096, buckets=[256, 1024])

    def test_predict_file_writes_contract_shards(self, engine, reference_data, tmp_path):
        stats = engine.predict_file(reference_data / "twenty_five_records.fq", tmp_path / "preds")
        assert stats.reads == 25
        files = sorted((tmp_path / "preds" / "0").glob("*.npz"))
        assert files
        with np.load(files[0]) as d:
            assert set(d.files) == {"prediction", "target", "seq", "qual", "id"}
            assert d["prediction"].ndim == 3 and d["prediction"].shape[2] == 2

        # shards round-trip through the chop loader
        from deepchopper_tpu.io.predicts import load_predicts_from_batch_pts

        predicts = load_predicts_from_batch_pts(tmp_path / "preds")
        assert len(predicts) == 25
        for p in predicts.values():
            assert len(p.prediction) == len(p.seq)

    def test_fused_path_matches_shard_path(self, reference_data, tmp_path):
        from deepchopper_tpu.infer.engine import PredictEngine
        from deepchopper_tpu.io.predicts import load_predicts_from_batch_pts
        from deepchopper_tpu.models import HeadConfig, HyenaConfig, HyenaTokenClassifier, init_params
        from deepchopper_tpu.models.registry import ModelBundle

        cfg = HyenaConfig(d_model=32, n_layer=1, d_inner=64, max_seq_len=2048, compute_dtype="float32")
        head = HeadConfig(input_size=32, lin1_size=48, lin2_size=48, num_class=2)
        module = HyenaTokenClassifier(backbone_config=cfg, head_config=head)
        params = init_params(module, seq_len=64)
        bundle = ModelBundle(module=module, params=params, name="tiny", config=cfg)

        eng_logits = PredictEngine(bundle, max_length=1024, tokens_per_batch=4096, buckets=[1024])
        eng_logits.predict_file(reference_data / "twenty_five_records.fq", tmp_path / "p")
        via_shards = load_predicts_from_batch_pts(tmp_path / "p")

        eng_fused = PredictEngine(
            bundle, max_length=1024, tokens_per_batch=4096, buckets=[1024], return_labels=True
        )
        fused = eng_fused.predict_to_predicts(reference_data / "twenty_five_records.fq")
        assert via_shards.keys() == fused.keys()
        for k in fused:
            assert via_shards[k].seq == fused[k].seq
            np.testing.assert_array_equal(via_shards[k].prediction, fused[k].prediction)


class TestBam:
    def test_read_reference_bam(self, reference_data):
        from deepchopper_tpu.io.bam import left_right_soft_clip, read_bam_records

        recs = read_bam_records(reference_data / "4reads.bam")
        assert len(recs) >= 1
        for rec in recs.values():
            assert rec.cigar
            assert rec.mapping_quality >= 0
        assert left_right_soft_clip("10S80M5S") == (10, 5)
        assert left_right_soft_clip("3H10S80M5S2H") == (10, 5)
        assert left_right_soft_clip("80M") == (0, 0)


class TestParquet:
    def test_encode_matches_reference_shape(self, reference_data, tmp_path):
        import pyarrow.parquet as pq

        from deepchopper_tpu.io.parquet import encode_fq_path_to_parquet

        out = encode_fq_path_to_parquet(
            reference_data / "twenty_five_records.fq", tmp_path / "out.parquet"
        )
        table = pq.read_table(out)
        # Oracle: reference python test asserts (25, 4)
        # (reference: tests/test_rust.py:6-33). The shipped parquet fixture was
        # generated from a different FASTQ revision, so only schema/shape and
        # internal consistency are checkable.
        assert table.num_rows == 25 and table.num_columns == 4
        ref = pq.read_table(reference_data / "twenty_five_records.parquet")
        assert table.column_names == ref.column_names
        ids = table.column("id").to_pylist()
        targets = table.column("target").to_pylist()
        seqs = table.column("seq").to_pylist()
        quals = table.column("qual").to_pylist()
        from deepchopper_tpu.ops.labels import parse_target_from_id

        for rid, tgt, seq, q in zip(ids, targets, seqs, quals):
            assert [tuple(p) for p in zip(tgt[::2], tgt[1::2])] == parse_target_from_id(rid)
            assert len(seq) == len(q)


class TestCli:
    def test_version_and_help(self, capsys):
        from deepchopper_tpu.cli import build_parser

        parser = build_parser()
        with pytest.raises(SystemExit):
            parser.parse_args(["--version"])

    def test_chop_cli_end_to_end(self, tmp_path, monkeypatch, reference_data):
        from deepchopper_tpu.cli import main
        from deepchopper_tpu.io.chop import FastqRecord
        from deepchopper_tpu.io.fastq import write_fq
        from deepchopper_tpu.io.predicts import load_predicts_from_batch_pts

        preds = load_predicts_from_batch_pts(reference_data / "eval/chunk0")
        fq = tmp_path / "in.fq"
        write_fq(
            [FastqRecord(rid, p.seq.encode(), b"I" * len(p.seq)) for rid, p in preds.items()], fq
        )
        monkeypatch.chdir(tmp_path)
        rc = main(["chop", str(reference_data / "eval/chunk0"), str(fq)])
        assert rc == 0
        outs = list(tmp_path.glob("*.chop.fq.gz"))
        assert len(outs) == 1


class TestUiCore:
    def test_parse_fq_record(self):
        from deepchopper_tpu.ui.main import parse_fq_record

        rid, seq, qual = parse_fq_record("@x y\nACGT\n+\nIIII\n")
        assert rid == "x y" and seq == "ACGT" and qual == "IIII"
        with pytest.raises(ValueError):
            parse_fq_record("not a record")


def test_plan_dispatches_greedy_decomposition():
    """Tail batches decompose into compiled row variants (largest-fit) so row
    padding is bounded by the smallest variant, with zero extra compiles."""
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    engine = PredictEngine(bundle, max_length=1024, tokens_per_batch=1 << 18)
    w = 1024
    variants = engine._row_variants(w)  # {t, t/4, t/16} = [16, 64, 256]
    assert variants == [16, 64, 256]

    # full batch: one dispatch, no padding
    assert engine._plan_dispatches(256, w) == [(0, 256, 256)]
    # small tail: single smallest-variant dispatch
    assert engine._plan_dispatches(5, w) == [(0, 5, 16)]
    # 100 rows -> 64 + 16 + 16 + (4 padded to 16): 112 dispatched vs 256 padded
    assert engine._plan_dispatches(100, w) == [
        (0, 64, 64), (64, 16, 16), (80, 16, 16), (96, 4, 16),
    ]
    plans = engine._plan_dispatches(100, w)
    assert sum(p[2] for p in plans) == 112
    # coverage is exact and contiguous
    covered = [(s, s + r) for s, r, _ in plans]
    assert covered == [(0, 64), (64, 80), (80, 96), (96, 100)]
    # no-savings decomposition falls back to one padded dispatch:
    # 63 rows would greedily become 3x16 + (15 padded to 16) = 64 rows —
    # identical padded tokens to a single 64-row dispatch, 3 extra overheads.
    assert engine._plan_dispatches(63, w) == [(0, 63, 64)]
    assert engine._plan_dispatches(64, w) == [(0, 64, 64)]


def test_plan_dispatches_streaming_warmup_uses_available_variants():
    """During async warmup, plans use only ALREADY-compiled row variants
    (bit-exact row decomposition) instead of blocking on the full ladder."""
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    engine = PredictEngine(bundle, max_length=1024, tokens_per_batch=1 << 18)
    w = 1024
    assert engine._row_variants(w) == [16, 64, 256]
    engine._stream_warmup = True
    # nothing compiled yet -> falls back to the smallest static variant
    assert engine._plan_dispatches(5, w) == [(0, 5, 16)]
    # only 16 compiled: a full 256-row batch decomposes into 16-row parts
    engine._compiled[(16, w)] = object()
    plan = engine._plan_dispatches(256, w)
    assert all(t == 16 for (_, _, t) in plan) and sum(r for (_, r, _) in plan) == 256
    # 64 lands: plans immediately prefer it
    engine._compiled[(64, w)] = object()
    plan = engine._plan_dispatches(256, w)
    assert [t for (_, _, t) in plan] == [64, 64, 64, 64]
    # full target lands: single dispatch again
    engine._compiled[(256, w)] = object()
    assert engine._plan_dispatches(256, w) == [(0, 256, 256)]
    engine._stream_warmup = False
    assert engine._plan_dispatches(256, w) == [(0, 256, 256)]


def test_streaming_warmup_fused_output_matches_warmed(tmp_path):
    """warmup_async + immediate stream writes byte-identical chopped output
    to a fully pre-warmed engine (row decomposition is exact)."""
    import gzip

    from deepchopper_tpu import native
    from deepchopper_tpu.chop import ChopOptions
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.infer.fused import fused_predict_chop
    from deepchopper_tpu.models.registry import DeepChopper

    if not native.available():
        pytest.skip("native host ops unavailable")
    rng = np.random.default_rng(21)
    fq = tmp_path / "in.fq"
    with open(fq, "wb") as fh:
        for i in range(120):
            length = int(rng.integers(40, 500))
            seq = "".join(rng.choice(list("ACGTN"), length))
            qual = "".join(chr(c) for c in rng.integers(33, 74, length))
            fh.write(b"@s%d\n%s\n+\n%s\n" % (i, seq.encode(), qual.encode()))

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)

    def run(streaming: bool, prefix: str) -> bytes:
        engine = PredictEngine(
            bundle,
            max_length=256,
            tokens_per_batch=1 << 12,
            buckets=[64, 128, 256],
            return_labels=True,
        )
        if streaming:
            fut = engine.warmup_async()
        else:
            engine.warmup()
        stats = fused_predict_chop(
            engine, fq, ChopOptions(output_prefix=str(tmp_path / prefix))
        )
        if streaming:
            fut.result()
            assert stats.first_write_s > 0
        return gzip.decompress(Path(stats.output_file).read_bytes())

    from pathlib import Path

    warmed = run(False, "warmed")
    streamed = run(True, "streamed")
    assert streamed == warmed


def test_cli_predict_flags_parse():
    """Round-5 CLI flags: --shard-format and --conv-precision."""
    from deepchopper_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["predict", "/tmp/x.fq", "--conv-precision", "float32", "--shard-format", "pt"])
    assert a.conv_precision == "float32" and a.shard_format == "pt"
    a2 = p.parse_args(["predict", "/tmp/x.fq"])
    assert a2.conv_precision is None and a2.shard_format == "npz"


def test_prefetch_iter_propagates_producer_errors():
    """The background encode thread's exceptions must surface at the
    consumer, not vanish into a dead daemon thread."""
    from deepchopper_tpu.infer.engine import _prefetch_iter

    def boom():
        yield 1
        yield 2
        raise RuntimeError("encode failed")

    it = _prefetch_iter(boom(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="encode failed"):
        next(it)

    # clean termination without error
    assert list(_prefetch_iter(iter([3, 4]), depth=1)) == [3, 4]


def test_prefetch_iter_unblocks_producer_on_abandon():
    """An abandoned consumer (break / close) must not leave the producer
    blocked on q.put forever — it would keep pulling the source and pin
    in-flight device buffers for the life of the process."""
    import threading
    import time as _time

    from deepchopper_tpu.infer.engine import _prefetch_iter

    pulled = []
    done = threading.Event()

    def source():
        try:
            for i in range(1000):
                pulled.append(i)
                yield i
        finally:
            done.set()

    it = _prefetch_iter(source(), depth=1)
    assert next(it) == 0
    it.close()  # consumer abandons
    # the producer must notice the stop flag and close the source
    assert done.wait(timeout=5.0)
    _time.sleep(0.05)
    assert len(pulled) < 1000
