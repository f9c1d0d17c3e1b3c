"""FASTQ IO + prediction-shard loader tests against reference fixtures."""

import gzip

import numpy as np
import pytest

from deepchopper_tpu import default
from deepchopper_tpu.io import chop as C
from deepchopper_tpu.io import fastq as F
from deepchopper_tpu.io import predicts as P


class TestFastqIO:
    def test_read_reference_fixture(self, reference_data):
        recs = F.read_fastq_records(reference_data / "twenty_five_records.fq")
        assert len(recs) == 25
        for r in recs:
            assert len(r.seq) == len(r.qual)

    def test_one_record_target(self, reference_data):
        recs = F.read_fastq_records(reference_data / "one_record.fq")
        assert len(recs) == 1
        from deepchopper_tpu.ops.labels import parse_target_from_id

        assert parse_target_from_id(recs[0].name) == [(462, 528)]

    def test_bgzf_roundtrip(self, tmp_path):
        recs = [
            C.FastqRecord(f"read{i}", b"ACGT" * 100, b"I" * 400) for i in range(500)
        ]
        out = tmp_path / "out.fq.gz"
        F.write_fq_parallel(recs, out, threads=4)
        assert F.detect_compression(out) == "bgzip"
        back = F.read_fastq_records(out)
        assert [r.id for r in back] == [r.id for r in recs]
        assert all(a.seq == b.seq and a.qual == b.qual for a, b in zip(back, recs))
        # readable by stock gzip too
        with gzip.open(out) as fh:
            assert fh.readline() == b"@read0\n"

    def test_plain_roundtrip(self, tmp_path):
        recs = [C.FastqRecord("a b", b"ACGT", b"!!!!")]
        out = tmp_path / "out.fq"
        F.write_fq(recs, out)
        assert F.detect_compression(out) == "plain"
        back = F.read_fastq_records(out)
        assert back[0].id == "a b" and back[0].name == "a"

    def test_gzip_detection_and_read(self, tmp_path, reference_data):
        src = (reference_data / "simple.fq").read_bytes()
        gz = tmp_path / "simple.fq.gz"
        with gzip.open(gz, "wb") as fh:
            fh.write(src)
        assert F.detect_compression(gz) == "gzip"
        assert len(F.read_fastq_records(gz)) == len(F.read_fastq_records(reference_data / "simple.fq"))

    def test_chunked_iteration(self, reference_data):
        chunks = list(F.iter_fastq_chunks(reference_data / "twenty_five_records.fq", 10))
        assert [len(c) for c in chunks] == [10, 10, 5]

    def test_merge(self, tmp_path, reference_data):
        out = tmp_path / "merged.fq.gz"
        F.convert_multiple_fqs_to_one_fq(
            [reference_data / "simple.fq", reference_data / "simple.fq"], out
        )
        n = len(F.read_fastq_records(reference_data / "simple.fq"))
        assert len(F.read_fastq_records(out)) == 2 * n


class TestWritefqReferenceVectors:
    """Verbatim ports of the reference's writefq inline tests
    (reference: src/output/writefq.rs:351-476)."""

    def test_streaming_fastq_reader(self, tmp_path):
        # reference: writefq.rs test_streaming_fastq_reader
        recs = [
            C.FastqRecord("read1", b"ATCGATCG", b"IIIIIIII"),
            C.FastqRecord("read2", b"GCTAGCTA", b"HHHHHHHH"),
            C.FastqRecord("read3", b"AAAATTTT", b"JJJJJJJJ"),
        ]
        path = tmp_path / "sr.fq.gz"
        F.write_fq_parallel(recs, path, threads=2)
        count = 0
        for got in F.StreamingFastqReader(path):
            assert count < len(recs)
            assert got.id == recs[count].id
            assert got.seq == recs[count].seq
            assert got.qual == recs[count].qual
            count += 1
        assert count == len(recs)

    def test_write_fq_with_file_path(self, tmp_path):
        # reference: writefq.rs test_write_fq_with_file_path — exact bytes
        recs = [
            C.FastqRecord("1", b"ATCG", b"HHHH"),
            C.FastqRecord("2", b"GCTA", b"MMMM"),
        ]
        path = tmp_path / "w.fq"
        F.write_fq(recs, path)
        assert path.read_text() == "@1\nATCG\n+\nHHHH\n@2\nGCTA\n+\nMMMM\n"

    def test_write_fq_parallel(self, tmp_path):
        # reference: writefq.rs test_write_fq_parallel
        recs = [
            C.FastqRecord("record1", b"ATCG", b"IIII"),
            C.FastqRecord("record2", b"GCTA", b"EEEE"),
        ]
        path = tmp_path / "p.fq.gz"
        F.write_fq_parallel(recs, path)
        back = F.read_fastq_records(path)
        for a, b in zip(back, recs):
            assert a.id == b.id and a.seq == b.seq and a.qual == b.qual


class TestZstdInput:
    """zstd-compressed FASTQ input (reference sniffs zstd magic,
    src/output/writefq.rs:84-135) via the ctypes libzstd binding."""

    @pytest.fixture
    def fq_bytes(self):
        rng = np.random.default_rng(11)
        out = []
        for i in range(200):
            length = int(rng.integers(50, 400))
            seq = "".join(rng.choice(list("ACGTN"), length))
            qual = "".join(chr(c) for c in rng.integers(33, 74, length))
            out.append(f"@z{i} desc\n{seq}\n+\n{qual}\n")
        return "".join(out).encode()

    def test_zstd_roundtrip_streaming_reader(self, tmp_path, fq_bytes):
        from deepchopper_tpu.io import zstd_ctypes

        if not zstd_ctypes.available():
            pytest.skip("libzstd not present")
        plain = tmp_path / "in.fq"
        plain.write_bytes(fq_bytes)
        zpath = tmp_path / "in.fq.zst"
        zpath.write_bytes(zstd_ctypes.compress(fq_bytes))
        assert F.detect_compression(zpath) == "zstd"
        want = list(F.StreamingFastqReader(plain))
        got = list(F.StreamingFastqReader(zpath))
        assert len(got) == len(want) == 200
        for a, b in zip(got, want):
            assert a.id == b.id and a.seq == b.seq and a.qual == b.qual

    def test_zstd_concatenated_frames(self, tmp_path, fq_bytes):
        # `zstd` files may hold multiple concatenated frames; the streaming
        # decoder must cross frame boundaries transparently.
        from deepchopper_tpu.io import zstd_ctypes

        if not zstd_ctypes.available():
            pytest.skip("libzstd not present")
        half = len(fq_bytes) // 2
        zpath = tmp_path / "two.fq.zst"
        zpath.write_bytes(
            zstd_ctypes.compress(fq_bytes[:half]) + zstd_ctypes.compress(fq_bytes[half:])
        )
        with F.open_compressed_reader(zpath) as fh:
            assert fh.read() == fq_bytes


class TestPredictShards:
    def test_load_reference_pt(self, reference_data):
        # Oracle: reference test asserts 12 predicts in chunk0/0.pt
        # (reference: src/smooth/predict.rs:319-331).
        predicts = P.load_predicts_from_batch_pt(reference_data / "eval/chunk0/0.pt")
        assert len(predicts) == 12
        for rid, p in predicts.items():
            assert p.id == rid
            assert len(p.prediction) == len(p.seq)
            assert set(np.unique(p.prediction)) <= {0, 1}
            assert set(p.seq) <= set("ACGTN")

    def test_load_reference_pt_dir(self, reference_data):
        predicts = P.load_predicts_from_batch_pts(reference_data / "eval")
        assert len(predicts) > 12
        capped = P.load_predicts_from_batch_pts(reference_data / "eval", max_predicts=1)
        assert 0 < len(capped) <= len(predicts)

    def test_npz_roundtrip_matches_pt_decode(self, reference_data, tmp_path):
        import torch

        t = torch.load(reference_data / "eval/chunk0/0.pt", map_location="cpu", weights_only=False)
        P.write_prediction_shard(
            tmp_path / "0.npz",
            t["prediction"].numpy(),
            t["target"].numpy(),
            t["seq"].numpy(),
            t["qual"].numpy(),
            t["id"].numpy(),
        )
        from_pt = P.load_predicts_from_batch_pt(reference_data / "eval/chunk0/0.pt")
        from_npz = P.load_predicts_from_batch_npz(tmp_path / "0.npz")
        assert from_pt.keys() == from_npz.keys()
        for k in from_pt:
            assert from_pt[k].seq == from_npz[k].seq
            np.testing.assert_array_equal(from_pt[k].prediction, from_npz[k].prediction)

    def test_pt_writer_roundtrip(self, reference_data, tmp_path):
        """The .pt WRITER emits the reference callback's tensor dict
        (reference: deepchopper/models/callbacks.py:12-25): write a shard in
        both formats from the same arrays, reload each through its own loader,
        and require identical decoded Predicts — so the reference's chop
        binary could consume this framework's predictions."""
        import torch

        t = torch.load(reference_data / "eval/chunk0/0.pt", map_location="cpu", weights_only=False)
        arrays = (
            t["prediction"].numpy(),
            t["target"].numpy(),
            t["seq"].numpy(),
            t["qual"].numpy(),
            t["id"].numpy(),
        )
        P.write_prediction_shard_pt(tmp_path / "0.pt", *arrays)
        P.write_prediction_shard(tmp_path / "0.npz", *arrays)
        # tensor dict shape/dtype contract
        back = torch.load(tmp_path / "0.pt", map_location="cpu", weights_only=False)
        assert set(back) == {"prediction", "target", "seq", "qual", "id"}
        assert back["prediction"].dtype == torch.float32
        assert back["target"].dtype == torch.int64 and back["seq"].dtype == torch.int64
        assert back["prediction"].shape == t["prediction"].shape
        from_pt = P.load_predicts_from_batch_pt(tmp_path / "0.pt")
        from_npz = P.load_predicts_from_batch_npz(tmp_path / "0.npz")
        ref = P.load_predicts_from_batch_pt(reference_data / "eval/chunk0/0.pt")
        assert from_pt.keys() == from_npz.keys() == ref.keys()
        for k in ref:
            assert from_pt[k].seq == ref[k].seq
            np.testing.assert_array_equal(from_pt[k].prediction, ref[k].prediction)
            np.testing.assert_array_equal(from_pt[k].prediction, from_npz[k].prediction)

    def test_predict_file_pt_shards_chop_byte_equal(self, tmp_path):
        """End-to-end: predict_file(shard_format='pt') shards load through the
        .pt loader and chop to byte-identical output vs the .npz path."""
        from deepchopper_tpu.chop import ChopOptions
        from deepchopper_tpu.chop.pipeline import stream_chop_with_predicts
        from deepchopper_tpu.infer import PredictEngine
        from deepchopper_tpu.models.registry import DeepChopper

        rng = np.random.default_rng(3)
        fq = tmp_path / "in.fq"
        with open(fq, "wb") as fh:
            for i in range(8):
                length = int(rng.integers(80, 200))
                seq = "".join(rng.choice(list("ACGT"), length))
                qual = "".join(chr(c) for c in rng.integers(33, 74, length))
                fh.write(b"@r%d\n%s\n+\n%s\n" % (i, seq.encode(), qual.encode()))
        bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
        engine = PredictEngine(bundle, max_length=512, tokens_per_batch=1 << 12)
        engine.predict_file(fq, tmp_path / "pt_shards", shard_format="pt")
        engine2 = PredictEngine(bundle, max_length=512, tokens_per_batch=1 << 12)
        engine2.predict_file(fq, tmp_path / "npz_shards", shard_format="npz")
        assert sorted(p.suffix for p in (tmp_path / "pt_shards/0").iterdir()) == [".pt"] * len(
            list((tmp_path / "pt_shards/0").iterdir())
        )
        from_pt = P.load_predicts_from_batch_pts(tmp_path / "pt_shards")
        from_npz = P.load_predicts_from_batch_pts(tmp_path / "npz_shards")
        assert from_pt.keys() == from_npz.keys() and len(from_pt) == 8
        sa = stream_chop_with_predicts(
            from_pt, fq, ChopOptions(output_prefix=str(tmp_path / "a"))
        )
        sb = stream_chop_with_predicts(
            from_npz, fq, ChopOptions(output_prefix=str(tmp_path / "b"))
        )
        from pathlib import Path

        assert gzip.decompress(Path(sa.output_file).read_bytes()) == gzip.decompress(
            Path(sb.output_file).read_bytes()
        )

    def test_pack_read_ids_roundtrip(self):
        ids = ["read-abc|1:2", "x" * 300]
        packed = P.pack_read_ids(ids, [False, True])
        assert packed.shape == (2, default.MAX_ID_LENGTH)
        from deepchopper_tpu.ops.sequence import ascii_list2str

        assert ascii_list2str(packed[0, 2 : 2 + packed[0, 0]]) == ids[0]
        assert packed[1, 1] == 1

    def test_smooth_and_select_on_real_predict(self, reference_data):
        predicts = P.load_predicts_from_batch_pt(reference_data / "eval/chunk0/0.pt")
        for p in predicts.values():
            intervals = p.smooth_and_select_intervals(21, 13, 20)
            for s, e in intervals:
                assert 0 <= s < e <= len(p.seq)
