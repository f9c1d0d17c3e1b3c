"""End-to-end chop pipeline tests using reference .pt prediction fixtures."""

import numpy as np
import pytest

from deepchopper_tpu.chop import ChopOptions, process_chunk, run_chop
from deepchopper_tpu.io.chop import ChopType, FastqRecord
from deepchopper_tpu.io.fastq import read_fastq_records, write_fq
from deepchopper_tpu.io.predicts import Predict, load_predicts_from_batch_pts


def _fastq_from_predicts(predicts):
    """Reconstruct a plausible FASTQ matching the prediction shard (the real
    input FASTQ is not shipped in the reference snapshot)."""
    recs = []
    for rid, p in predicts.items():
        recs.append(FastqRecord(rid, p.seq.encode(), b"I" * len(p.seq)))
    return recs


@pytest.fixture(scope="module")
def eval_predicts():
    import pathlib

    path = pathlib.Path("/root/reference/tests/data/eval")
    if not path.exists():
        pytest.skip("reference eval fixtures unavailable")
    return load_predicts_from_batch_pts(path)


class TestProcessChunk:
    def test_drop_without_prediction(self, eval_predicts):
        chunk = [FastqRecord("unknown-read", b"A" * 200, b"I" * 200)]
        assert process_chunk(chunk, eval_predicts, ChopOptions()) == []

    def test_short_read_passthrough(self, eval_predicts):
        rid, p = next(iter(eval_predicts.items()))
        short = Predict(np.zeros(100, np.int8), "A" * 100, "shorty", False)
        chunk = [FastqRecord("shorty", b"A" * 100, b"I" * 100)]
        out = process_chunk(chunk, {"shorty": short}, ChopOptions())
        assert len(out) == 1 and out[0].id == "shorty"

    def test_truncated_mismatch_passthrough(self):
        # prediction seq length != fastq qual length -> passthrough
        pred = Predict(
            np.array([0] * 200 + [1] * 30 + [0] * 200, np.int8),
            "A" * 430,
            "t1",
            True,
        )
        chunk = [FastqRecord("t1", b"A" * 500, b"I" * 500)]
        out = process_chunk(chunk, {"t1": pred}, ChopOptions())
        assert len(out) == 1 and out[0].seq == b"A" * 500

    def test_internal_chop_produces_annotated_parts(self):
        pred = Predict(
            np.array([0] * 200 + [1] * 30 + [0] * 200, np.int8),
            "A" * 200 + "G" * 30 + "C" * 200,
            "r1",
            False,
        )
        chunk = [FastqRecord("r1", (pred.seq).encode(), b"I" * 430)]
        out = process_chunk(chunk, {"r1": pred}, ChopOptions())
        assert [r.id for r in out] == ["r1|0:200|I", "r1|230:429|I"]
        assert out[0].seq == b"A" * 200
        assert out[1].seq == b"C" * 199  # trailing-base trim quirk

    def test_full_adapter_everywhere_passthrough_when_empty_interval_gate(self):
        # >approved intervals -> smooth_and_select returns [] -> passthrough
        lab = (([0] * 20 + [1] * 15) * 30)[:450]
        pred = Predict(np.array(lab, np.int8), "A" * 450, "r2", False)
        chunk = [FastqRecord("r2", b"A" * 450, b"I" * 450)]
        out = process_chunk(chunk, {"r2": pred}, ChopOptions(approved_interval_number=2, smooth_window_size=1, min_interval_size=1))
        assert len(out) == 1 and out[0].id == "r2"

    def test_ocq_outputs_adapters(self):
        pred = Predict(
            np.array([0] * 200 + [1] * 30 + [0] * 200, np.int8),
            "A" * 200 + "G" * 30 + "C" * 200,
            "r3",
            False,
        )
        chunk = [FastqRecord("r3", pred.seq.encode(), b"I" * 430)]
        out = process_chunk(chunk, {"r3": pred}, ChopOptions(output_chopped_seqs=True))
        assert len(out) == 1
        assert out[0].id == "r3|200:230"
        assert out[0].seq == b"G" * 30

    def test_batched_matches_per_read_path(self, eval_predicts):
        """Batched smoothing must equal per-read smooth_and_select_intervals."""
        opts = ChopOptions()
        from deepchopper_tpu.chop.pipeline import _select_intervals_batch

        preds = list(eval_predicts.values())
        batched = _select_intervals_batch(preds, opts)
        for p, got in zip(preds, batched):
            expect = p.smooth_and_select_intervals(
                opts.smooth_window_size, opts.min_interval_size, opts.approved_interval_number
            )
            assert [(int(s), int(e)) for s, e in got] == [(int(s), int(e)) for s, e in expect]


class TestRunChop:
    def test_end_to_end(self, tmp_path, eval_predicts, monkeypatch):
        monkeypatch.chdir(tmp_path)
        fq = tmp_path / "sample.fq"
        write_fq(_fastq_from_predicts(eval_predicts), fq)
        stats = run_chop(["/root/reference/tests/data/eval"], fq, ChopOptions())
        assert stats.total_fq_count == len(eval_predicts)
        assert stats.total_output_count >= stats.total_fq_count  # chops add parts
        assert stats.output_file.endswith("record.chop.fq.gz")
        assert f"{stats.predicts_loaded}pd" in stats.output_file
        out_records = read_fastq_records(tmp_path / stats.output_file)
        assert len(out_records) == stats.total_output_count
        # every output record must trace back to an input read name
        names = set(eval_predicts)
        for rec in out_records:
            base = rec.id.split("|")[0]
            assert base in names

    def test_output_prefix(self, tmp_path, eval_predicts):
        fq = tmp_path / "sample.fq"
        write_fq(_fastq_from_predicts(eval_predicts), fq)
        stats = run_chop(
            ["/root/reference/tests/data/eval"],
            fq,
            ChopOptions(output_prefix=str(tmp_path / "mychop")),
        )
        assert stats.output_file.startswith(str(tmp_path / "mychop"))


class TestSimpleSplitAndWritePredicts:
    def test_split_records_by_remove_interval_no_passthrough(self):
        from deepchopper_tpu.io.chop import split_records_by_remove_interval

        seq = b"A" * 100 + b"G" * 20 + b"C" * 100
        qual = b"I" * 220
        out = split_records_by_remove_interval(seq, "r", qual, [(100, 120)], 20)
        # internal chop: two parts, annotated |I (reference: src/output/split.rs:228-257)
        assert [r.id for r in out] == ["r|0:100|I", "r|120:219|I"]
        out2 = split_records_by_remove_interval(
            seq, "r", qual, [(100, 120)], 20, id_annotation=False
        )
        assert [r.id for r in out2] == ["r|0:100", "r|120:219"]
        # unlike the passthrough variant, whole-span parts are still emitted;
        # empty intervals keep the full span with no end trim
        # (reference: src/output/split.rs:267-270)
        out3 = split_records_by_remove_interval(seq, "r", qual, [], 20)
        assert [r.id for r in out3] == ["r|0:220|T"]

    def test_write_predicts_round_trip(self, tmp_path):
        from deepchopper_tpu.io.parquet import write_parquet, write_predicts

        seq = "A" * 100 + "G" * 30 + "C" * 100
        rows = [
            {
                "id": "read1",
                "seq": seq,
                "qual": [20] * len(seq),
                "target": [0, 0],
            }
        ]
        ds = tmp_path / "ds.parquet"
        write_parquet(rows, ds)
        labels = [0] * 100 + [1] * 30 + [0] * 100
        out = tmp_path / "chopped.fq.gz"
        write_predicts(ds, out, [labels], 1, 1, 20)
        recs = read_fastq_records(out)
        assert [r.id for r in recs] == ["read1|0:100", "read1|130:229"]
        assert recs[0].seq == b"A" * 100
        assert recs[1].seq == b"C" * 99  # trailing-base trim quirk
        assert recs[0].qual == bytes([20 + 33]) * 100

    def test_predict_cli_end_to_end(self, tmp_path, eval_predicts, monkeypatch):
        from deepchopper_tpu.chop import predict_cli

        monkeypatch.chdir(tmp_path)
        fq = tmp_path / "sample.fq"
        write_fq(_fastq_from_predicts(eval_predicts), fq)
        stats = predict_cli(
            ["/root/reference/tests/data/eval"], fq, output_prefix=str(tmp_path / "cli")
        )
        assert stats.total_fq_count == len(eval_predicts)
        assert stats.output_file.endswith("record.chop.fq.gz")
