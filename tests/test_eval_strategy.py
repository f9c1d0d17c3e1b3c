"""Eval subsystem: StatResult aggregation, overlap classification, PSL parsing.

(reference: src/smooth/stat.rs:18-308, src/smooth/strategy.rs:24-374,
src/smooth/blat.rs:62-118)
"""

from __future__ import annotations

import numpy as np
import pytest

from deepchopper_tpu.eval import (
    OverlapOptions,
    StatResult,
    collect_overlap_results_for_predict,
    collect_statistics_for_predicts,
    has_overlap,
    parse_psl,
    parse_psl_by_qname,
)
from deepchopper_tpu.io.bam import BamRecord
from deepchopper_tpu.io.predicts import Predict


def mk_predict(rid: str, n: int = 200, adapter: tuple[int, int] | None = (50, 80),
               truncated: bool = False) -> Predict:
    labels = np.zeros(n, np.int8)
    if adapter:
        labels[adapter[0] : adapter[1]] = 1
    seq = "C" * n
    return Predict(prediction=labels, seq=seq, id=rid, is_truncated=truncated)


def mk_bam(qname: str, left_sc: int = 0, right_sc: int = 0, mapq: int = 60,
           mapped: bool = True, secondary: bool = False, supp: bool = False,
           sa: str | None = None) -> BamRecord:
    return BamRecord(
        qname=qname,
        mapping_quality=mapq,
        cigar="",
        left_softclip=left_sc,
        right_softclip=right_sc,
        is_forward=True,
        is_mapped=mapped,
        is_supplementary=supp,
        is_secondary=secondary,
        quality=b"",
        sa_tag=sa,
    )


# -- has_overlap -------------------------------------------------------------


def test_has_overlap_ratio_relative_to_second_interval():
    # Overlap 10 over interval2 length 20 = 0.5: not > 0.5.
    assert not has_overlap((0, 10), (0, 20), 0.5)
    assert has_overlap((0, 15), (0, 20), 0.5)
    assert not has_overlap((100, 200), (0, 20), 0.5)  # disjoint


# -- stats -------------------------------------------------------------------


def test_collect_statistics_counts_and_intervals():
    predicts = [
        mk_predict("a", 300, (50, 80)),
        mk_predict("b", 300, None),
        mk_predict("c", 100, (10, 40)),  # below MIN_READ_LEN=150: skipped
        mk_predict("d", 300, (280, 300), truncated=True),  # terminal-ish
    ]
    stats = collect_statistics_for_predicts(predicts, smooth_window_size=3,
                                            min_interval_size=5)
    assert stats.total_predicts == 3
    assert stats.total_truncated == 1
    assert set(stats.smooth_predicts_with_chop) == {"a", "d"}
    assert stats.smooth_intervals["a"] == [(50, 80)]
    # 'a' ends at 80/300 < 0.9 -> internal; 'd' ends at 300/300 -> not internal
    assert stats.smooth_internal_predicts == ["a"]
    assert set(stats.smooth_only_one) == {"a", "d"}
    # seq is all 'C': no polyA flank
    assert stats.smooth_only_one_with_ploya == []


def test_collect_statistics_polya_flank():
    p = mk_predict("x", 300, (50, 80))
    p.seq = "C" * 45 + "AAAAA" + "C" * 250
    stats = collect_statistics_for_predicts([p], smooth_window_size=3)
    assert stats.smooth_only_one_with_ploya == ["x"]


def test_stat_result_merge_and_json(tmp_path):
    a = collect_statistics_for_predicts([mk_predict("a")], smooth_window_size=3)
    b = collect_statistics_for_predicts([mk_predict("b")], smooth_window_size=3)
    a.merge(b)
    assert a.total_predicts == 2
    f = tmp_path / "stats.json"
    f.write_text(a.to_json())
    back = StatResult.from_json(f)
    assert back.total_predicts == 2
    assert back.smooth_intervals == a.smooth_intervals
    assert back.selected_predict_by_intervals(1) == ["a", "b"]
    assert back.length_smooth_predicts_with_chop() == [30, 30]


# -- overlap classification --------------------------------------------------


def opts(**kw) -> OverlapOptions:
    return OverlapOptions(**kw)


def stats_for(predict: Predict) -> StatResult:
    return collect_statistics_for_predicts([predict], smooth_window_size=3)


def test_classify_unmapped_secondary_lowmq():
    p = mk_predict("r")
    st = stats_for(p)
    assert "unmapped_read" in collect_overlap_results_for_predict(
        st, p, mk_bam("r", mapped=False), opts()
    )
    assert "secondary_or_supp_read" in collect_overlap_results_for_predict(
        st, p, mk_bam("r", secondary=True), opts()
    )
    assert "low_mp_read" in collect_overlap_results_for_predict(
        st, p, mk_bam("r", mapq=5), opts(min_mapping_quality=30)
    )


def test_classify_sc_without_chop():
    p = mk_predict("r", 300, None)
    st = stats_for(p)
    res = collect_overlap_results_for_predict(st, p, mk_bam("r", left_sc=50), opts())
    assert res == {"sc_without_chop": ["r"]}
    # Small softclip below min_interval_size: nothing reported.
    res2 = collect_overlap_results_for_predict(st, p, mk_bam("r", left_sc=5), opts())
    assert res2 == {}


def test_classify_terminal_chop_sc():
    # Adapter at the very end; right softclip covers it.
    p = mk_predict("r", 300, (280, 300))
    st = stats_for(p)
    res = collect_overlap_results_for_predict(st, p, mk_bam("r", right_sc=25), opts())
    assert res == {"terminal_chop_sc": ["r"]}


def test_classify_terminal_chop_nosc_cannot_blat():
    p = mk_predict("r", 300, (285, 300))  # 15bp adapter < MIN_SEQ_SIZE
    st = stats_for(p)
    res = collect_overlap_results_for_predict(st, p, mk_bam("r"), opts())
    assert "terminal_chop_nosc" in res
    assert "terminal_chop_nosc_cannot_blat" in res


def test_classify_internal_chop_sc_with_sa():
    p = mk_predict("r", 300, (10, 40))
    st = stats_for(p)
    res = collect_overlap_results_for_predict(
        st, p, mk_bam("r", left_sc=45, sa="chr1,100,+,50S250M,60,0;"), opts()
    )
    assert res == {"internal_chop_sc": ["r"], "internal_chop_sc_sa": ["r"]}


def test_classify_internal_chop_nosc_blat_fail_without_binary():
    p = mk_predict("r", 300, (100, 140))
    st = stats_for(p)
    res = collect_overlap_results_for_predict(st, p, mk_bam("r"), opts())
    assert "internal_chop_nosc" in res
    assert "internal_chop_nosc_blat_fail" in res  # no blat binary configured


def test_classify_no_process_too_many_intervals():
    n = 1000
    labels = np.zeros(n, np.int8)
    for s in range(100, 900, 100):  # 8 intervals of 30
        labels[s : s + 30] = 1
    p = Predict(prediction=labels, seq="C" * n, id="r", is_truncated=False)
    st = stats_for(p)
    res = collect_overlap_results_for_predict(st, p, mk_bam("r"), opts(max_process_intervals=4))
    assert res == {"no_process": ["r"]}


# -- psl ---------------------------------------------------------------------

PSL_TEXT = (
    "psLayout version 3\n\nh1\nh2\n-----\n"
    "23\t1\t0\t0\t0\t0\t0\t0\t+\tseq\t51\t3\t27\tchr12\t133275309\t11447342\t11447366\t1\t24,\t3,\t11447342,\n"
    "48\t1\t0\t0\t0\t0\t0\t0\t+\tseq\t51\t0\t50\tchr1\t1000\t10\t60\t1\t50,\t0,\t10,\n"
)


def test_parse_psl_identity_and_order(tmp_path):
    f = tmp_path / "out.psl"
    f.write_text(PSL_TEXT)
    als = parse_psl(f)
    assert len(als) == 2
    assert als[0].qmatch == 48  # best identity first
    assert als[0].identity == pytest.approx(48 / 51)
    assert als[1].identity == pytest.approx(23 / 51)
    grouped = parse_psl_by_qname(f)
    assert set(grouped) == {"seq"} and len(grouped["seq"]) == 2


# -- full driver -------------------------------------------------------------


def test_collect_overlap_results_driver(tmp_path, monkeypatch):
    import deepchopper_tpu.io.bam as bam_mod
    import deepchopper_tpu.io.predicts as pred_mod
    from deepchopper_tpu.eval.strategy import collect_overlap_results_for_predicts

    predicts = {
        "a": mk_predict("a", 300, (280, 300)),
        "b": mk_predict("b", 300, None),
    }
    bams = {"a": mk_bam("a", right_sc=25), "b": mk_bam("b", left_sc=40)}
    monkeypatch.setattr(bam_mod, "read_bam_records_parallel", lambda *_a, **_k: bams)
    monkeypatch.setattr(
        pred_mod, "load_predicts_from_batch_pts", lambda *_a, **_k: predicts
    )
    res = collect_overlap_results_for_predicts(
        "fake.bam", "fake_preds", OverlapOptions(), output_dir=tmp_path
    )
    assert res["terminal_chop_sc"] == ["a"]
    assert res["sc_without_chop"] == ["b"]
    assert list(tmp_path.glob("stats_*.json")) and list(tmp_path.glob("overlap_results_*.json"))


class TestBlatPredictions:
    """Batch BLAT dev tool (reference: src/bin/blat.rs:1-276)."""

    def test_extracts_seqs_and_quals(self, tmp_path, monkeypatch):
        import json

        import numpy as np

        from deepchopper_tpu.eval.blat import blat_predictions
        from deepchopper_tpu.io.predicts import write_prediction_shard

        monkeypatch.chdir(tmp_path)
        # one read with a clear adapter interval [30, 60)
        n = 120
        labels = np.zeros((1, n), np.int8)
        labels[0, 30:60] = 1
        logits = np.zeros((1, n, 2), np.float32)
        logits[..., 0] = 1.0
        logits[0, 30:60, 1] = 2.0
        seq_ids = np.full((1, n), 7, np.int32)  # all A
        target = np.zeros((1, n), np.int64)
        from deepchopper_tpu.io.predicts import pack_read_ids

        ids = pack_read_ids(["readZ"], [False])
        shard = tmp_path / "shards" / "0" / "0_0.npz"
        write_prediction_shard(shard, logits, target, seq_ids, np.zeros((1, n)), ids)

        fq = tmp_path / "r.fq"
        fq.write_bytes(b"@readZ\n" + b"A" * n + b"\n+\n" + b"I" * n + b"\n")
        sr = tmp_path / "sel.txt"
        sr.write_text("readZ\n")

        res = blat_predictions(
            [shard.parent], prefix=str(tmp_path) + "/", selected_reads=sr, fastq=fq
        )
        assert res["n_seqs"] == 1
        fa = (tmp_path / "all_predicts_seq.fa").read_text()
        assert fa.startswith(">0\n")
        assert len(fa.splitlines()[1]) == 30
        quals = json.loads((tmp_path / "predicts_base_quals.json").read_text())
        # reference quirk: mean of raw ASCII quality bytes ('I' == 73)
        assert quals == [73.0]

    def test_all_reads_mode(self, tmp_path, monkeypatch):
        import numpy as np

        from deepchopper_tpu.eval.blat import blat_predictions
        from deepchopper_tpu.io.predicts import pack_read_ids, write_prediction_shard

        monkeypatch.chdir(tmp_path)
        n = 100
        logits = np.zeros((2, n, 2), np.float32)
        logits[..., 0] = 1.0
        logits[0, 20:50, 1] = 2.0  # read0: one interval
        shard = tmp_path / "s" / "0_0.npz"
        write_prediction_shard(
            shard,
            logits,
            np.zeros((2, n), np.int64),
            np.full((2, n), 8, np.int32),
            np.zeros((2, n)),
            pack_read_ids(["r0", "r1"], [False, False]),
        )
        res = blat_predictions([shard.parent], prefix=str(tmp_path) + "/")
        assert res["n_predicts"] == 2
        assert res["n_seqs"] == 1  # r1 has no intervals
