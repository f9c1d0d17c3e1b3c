"""Hand-traced chop oracle: expected outputs derived line-by-line from the
REFERENCE Rust source, not from this repo's own code.

Every expected record below is derived by hand from:
  * guard rails:      /root/reference/src/bin/predict.rs:141-164
  * majority voting:  /root/reference/src/smooth/utils.rs:48-97
  * interval select:  /root/reference/src/smooth/predict.rs:186-209
  * region extract:   /root/reference/src/utils.rs:671-695 (index-0 sentinel)
  * unmapped+split:   /root/reference/src/output/split.rs:171-320
                      (total_length-1 trim, count-before-filter T/I,
                       min-len part filter, whole-seq passthrough)

Defaults used throughout (reference: src/bin/predict.rs:19-78):
  smooth window 21 (half=10), min_interval 13, approved 20,
  max_process_intervals 4, min_chop_read_len 20, min_read_len 150,
  chop_type All, id_annotation on.

Majority voting semantics (src/smooth/utils.rs:48-97): window for position i
is [max(0, i-10), min(len, i+11)); when the window is clipped at the END it
shifts back so it always covers 21 elements; a two-way count tie keeps the
original label. For a solid run of ones [s, e) with e-s >= 21 embedded in
zeros (away from array edges), position i smooths to 1 iff the window holds
>= 11 ones: at i = s the window [s-10, s+11) holds ones s..s+11 = 11 -> 1;
at i = s-1 it holds 10 -> 0; at i = e-1 the window [e-11, e+10) holds ones
e-11..e = 11 -> 1; at i = e it holds 10 -> 0. So a solid run smooths to
EXACTLY itself.
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from deepchopper_tpu.chop.pipeline import ChopOptions, stream_chop_with_predicts
from deepchopper_tpu.io.predicts import Predict


def _seq(n: int) -> str:
    return ("ACGT" * (n // 4 + 1))[:n]


def _qual(n: int) -> str:
    # position-dependent so any slice misalignment changes bytes
    return "".join(chr(33 + (i % 40)) for i in range(n))


def _labels(n: int, runs: list[tuple[int, int]]) -> np.ndarray:
    lab = np.zeros(n, dtype=np.int8)
    for s, e in runs:
        lab[s:e] = 1
    return lab


def _fastq_bytes(reads: list[tuple[str, str, str]]) -> bytes:
    return b"".join(f"@{rid}\n{seq}\n+\n{q}\n".encode() for rid, seq, q in reads)


@pytest.fixture()
def traced_run(tmp_path):
    reads = []
    predicts: dict[str, Predict] = {}

    # ---- read A: internal adapter [100,140) in a 300-base read -----------
    # smooth: solid 40-run -> smooths to exactly [100,140)
    #   (i=100 window [90,111): ones 100..111 = 11 -> 1;
    #    i=99  window [89,110): ones 100..110 = 10 -> 0;
    #    i=139 window [129,150): ones 129..140 = 11 -> 1;
    #    i=140 window [130,151): ones 130..140 = 10 -> 0)
    # get_label_region -> [100..140) (start 100 != 0, opens normally);
    # len 40 >= 13 kept; 1 interval <= approved(20) and <= mpi(4).
    # generate_unmaped_intervals([(100,140)], 300) (split.rs:260-292):
    #   current_start=0 < 100 -> push 0..100; current_start=140;
    #   140 < 300-1 -> push 140..299      <-- the total_length-1 TRIM:
    #   base 299 is silently dropped from the kept tail.
    # parts: seq[0:100] (len 100 >= 20 keep), seq[140:299] (len 159 keep);
    # count_before_filter=2 -> Internal; ids get "|start:end|I"
    # (split.rs:171-226: format "{id}|{start}:{end}" then "|I").
    sA, qA = _seq(300), _qual(300)
    reads.append(("A", sA, qA))
    predicts["A"] = Predict(
        prediction=_labels(300, [(100, 140)]), seq=sA, id="A", is_truncated=False
    )

    # ---- read B: terminal adapter [200,250) at the END of a 250-base read
    # smooth: i=200 window [190,211): ones 200..211 = 11 -> 1; i=199 -> 10
    # -> 0; tail windows (i>=240) shift back to [229,250): all 21 ones -> 1.
    # region [200..250), len 50 kept.
    # unmapped([(200,250)], 250): push 0..200; current_start=250;
    #   250 < 249 is FALSE -> no tail interval (the trim quirk again).
    # one part -> count_before=1 -> ChopType::Terminal; part len 200 != 250
    # so no whole-seq passthrough; id "B|0:200|T".
    sB, qB = _seq(250), _qual(250)
    reads.append(("B", sB, qB))
    predicts["B"] = Predict(
        prediction=_labels(250, [(200, 250)]), seq=sB, id="B", is_truncated=False
    )

    # ---- read C: LEADING adapter [0,50) in a 260-base read ---------------
    # smooth start edge: i=0 window [0,11) = 11 ones -> 1; ...; i=49 window
    # [39,60): ones 39..50 = 11 -> 1; i=50: ones 40..50 = 10 -> 0.
    # smoothed = ones [0,50).
    # get_label_region INDEX-0 SENTINEL (utils.rs:671-695): `start` doubles
    # as the not-open sentinel (0), so a run beginning at index 0 only opens
    # when i=1 sets start=1 -> region is [1..50), NOT [0..50).
    # unmapped([(1,50)], 260): current_start=0 < 1 -> push 0..1 (!);
    #   current_start=50 < 259 -> push 50..259.
    # parts: seq[0:1] len 1 < 20 -> FILTERED; seq[50:259] len 209 kept.
    # count_before_filter = 2 -> Internal (even though only one record
    # survives): id "C|50:259|I".
    sC, qC = _seq(260), _qual(260)
    reads.append(("C", sC, qC))
    predicts["C"] = Predict(
        prediction=_labels(260, [(0, 50)]), seq=sC, id="C", is_truncated=False
    )

    # ---- read D: too short (100 < MIN_READ_LEN 150) -> passthrough -------
    # guard predict.rs:146-148 fires before smoothing; record emitted as-is.
    sD, qD = _seq(100), _qual(100)
    reads.append(("D", sD, qD))
    predicts["D"] = Predict(
        prediction=_labels(100, [(10, 60)]), seq=sD, id="D", is_truncated=False
    )

    # ---- read E: all-zero labels -> no intervals -> passthrough ----------
    # guard predict.rs:156-158 (smooth_intervals.is_empty()).
    sE, qE = _seq(200), _qual(200)
    reads.append(("E", sE, qE))
    predicts["E"] = Predict(prediction=_labels(200, []), seq=sE, id="E", is_truncated=False)

    # ---- read F: FIVE adapter runs -> 5 > max_process_intervals(4) ->
    # passthrough (predict.rs:156-158). Each 20-run smooths to itself
    # (>= 11 ones at both boundary windows as for read A) and passes the
    # min_interval(13) filter, so select returns 5 intervals.
    sF, qF = _seq(600), _qual(600)
    runsF = [(50, 70), (150, 170), (250, 270), (350, 370), (450, 470)]
    reads.append(("F", sF, qF))
    predicts["F"] = Predict(prediction=_labels(600, runsF), seq=sF, id="F", is_truncated=False)

    # ---- read G: truncated prediction (150) vs fastq read (200) ->
    # passthrough (predict.rs:160-164: seq len != qual len).
    sG, qG = _seq(200), _qual(200)
    reads.append(("G", sG, qG))
    predicts["G"] = Predict(
        prediction=_labels(150, [(60, 100)]), seq=sG[:150], id="G", is_truncated=True
    )

    # ---- read H: present in the FASTQ, NO prediction -> DROPPED ----------
    # (predict.rs:141-144 filter_map None).
    reads.append(("H", _seq(180), _qual(180)))

    fq = tmp_path / "trace.fq"
    fq.write_bytes(_fastq_bytes(reads))
    opts = ChopOptions(output_prefix=str(tmp_path / "trace_out"))
    stats = stream_chop_with_predicts(predicts, fq, opts)
    with gzip.open(stats.output_file) as fh:
        lines = fh.read().decode().splitlines()
    recs = {
        lines[i][1:]: (lines[i + 1], lines[i + 3]) for i in range(0, len(lines), 4)
    }
    return reads, recs, stats


def test_internal_chop_with_tail_trim(traced_run):
    reads, recs, _ = traced_run
    sA, qA = reads[0][1], reads[0][2]
    assert recs["A|0:100|I"] == (sA[0:100], qA[0:100])
    # tail part ends at 299, NOT 300: generate_unmaped_intervals trims the
    # final base whenever trailing sequence exists (split.rs:287-289).
    assert recs["A|140:299|I"] == (sA[140:299], qA[140:299])
    assert not any(k.startswith("A") and k not in ("A|0:100|I", "A|140:299|I") for k in recs)


def test_terminal_chop_single_part(traced_run):
    reads, recs, _ = traced_run
    sB, qB = reads[1][1], reads[1][2]
    assert recs["B|0:200|T"] == (sB[0:200], qB[0:200])
    assert sum(k.startswith("B") for k in recs) == 1


def test_leading_adapter_index0_sentinel_chain(traced_run):
    """The index-0 sentinel makes a leading adapter open at 1, which creates
    a spurious 1-base first part, which is filtered but still makes
    count_before_filter=2 -> the surviving record is annotated I, not T."""
    reads, recs, _ = traced_run
    sC, qC = reads[2][1], reads[2][2]
    assert recs["C|50:259|I"] == (sC[50:259], qC[50:259])
    assert sum(k.startswith("C") for k in recs) == 1


def test_passthrough_guards(traced_run):
    reads, recs, _ = traced_run
    for idx, rid in ((3, "D"), (4, "E"), (5, "F"), (6, "G")):
        seq, qual = reads[idx][1], reads[idx][2]
        assert recs[rid] == (seq, qual), rid  # verbatim, no annotation


def test_no_prediction_dropped_and_totals(traced_run):
    _, recs, stats = traced_run
    assert not any(k.startswith("H") for k in recs)
    # A -> 2 records, B -> 1, C -> 1, D/E/F/G -> 4 passthroughs, H dropped.
    assert stats.total_output_count == 8
    assert stats.total_fq_count == 8  # H counted as input
    assert len(recs) == 8
