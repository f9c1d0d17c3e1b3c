"""Chop kernel tests. Oracle: reference unit tests (src/output/split.rs:322-354)."""

import pytest

from deepchopper_tpu.io.chop import (
    ChopType,
    FastqRecord,
    generate_unmaped_intervals,
    remove_intervals_and_keep_left,
    split_records_by_intervals,
    split_records_by_remove_intervals,
)


class TestRemoveIntervals:
    def test_reference_case_1(self):
        seq = b"abcdefghijklmnopqrstuvwxyz"
        seqs, _ = remove_intervals_and_keep_left(seq, [(1, 5), (10, 15), (20, 25)])
        assert seqs == [b"a", b"fghij", b"pqrst"]

    def test_reference_case_2(self):
        seq = b"abcdefghijklmnopqrstuvwxyz"
        seqs, _ = remove_intervals_and_keep_left(seq, [(5, 10), (15, 20)])
        # NOTE trailing-base trim: last part is "uvwxy", not "uvwxyz"
        assert seqs == [b"abcde", b"klmno", b"uvwxy"]

    def test_reference_case_empty(self):
        seq = b"abcdefghijklmnopqrstuvwxyz"
        seqs, _ = remove_intervals_and_keep_left(seq, [])
        assert seqs == [seq]

    def test_unsorted_input_is_sorted(self):
        seq = b"abcdefghijklmnopqrstuvwxyz"
        seqs, _ = remove_intervals_and_keep_left(seq, [(15, 20), (5, 10)])
        assert seqs == [b"abcde", b"klmno", b"uvwxy"]


class TestGenerateUnmapedIntervals:
    def test_reference_case(self):
        # reference: src/output/split.rs test_generate_unmaped_intervals
        assert generate_unmaped_intervals([(8100, 8123)], 32768) == [(0, 8100), (8123, 32767)]

    def test_empty_input_full_span(self):
        assert generate_unmaped_intervals([], 100) == [(0, 100)]

    def test_adapter_at_end_no_trailing(self):
        assert generate_unmaped_intervals([(90, 100)], 100) == [(0, 90)]
        assert generate_unmaped_intervals([(90, 99)], 100) == [(0, 90)]

    def test_adapter_at_start(self):
        assert generate_unmaped_intervals([(0, 10)], 100) == [(10, 99)]


class TestSplitRecords:
    SEQ = b"A" * 50 + b"G" * 30 + b"C" * 50
    QUAL = b"I" * 130

    def test_internal_chop(self):
        recs = split_records_by_remove_intervals(
            self.SEQ, "read1", self.QUAL, [(50, 80)], 20, True, ChopType.ALL
        )
        assert len(recs) == 2
        assert recs[0].id == "read1|0:50|I"
        assert recs[0].seq == b"A" * 50
        # trailing base dropped by the complement quirk: 80..129 not 80..130
        assert recs[1].id == "read1|80:129|I"
        assert recs[1].seq == b"C" * 49

    def test_terminal_chop(self):
        recs = split_records_by_remove_intervals(
            self.SEQ, "read1", self.QUAL, [(0, 80)], 20, True, ChopType.ALL
        )
        assert len(recs) == 1
        assert recs[0].id == "read1|80:129|T"

    def test_chop_type_mismatch_passthrough(self):
        # internal record requested terminal-only -> passthrough unchanged
        recs = split_records_by_remove_intervals(
            self.SEQ, "read1", self.QUAL, [(50, 80)], 20, True, ChopType.TERMINAL
        )
        assert len(recs) == 1
        assert recs[0].id == "read1"
        assert recs[0].seq == self.SEQ
        # terminal record requested internal-only -> passthrough
        recs = split_records_by_remove_intervals(
            self.SEQ, "read1", self.QUAL, [(0, 80)], 20, True, ChopType.INTERNAL
        )
        assert recs[0].id == "read1"

    def test_min_length_filter_after_classification(self):
        # Internal chop where the second part is too short: the class decision
        # (Internal) happens BEFORE filtering.
        seq = b"A" * 100 + b"G" * 20 + b"C" * 10
        qual = b"I" * 130
        recs = split_records_by_remove_intervals(seq, "r", qual, [(100, 120)], 20, True, ChopType.ALL)
        assert len(recs) == 1
        assert recs[0].id == "r|0:100|I"

    def test_no_annotation(self):
        recs = split_records_by_remove_intervals(
            self.SEQ, "read1", self.QUAL, [(0, 80)], 20, False, ChopType.ALL
        )
        assert recs[0].id == "read1|80:129"

    def test_output_adapters(self):
        recs = split_records_by_intervals(self.SEQ, "read1", self.QUAL, [(50, 80)])
        assert len(recs) == 1
        assert recs[0].id == "read1|50:80"
        assert recs[0].seq == b"G" * 30
        assert recs[0].qual == b"I" * 30

    def test_qual_sliced_like_seq(self):
        qual = bytes(range(33, 163))
        recs = split_records_by_remove_intervals(self.SEQ, "r", qual, [(50, 80)], 20, True, ChopType.ALL)
        assert recs[0].qual == qual[0:50]
        assert recs[1].qual == qual[80:129]


class TestFastqRecord:
    def test_to_bytes(self):
        rec = FastqRecord("id1 desc", b"ACGT", b"IIII")
        assert rec.to_bytes() == b"@id1 desc\nACGT\n+\nIIII\n"
        assert rec.name == "id1"
