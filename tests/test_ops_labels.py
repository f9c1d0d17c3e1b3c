"""Label-op semantics tests.

Oracle: the reference's own unit-test vectors
(reference: src/smooth/utils.rs:99-137, src/utils.rs:738-804,
src/kmer.rs tests, src/fq_encode/triat.rs:154-235).
"""

import numpy as np
import pytest

from deepchopper_tpu.ops import labels as L


class TestMajorityVoting:
    def test_reference_vector_1(self):
        # reference: src/smooth/utils.rs test_majority_voting
        lab = [1, 0, 0, 1, 1, 0, 1, 0, 0, 0, 1]
        assert L.majority_voting(lab, 3).tolist() == [1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0]

    def test_reference_vector_2(self):
        # reference: src/smooth/utils.rs test_majority_voting2
        lab = [1, 0, 0, 1, 1, 0, 1, 1, 1, 0, 1]
        assert L.majority_voting(lab, 3).tolist() == [1, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1]

    def test_empty(self):
        assert L.majority_voting([], 3).tolist() == []

    def test_window_1(self):
        # window 1 is bumped to 1 (odd already); each window is the element itself
        lab = [1, 0, 0, 1, 1, 0, 1, 0, 0, 0]
        assert L.majority_voting(lab, 1).tolist() == lab

    def test_even_window_bumped_to_odd(self):
        lab = [1, 0, 0, 1, 1, 0, 1, 0, 0, 0, 1]
        assert L.majority_voting(lab, 2).tolist() == L.majority_voting(lab, 3).tolist()

    def test_against_scalar_reference(self):
        """Cross-check vectorized output vs a direct transliteration."""

        def scalar(labels, window_size):
            w = window_size + 1 if window_size % 2 == 0 else window_size
            half = w // 2
            n = len(labels)
            out = []
            for i in range(n):
                start = max(i - half, 0)
                end = min(n, i + half + 1)
                if end == n and end - start < w:
                    start = max(end - w, 0)
                window = labels[start:end]
                c1 = sum(1 for x in window if x == 1)
                c0 = len(window) - c1
                if c0 > 0 and c1 > 0 and c0 == c1:
                    out.append(labels[i])
                elif c1 > c0:
                    out.append(1)
                else:
                    out.append(0)
            return out

        rng = np.random.default_rng(0)
        for n in [1, 2, 5, 20, 50, 201]:
            for w in [1, 2, 3, 5, 10, 21, 40]:
                lab = rng.integers(0, 2, n).astype(np.int8).tolist()
                assert L.majority_voting(lab, w).tolist() == scalar(lab, w), (n, w)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(1)
        lengths = np.array([5, 17, 64, 1, 33])
        maxlen = 64
        mat = rng.integers(0, 2, (5, maxlen)).astype(np.int8)
        out = L.majority_voting_batch(mat, lengths, 21)
        for i, n in enumerate(lengths):
            expect = L.majority_voting(mat[i, :n], 21)
            np.testing.assert_array_equal(out[i, :n], expect)
            np.testing.assert_array_equal(out[i, n:], mat[i, n:])


class TestGetLabelRegion:
    def test_empty(self):
        assert L.get_label_region([]) == []

    def test_no_label(self):
        assert L.get_label_region([0, 0, 0, 0]) == []

    def test_single_label(self):
        # reference: src/utils.rs test_get_label_region_single_label
        assert L.get_label_region([0, 1, 0, 0, 0]) == [(1, 2)]

    def test_multiple_labels(self):
        assert L.get_label_region([0, 1, 1, 0, 1, 1, 0]) == [(1, 3), (4, 6)]

    def test_label_at_end(self):
        assert L.get_label_region([0, 1, 1, 0, 1, 1]) == [(1, 3), (4, 6)]

    def test_index0_sentinel_quirk(self):
        # A run starting at index 0 only opens at index 1 (reference sentinel
        # behavior, src/utils.rs:671-695).
        assert L.get_label_region([1, 0, 0]) == []
        assert L.get_label_region([1]) == []
        assert L.get_label_region([1, 1, 0]) == [(1, 2)]
        assert L.get_label_region([1, 1, 1, 0, 1]) == [(1, 3), (4, 5)]

    def test_against_scalar_reference(self):
        def scalar(labels):
            regions = []
            start = end = 0
            for i, lab in enumerate(labels):
                if lab == 1:
                    if start == 0:
                        start = i
                    end = i
                elif start != 0:
                    regions.append((start, end + 1))
                    start = end = 0
            if start != 0:
                regions.append((start, end + 1))
            return regions

        rng = np.random.default_rng(2)
        for n in [1, 2, 3, 10, 100]:
            for _ in range(20):
                lab = rng.integers(0, 2, n).tolist()
                assert L.get_label_region(lab) == scalar(lab), lab


class TestParseTarget:
    def test_valid(self):
        # reference: src/fq_encode/triat.rs test_parse_target_from_id
        assert L.parse_target_from_id(b"@test_name|462:528-100:120") == [(462, 528), (100, 120)]

    def test_empty(self):
        assert L.parse_target_from_id(b"") == []

    def test_no_pipe(self):
        src = b"738735b7-2105-460e-9e56-da980ef816c2+4f605fb4-4107-4827-9aed-9448d02834a8"
        assert L.parse_target_from_id(src) == [(0, 0)]

    def test_malformed_degrades(self):
        assert L.parse_target_from_id(b"@test_name|462:528,100:120") == [(0, 0)]
        assert L.parse_target_from_id("read|T") == [(0, 0)]

    def test_str_input(self):
        assert L.parse_target_from_id("x|1:5") == [(1, 5)]


class TestVectorize:
    def test_basic(self):
        assert L.vectorize_target(1, 3, 5).tolist() == [0, 1, 1, 0, 0]

    def test_empty_region(self):
        assert L.vectorize_target(0, 0, 4).tolist() == [0, 0, 0, 0]

    def test_invalid(self):
        with pytest.raises(Exception):
            L.vectorize_target(3, 2, 5)
        with pytest.raises(Exception):
            L.vectorize_target(0, 9, 5)

    def test_targets_flat_and_pairs(self):
        assert L.vectorize_targets([1, 2, 4, 6], 7).tolist() == [0, 1, 0, 0, 1, 1, 0]
        assert L.vectorize_targets([(1, 2), (4, 6)], 7).tolist() == [0, 1, 0, 0, 1, 1, 0]
        assert L.vectorize_targets([], 3).tolist() == [0, 0, 0]


class TestSummaryPredict:
    def test_reference_vector(self):
        # reference: src/utils.rs test_summary_predict
        preds = [[0, 0, 1], [1, 1, 1]]
        labs = [[0, -100, 1], [-100, 1, -100]]
        tp, tl = L.summary_predict(preds, labs, -100)
        assert [p.tolist() for p in tp] == [[0, 1], [1]]
        assert [t.tolist() for t in tl] == [[0, 1], [1]]


class TestSmoothLabelRegion:
    def test_pipeline(self):
        lab = [0] * 30 + [1] * 20 + [0] * 30
        assert L.smooth_label_region(lab, 3, 13, 20) == [(30, 50)]

    def test_min_interval_filter(self):
        lab = [0] * 30 + [1] * 5 + [0] * 30
        assert L.smooth_label_region(lab, 3, 13, 20) == []

    def test_approved_gate_returns_empty(self):
        lab = ([0] * 20 + [1] * 15) * 4 + [0] * 20
        regions = L.smooth_label_region(lab, 3, 13, 2)
        assert regions == []
