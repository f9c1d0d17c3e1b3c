"""Sequence/qual/kmer op tests (oracle: reference unit tests in src/kmer.rs,
src/smooth/utils.rs, src/fq_encode/triat.rs)."""

import numpy as np

from deepchopper_tpu import default
from deepchopper_tpu.ops import kmer as K
from deepchopper_tpu.ops import qual as Q
from deepchopper_tpu.ops import sequence as S


class TestSequence:
    def test_normalize(self):
        assert S.normalize_seq("acgtn") == "ACGTN"
        assert S.normalize_seq("ACGU") == "ACGT"
        assert S.normalize_seq("ACGX-") == "ACGNN"

    def test_reverse_complement(self):
        assert S.reverse_complement("ACGT") == "ACGT"
        assert S.reverse_complement("AACG") == "CGTT"

    def test_tokenize_roundtrip(self):
        ids = S.tokenize_bases("ACGTN")
        assert ids.tolist() == [7, 8, 9, 10, 11]
        assert S.detokenize_bases(ids) == "ACGTN"

    def test_detokenize_unknown_ids_to_N(self):
        # reference: src/smooth/utils.rs test_id_list2seq_i64_with_unknown_tokens
        assert S.id_list2seq([0, 1, 6, 7, 8, 9, 10, 11]) == "NNNACGTN"

    def test_ascii_list2str(self):
        assert S.ascii_list2str([104, 105]) == "hi"


class TestQual:
    def test_encode_qual(self):
        assert Q.encode_qual("!I", 33).tolist() == [0, 40]

    def test_encode_qual_kmer_means(self):
        scores, means = Q.encode_qual_kmer(chr(33 + 10) + chr(33 + 20) + chr(33 + 31) + chr(33 + 2), 3)
        assert scores.tolist() == [10, 20, 31, 2]
        # integer floor means over overlapping windows: (10+20+31)//3, (20+31+2)//3
        assert means.tolist() == [20, 17]

    def test_splite_qual_by_offsets(self):
        out = Q.splite_qual_by_offsets([10, 20, 30, 40], [(0, 2), (2, 2), (2, 4)])
        assert out == [15, 0, 35]

    def test_normalize_quals_matches_torch(self):
        import torch

        x = np.array([3.0, 4.0, 0.0], dtype=np.float32)
        mine = Q.normalize_quals(x)
        theirs = torch.nn.functional.normalize(torch.tensor(x), dim=0).numpy()
        np.testing.assert_allclose(mine, theirs, rtol=1e-6)

    def test_normalize_padding_invariance(self):
        x = np.array([3.0, 4.0], dtype=np.float32)
        padded = np.array([3.0, 4.0, 0.0, 0.0], dtype=np.float32)
        np.testing.assert_allclose(Q.normalize_quals(x), Q.normalize_quals(padded)[:2])


class TestKmer:
    def test_seq_to_kmers_overlap(self):
        assert K.seq_to_kmers("ACGTA", 3, overlap=True) == ["ACG", "CGT", "GTA"]

    def test_seq_to_kmers_chunks_keep_tail(self):
        assert K.seq_to_kmers("ACGTA", 3, overlap=False) == ["ACG", "TA"]

    def test_kmers_roundtrip(self):
        assert K.kmers_to_seq(["ACG", "CGT", "GTA"]) == "ACGTA"

    def test_offsets_drop_short_tail(self):
        out = K.seq_to_kmers_and_offset("ACGTA", 3, overlap=False)
        assert out == [("ACG", (0, 3))]

    def test_generate_kmers(self):
        kmers = K.generate_kmers(default.BASES, 2)
        assert len(kmers) == 25
        assert kmers[0] == "AA"
        table = K.generate_kmers_table(default.BASES, 3)
        assert len(table) == 125

    def test_target_region_roundtrip(self):
        kreg = K.to_kmer_target_region((10, 20), 3, None)
        assert kreg == (10, 18)
        assert K.to_original_targtet_region(kreg, 3) == (10, 20)


class TestKmerReferenceVectors:
    """Verbatim ports of the reference's inline kmer tests
    (reference: src/kmer.rs:230-454)."""

    def test_seq_to_kmers_counts(self):
        # reference: src/kmer.rs test_seq_to_kmers
        assert len(K.seq_to_kmers("ATCGT", 2, overlap=True)) == 5 - 2 + 1
        assert K.seq_to_kmers("AT", 3, overlap=True) == []

    def test_generate_kmers_exact(self):
        # reference: src/kmer.rs test_generate_kmers
        assert K.generate_kmers("ACGT", 2) == [
            "AA", "AC", "AG", "AT", "CA", "CC", "CG", "CT",
            "GA", "GC", "GG", "GT", "TA", "TC", "TG", "TT",
        ]
        assert K.generate_kmers("AC", 3) == [
            "AAA", "AAC", "ACA", "ACC", "CAA", "CAC", "CCA", "CCC",
        ]

    def test_generate_kmers_table_exact(self):
        # reference: src/kmer.rs test_generate_kmers_table
        table = K.generate_kmers_table("ACGT", 2)
        expected = {
            "AA": 0, "AC": 1, "AG": 2, "AT": 3, "CA": 4, "CC": 5, "CG": 6,
            "CT": 7, "GA": 8, "GC": 9, "GG": 10, "GT": 11, "TA": 12,
            "TC": 13, "TG": 14, "TT": 15,
        }
        assert dict(table) == expected

    def test_generate_kmers_table_empty_base(self):
        # reference: src/kmer.rs test_generate_kmers_table_empty_base
        assert dict(K.generate_kmers_table("", 2)) == {}

    def test_construct_seq_from_kmers(self):
        # reference: src/kmer.rs test_construct_seq_from_kmers
        seq = "AAACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
        assert K.kmers_to_seq(K.seq_to_kmers(seq, 3, overlap=True)) == seq

    def test_update_target_region(self):
        # reference: src/kmer.rs test_update_target_region{,_valid}
        assert K.to_kmer_target_region((2, 6), 3, None) == (2, 4)
        assert K.to_kmer_target_region((0, 10), 3, 20) == (0, 8)

    def test_update_target_region_invalid(self):
        # reference: src/kmer.rs test_update_target_region_invalid_*
        import pytest

        with pytest.raises(Exception):
            K.to_kmer_target_region((10, 10), 3, 20)  # start == end
        with pytest.raises(Exception):
            K.to_kmer_target_region((0, 25), 3, 20)  # end > seq_len

    def test_to_original_target_region(self):
        # reference: src/kmer.rs test_to_original_target_region
        assert K.to_kmer_target_region((2, 7), 3, None) == (2, 5)
        assert K.to_original_targtet_region((2, 5), 3) == (2, 7)
        assert K.to_original_targtet_region((5, 5), 3) == (5, 5)

    def test_seq_to_kmers_and_offset_overlap(self):
        # reference: src/kmer.rs test_seq_to_kmers_and_offset_overlap
        out = K.seq_to_kmers_and_offset("ATCGATCGATCG", 4, overlap=True)
        assert len(out) == 12 - 4 + 1
        assert out[0] == ("ATCG", (0, 4))
        assert out[1] == ("TCGA", (1, 5))
        assert out[-1] == ("ATCG", (8, 12))

    def test_seq_to_kmers_and_offset_non_overlap(self):
        # reference: src/kmer.rs test_seq_to_kmers_and_offset_non_overlap
        out = K.seq_to_kmers_and_offset("ATCGATCGATCG", 4, overlap=False)
        assert len(out) == 12 // 4
        assert out[0] == ("ATCG", (0, 4))
        assert out[1] == ("ATCG", (4, 8))


class TestVectorizeReferenceVectors:
    """Verbatim ports of the reference's vectorize tests
    (reference: src/kmer.rs:420-454)."""

    def test_vectorize_target_valid(self):
        from deepchopper_tpu.ops import labels as L

        assert L.vectorize_target(3, 5, 6).tolist() == [0, 0, 0, 1, 1, 0]
        assert L.vectorize_target(0, 0, 6).tolist() == [0, 0, 0, 0, 0, 0]

    def test_vectorize_target_invalid(self):
        import pytest

        from deepchopper_tpu.ops import labels as L

        with pytest.raises(Exception):
            L.vectorize_target(5, 0, 2)

    def test_vectorize_targets_valid(self):
        from deepchopper_tpu.ops import labels as L

        assert L.vectorize_targets([0, 5, 7, 10], 15).tolist() == [
            1, 1, 1, 1, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0,
        ]

    def test_vectorize_targets_invalid(self):
        import pytest

        from deepchopper_tpu.ops import labels as L

        with pytest.raises(Exception):
            L.vectorize_targets([0, 5, 7, 20], 15)
