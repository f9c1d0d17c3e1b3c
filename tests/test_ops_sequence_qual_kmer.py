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
