"""TensorEncoder parity tests against the reference's fixture expectations.

The reference asserts a 25-record fixture encodes to input (25, 2, 4741)
(reference: src/fq_encode/tensor_encoder.rs:540-557).
"""

from __future__ import annotations

import numpy as np
import pytest

import deepchopper_tpu as dc
from deepchopper_tpu.data.tensor_encoder import FqEncoderOption, TensorEncoder


def _write_fq(path, records):
    with open(path, "w") as fh:
        for rid, seq, qual in records:
            fh.write(f"@{rid}\n{seq}\n+\n{qual}\n")


def test_kmer_ids_match_table():
    enc = TensorEncoder()
    seq = b"ATCGNATCG"
    ids = enc.kmer_ids(seq)
    expect = [enc.kmer2id_table[seq.decode()[i : i + 3]] for i in range(len(seq) - 2)]
    assert ids.tolist() == expect


def test_kmer_ids_normalizes_lowercase_and_unknown():
    enc = TensorEncoder()
    assert enc.kmer_ids(b"atcg").tolist() == enc.kmer_ids(b"ATCG").tolist()
    # unknown bases normalize to N rather than erroring
    ids = enc.kmer_ids(b"AXG")
    assert ids.tolist() == [enc.kmer2id_table["ANG"]]


def test_encode_shapes_and_padding(tmp_path):
    fq = tmp_path / "t.fq"
    _write_fq(
        fq,
        [
            ("r1|2:6", "ACGTACGT", "IIIIIIII"),  # len 8
            ("r2|0:0", "ACGTA", "IIIII"),  # len 5
        ],
    )
    (inputs, targets), quals = TensorEncoder().encode(fq)
    # W = 8 - 3 + 1 = 6, L = 8
    assert inputs.shape == (2, 2, 6)
    assert targets.shape == (2, 1, 6)
    assert quals.shape == (2, 8)
    # r2 is padded with -1 past its width (5-3+1 = 3 kmers)
    assert inputs[1, 0, 3:].tolist() == [-1, -1, -1]
    assert quals[1, 5:].tolist() == [-1, -1, -1]
    # r1 target 2:6 -> kmer region 2:4 (to_kmer_target_region with k=3)
    assert targets[0, 0].tolist() == [0, 0, 1, 1, 0, 0]
    # r2 has no target
    assert targets[1, 0].tolist() == [0] * 6
    # kmer-qual row: integer mean of 'I' (40) = 40
    assert inputs[0, 1, 0] == 40


def test_encode_start_end_targets(tmp_path):
    fq = tmp_path / "t.fq"
    _write_fq(fq, [("r1|2:6", "ACGTACGT", "IIIIIIII")])
    opt = FqEncoderOption(vectorized_target=False)
    (inputs, targets), _ = TensorEncoder(option=opt).encode(fq)
    assert targets.shape == (1, 1, 2)
    assert targets[0, 0].tolist() == [2, 4]


def test_encode_skips_short_and_rejects_len_mismatch(tmp_path):
    fq = tmp_path / "t.fq"
    _write_fq(fq, [("tiny", "AC", "II"), ("ok", "ACGTACGT", "IIIIIIII")])
    (inputs, _), _ = TensorEncoder().encode(fq)
    assert inputs.shape[0] == 1

    bad = tmp_path / "bad.fq"
    _write_fq(bad, [("b", "ACGT", "III")])
    with pytest.raises(dc.errors.EncodingError):
        TensorEncoder().encode(bad)


def test_encode_multiple_unifies_width(tmp_path):
    f1, f2 = tmp_path / "a.fq", tmp_path / "b.fq"
    _write_fq(f1, [("a", "ACGTA", "IIIII")])
    _write_fq(f2, [("b", "ACGTACGTACGT", "IIIIIIIIIIII")])
    (inputs, targets), quals = TensorEncoder().encode_multiple([f1, f2], parallel=True)
    assert inputs.shape == (2, 2, 10)
    assert quals.shape == (2, 12)
    assert inputs[0, 0, 3:].tolist() == [-1] * 7


def test_encode_fq_path_to_tensor_helper(tmp_path):
    fq = tmp_path / "t.fq"
    _write_fq(fq, [("r|1:5", "ACGTACGT", "IIIIIIII")])
    inputs, targets, quals, table = dc.encode_fq_path_to_tensor(fq)
    assert inputs.shape == (1, 2, 6)
    assert table == dc.generate_kmers_table(dc.default.BASES, dc.default.KMER_SIZE)


def test_reference_fixture_shape(reference_data):
    fq = reference_data / "twenty_five_records.fq"
    if not fq.exists():
        pytest.skip("fixture missing")
    inputs, targets, quals, _ = dc.encode_fq_path_to_tensor(fq)
    assert inputs.shape == (25, 2, 4741)
    assert quals.shape[0] == 25
    assert int(inputs[:, 0].max()) < len(dc.generate_kmers(dc.default.BASES, 3))


def test_reference_one_record_max_width_cases(reference_data):
    """Verbatim ports of the reference max-width shape cases
    (reference: src/fq_encode/tensor_encoder.rs:447-510): a too-small
    tensor_max_width auto-grows to the record's true width (1347 kmers,
    1349 bases), a larger one pads out to the requested 2000."""
    fq = reference_data / "one_record.fq"
    if not fq.exists():
        pytest.skip("fixture missing")

    enc = TensorEncoder(option=FqEncoderOption(kmer_size=3), tensor_max_width=100)
    (inputs, targets), quals = enc.encode(fq)
    assert inputs.shape == (1, 2, 1347)
    assert targets.shape == (1, 1, 1347)
    assert quals.shape == (1, 1349)

    enc = TensorEncoder(
        option=FqEncoderOption(kmer_size=3), tensor_max_width=2000, tensor_max_seq_len=2000
    )
    (inputs, targets), quals = enc.encode(fq)
    assert inputs.shape == (1, 2, 2000)
    assert targets.shape == (1, 1, 2000)
    assert quals.shape == (1, 2000)


def test_encoder_classes_roundtrip(tmp_path):
    fq = tmp_path / "t.fq"
    _write_fq(fq, [("r|1:5", "ACGTACGT", "IIIIIIII")])
    out_json = dc.JsonEncoder(dc.FqEncoderOption()).encode(fq, tmp_path / "t.json")
    assert out_json.exists() and out_json.read_text().strip()
    pa = pytest.importorskip("pyarrow")
    out_pq = dc.ParquetEncoder(dc.FqEncoderOption()).encode(fq, tmp_path / "t.parquet")
    import pyarrow.parquet as pq

    tbl = pq.read_table(out_pq)
    assert tbl.num_rows == 1 and tbl.column_names == ["id", "seq", "qual", "target"]
