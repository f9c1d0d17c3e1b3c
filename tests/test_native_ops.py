"""Native C++ host ops: parity with the NumPy reference implementations.

The native library (deepchopper_tpu/native/host_ops.cpp) accelerates the host
data plane the reference implements in Rust (reference: src/output/writefq.rs,
src/smooth/utils.rs:48-97). Every op must agree bit-for-bit with the Python
fallback — these tests are the contract.
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from deepchopper_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


# -- fq_index ----------------------------------------------------------------


def test_fq_index_basic():
    buf = np.frombuffer(b"@r1 desc\nACGT\n+\nIIII\n@r2\nAC\n+r2\n!!\n", np.uint8)
    spans, consumed = native.fq_index(buf)
    assert len(spans) == 2
    assert consumed == buf.size
    raw = buf.tobytes()
    i0, l0 = spans[0][0], spans[0][1]
    assert raw[i0 : i0 + l0] == b"r1"
    s, sl = spans[0][2], spans[0][3]
    assert raw[s : s + sl] == b"ACGT"
    q, ql = spans[1][4], spans[1][5]
    assert raw[q : q + ql] == b"!!"


def test_fq_index_crlf_and_no_trailing_newline():
    buf = np.frombuffer(b"@r1\r\nACGT\r\n+\r\nIIII", np.uint8)
    spans, consumed = native.fq_index(buf, final=True)
    assert len(spans) == 1
    assert spans[0][3] == 4 and spans[0][5] == 4


def test_fq_index_streaming_carry():
    full = b"@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\nJJJJ\n"
    cut = 20  # mid-second-record
    spans, consumed = native.fq_index(np.frombuffer(full[:cut], np.uint8), final=False)
    assert len(spans) == 1
    assert consumed == 16
    spans2, consumed2 = native.fq_index(np.frombuffer(full[consumed:], np.uint8), final=True)
    assert len(spans2) == 1


def test_fq_index_malformed():
    with pytest.raises(ValueError, match="malformed header"):
        native.fq_index(np.frombuffer(b"not_fastq\nACGT\n+\nIIII\n", np.uint8))
    with pytest.raises(ValueError, match="length mismatch"):
        native.fq_index(np.frombuffer(b"@r\nACGT\n+\nII\n@x\nA\n+\nI\n", np.uint8))


# -- encode ------------------------------------------------------------------


def test_encode_read_matches_python():
    from deepchopper_tpu.ops.qual import encode_qual
    from deepchopper_tpu.ops.sequence import tokenize_bases

    seq = b"ACGTNacgtnXYZ"
    qual = bytes(range(33, 33 + len(seq)))
    ids, quals = native.encode_read(seq, qual)
    np.testing.assert_array_equal(ids, tokenize_bases(seq.decode()))
    np.testing.assert_array_equal(quals, encode_qual(qual.decode("ascii")))


# -- majority vote / regions -------------------------------------------------


def test_majority_vote_parity_random():
    from deepchopper_tpu.ops.labels import majority_voting

    rng = np.random.default_rng(42)
    for window in (3, 8, 21):
        lens = rng.integers(1, 200, 40)
        maxlen = int(lens.max())
        mat = np.full((40, maxlen), -1, np.int8)
        for i, L in enumerate(lens):
            mat[i, :L] = rng.integers(0, 2, L)
        out = native.majority_vote_batch(mat, lens, window)
        for i, L in enumerate(lens):
            np.testing.assert_array_equal(
                out[i, :L], majority_voting(mat[i, :L], window), err_msg=f"row {i} w {window}"
            )
            np.testing.assert_array_equal(out[i, L:], mat[i, L:])


def test_label_regions_parity_exhaustive():
    from itertools import product

    from deepchopper_tpu.ops.labels import get_label_region

    for n in range(0, 10):
        for bits in product([0, 1], repeat=n):
            v = np.asarray(bits, np.int8)
            assert native.label_regions(v) == get_label_region(v), bits


# -- bgzf --------------------------------------------------------------------


def test_bgzf_compress_roundtrip_gzip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    comp = native.bgzf_compress(data, threads=2, eof=True)
    assert gzip.decompress(comp) == data


def test_bgzf_native_decompress_roundtrip():
    data = b"The quick brown fox\n" * 50_000
    comp = native.bgzf_compress(data, threads=3, eof=True)
    assert native.bgzf_decompress(comp, threads=3) == data


def test_bgzf_empty():
    comp = native.bgzf_compress(b"", eof=True)
    assert gzip.decompress(comp) == b""
    assert native.bgzf_decompress(comp) == b""


# -- integration: reader/writer paths ---------------------------------------


def test_streaming_reader_native_matches_python(tmp_path):
    from deepchopper_tpu.io.fastq import StreamingFastqReader

    rng = np.random.default_rng(1)
    path = tmp_path / "reads.fq"
    with open(path, "wb") as fh:
        for i in range(500):
            L = int(rng.integers(50, 400))
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), L).tobytes()
            fh.write(b"@read_%d some description|10:20\n%s\n+\n%s\n" % (i, seq, b"I" * L))

    native_recs = list(StreamingFastqReader(path))
    import deepchopper_tpu.native as nat

    orig = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True
        python_recs = list(StreamingFastqReader(path))
    finally:
        nat._LIB = orig
        nat._TRIED = False
    assert len(native_recs) == 500
    for a, b in zip(native_recs, python_recs):
        assert a.name == b.name and a.seq == b.seq and a.qual == b.qual


def test_bgzf_writer_reader_roundtrip(tmp_path):
    from deepchopper_tpu.io.bgzf import open_bgzf_reader, open_bgzf_writer

    payload = b"@r\nACGT\n+\nIIII\n" * 100_000  # multi-block
    path = tmp_path / "out.fq.gz"
    with open_bgzf_writer(path, threads=2) as fh:
        fh.write(payload)
    assert gzip.decompress(path.read_bytes()) == payload
    with open_bgzf_reader(path, threads=2) as fh:
        assert fh.read() == payload
