"""Native span-batch encode parity vs the per-read Python path."""

from __future__ import annotations

import numpy as np
import pytest

from deepchopper_tpu import default, native
from deepchopper_tpu.data.bucketing import default_buckets, encode_read
from deepchopper_tpu.data.fastq_module import iter_batches
from deepchopper_tpu.data.span_batches import SpanBatchSource, iter_fastq_chunks_indexed

pytestmark = pytest.mark.skipif(not native.available(), reason="native host ops unavailable")


def _write_fastq(path, reads):
    with open(path, "wb") as fh:
        for rid, seq, qual in reads:
            fh.write(b"@%s\n%s\n+\n%s\n" % (rid.encode(), seq.encode(), qual.encode()))


def _random_reads(n, rng, min_len=50, max_len=3000):
    reads = []
    for i in range(n):
        length = int(rng.integers(min_len, max_len))
        seq = "".join(rng.choice(list("ACGTacgtNuX"), length))
        qual = "".join(chr(c) for c in rng.integers(33, 74, length))
        reads.append((f"read_{i}", seq, qual))
    return reads


def test_encode_spans_batch_matches_encode_read(tmp_path):
    rng = np.random.default_rng(0)
    reads = _random_reads(40, rng)
    fq = tmp_path / "r.fq"
    _write_fastq(fq, reads)

    (buf, spans), = list(iter_fastq_chunks_indexed(fq))
    assert spans.shape[0] == len(reads)
    max_length = 1024
    width = 1024
    rows = np.arange(len(reads), dtype=np.int64)
    ids, quals, lengths = native.encode_spans_batch(
        buf, spans, rows, width, max_length, default.TOKEN_SEP, default.TOKEN_PAD
    )

    from deepchopper_tpu.ops.sequence import normalize_seq

    for i, (rid, seq, qual) in enumerate(reads):
        qs = np.frombuffer(qual.encode(), np.uint8).astype(np.int64) - 33
        enc = encode_read(rid, normalize_seq(seq), qs, None, max_length)
        n = len(enc.input_ids)
        assert lengths[i] == n
        np.testing.assert_array_equal(ids[i, :n].astype(np.int32), enc.input_ids)
        assert (ids[i, n:] == default.TOKEN_PAD).all()
        np.testing.assert_array_equal(quals[i, :n], enc.quals_raw)
        assert (quals[i, n:] == 0).all()


def test_span_batches_match_python_batches(tmp_path):
    """Same reads through both feeds -> identical per-read tensors."""
    rng = np.random.default_rng(1)
    reads = _random_reads(120, rng, min_len=60, max_len=2000)
    fq = tmp_path / "m.fq"
    _write_fastq(fq, reads)

    buckets = default_buckets(2048)
    kw = dict(max_length=2048, tokens_per_batch=1 << 14, buckets=buckets, max_batch=64)
    ref: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for batch in iter_batches(fq, has_targets=False, **kw):
        for i, rid in enumerate(batch.read_ids):
            n = int(batch.lengths[i])
            ref[rid] = (batch.input_ids[i, :n].copy(), batch.quals_raw[i, :n].copy())

    got = {}
    source = SpanBatchSource(fq, **kw)
    for sb in source.batches():
        for i, (chunk, row) in enumerate(sb.refs):
            sp = chunk.spans[row]
            rid = bytes(chunk.buf[sp[0] : sp[0] + sp[1]]).decode()
            n = int(sb.lengths[i])
            got[rid] = (sb.input_ids[i, :n].astype(np.int32), sb.quals_raw[i, :n].copy())

    assert set(got) == set(ref)
    for rid in ref:
        np.testing.assert_array_equal(got[rid][0], ref[rid][0], err_msg=rid)
        np.testing.assert_array_equal(got[rid][1], ref[rid][1], err_msg=rid)


def test_span_source_multi_chunk_and_force_flush(tmp_path):
    """Small chunk_bytes exercises cross-chunk batches and stale flushes."""
    rng = np.random.default_rng(2)
    reads = _random_reads(300, rng, min_len=100, max_len=900)
    fq = tmp_path / "c.fq"
    _write_fastq(fq, reads)

    chunks = []
    source = SpanBatchSource(
        fq,
        max_length=1024,
        tokens_per_batch=1 << 15,
        buckets=[256, 512, 1024],
        chunk_bytes=16 << 10,
        on_chunk=chunks.append,
        max_lag_chunks=1,
    )
    seen = set()
    for sb in source.batches():
        for chunk, row in sb.refs:
            sp = chunk.spans[row]
            seen.add(bytes(chunk.buf[sp[0] : sp[0] + sp[1]]).decode())
    assert len(chunks) > 3
    assert sum(c.n_records for c in chunks) == len(reads)
    assert seen == {rid for rid, _, _ in reads}


def test_span_source_max_samples(tmp_path):
    rng = np.random.default_rng(3)
    reads = _random_reads(50, rng)
    fq = tmp_path / "s.fq"
    _write_fastq(fq, reads)
    source = SpanBatchSource(fq, max_length=4096, max_samples=17)
    total = sum(len(sb.refs) for sb in source.batches())
    assert total == 17
