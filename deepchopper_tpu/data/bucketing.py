"""Length-bucketed fixed-shape batching for TPU.

The reference pads dynamically to the longest read per batch
(reference: deepchopper/models/llm/tokenizer.py:34-93), which would recompile
XLA per batch. Here reads are routed into a small set of fixed widths
(multiples of 128 for lane alignment), so the whole run compiles once per
bucket. Right padding + the causal backbone make padding semantically inert
(see tests/test_models.py::test_padding_invariance_with_right_pad).

Batch contract per read (reference: deepchopper/models/llm/tokenizer.py:121-178):
* input_ids  = base tokens[:T] + SEP, padded with PAD(4)       (int32)
* labels     = target 0/1 over T + IGNORE at SEP + IGNORE pads (int32)
* input_quals= phred[:T] + 0, L2-normalized per read, 0 pads   (float32)
* id         = [len, truncated, ord(c)...] padded to 256       (int32)
where T = min(len(seq), max_length - 1) and truncated = len >= max_length.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterable, Iterator

import numpy as np

from .. import default
from ..ops.labels import vectorize_targets
from ..ops.qual import normalize_quals
from ..ops.sequence import tokenize_bases


@dataclasses.dataclass
class EncodedRead:
    """One tokenized read, pre-padding."""

    id: str
    input_ids: np.ndarray  # (T+1,) int32, ends with SEP
    labels: np.ndarray  # (T+1,) int32, ends with IGNORE
    quals: np.ndarray  # (T+1,) float32, L2-normalized
    truncated: bool
    raw_len: int
    seq: str | None = None  # normalized sequence (fused chop path)
    quals_raw: np.ndarray | None = None  # (T+1,) uint8 phred ints, 0 at SEP


@dataclasses.dataclass
class Batch:
    """One fixed-shape padded batch."""

    input_ids: np.ndarray  # (B, W) int32
    labels: np.ndarray  # (B, W) int32
    quals: np.ndarray  # (B, W) float32
    ids: np.ndarray  # (B, 256) int32
    lengths: np.ndarray  # (B,) int32 — valid token count incl. SEP
    read_ids: list[str]
    seqs: list[str | None] | None = None  # normalized sequences (fused path)
    quals_raw: np.ndarray | None = None  # (B, W) uint8 phred ints (device-norm path)


_BUCKET_LADDER = [
    256, 512, 768, 1024, 1280, 1536, 2048, 2560, 3072, 4096,
    5120, 6144, 8192, 12288, 16384, 24576, 32768,
]


def default_buckets(max_length: int = 32768, min_width: int = 256) -> list[int]:
    """Bucket widths up to max_length (always included).

    Fine-grained (multiples of 256) through the nanopore read-length bulk,
    coarser above — a mean-1200-base read pads to 1280 (~6% waste) instead of
    the next power of two (2048, ~41% waste). Non-pow2 widths cost nothing
    extra: the FFT conv kernels run mixed-radix at exactly N = 2W for any
    multiple of 256 (ops/pallas_fft._split). A denser (step-256) ladder was
    measured SLOWER end-to-end: per-bucket tail batches outweigh the in-row
    padding gain, so the ladder stays at 17 entries.
    """
    buckets = [w for w in _BUCKET_LADDER if min_width <= w < max_length]
    if max_length > (buckets[-1] if buckets else 0):
        buckets.append(max_length)
    return buckets


def encode_read(
    rid: str,
    seq: str,
    qual_scores: np.ndarray,
    targets: list[tuple[int, int]] | None,
    max_length: int,
) -> EncodedRead:
    """Tokenize one read per the reference tokenizer contract."""
    n = len(seq)
    truncated = n >= max_length
    t_len = min(n, max_length - 1)

    ids = np.empty(t_len + 1, dtype=np.int32)
    ids[:t_len] = tokenize_bases(seq[:t_len])
    ids[t_len] = default.TOKEN_SEP

    labels = np.full(t_len + 1, default.IGNORE_LABEL, dtype=np.int32)
    if targets:
        flat = [v for se in targets for v in se]
        first_end = flat[1] if len(flat) > 1 else 0
        if truncated and first_end + 2 > max_length:
            labels[:t_len] = 0
        else:
            labels[:t_len] = vectorize_targets(flat, t_len)
    else:
        labels[:t_len] = 0

    raw = np.zeros(t_len + 1, dtype=np.uint8)
    np.clip(qual_scores[:t_len], 0, 255, out=raw[:t_len], casting="unsafe")
    quals = normalize_quals(raw.astype(np.float32))

    return EncodedRead(rid, ids, labels, quals, truncated, n, seq, raw)


def pick_bucket(length: int, buckets: list[int]) -> int:
    """Smallest bucket width >= length (lengths beyond the last bucket clamp)."""
    for w in buckets:
        if length <= w:
            return w
    return buckets[-1]


def pad_batch(reads: list[EncodedRead], width: int) -> Batch:
    """Right-pad encoded reads into one fixed (B, width) batch."""
    from ..io.predicts import pack_read_ids

    b = len(reads)
    input_ids = np.full((b, width), default.TOKEN_PAD, dtype=np.int32)
    labels = np.full((b, width), default.IGNORE_LABEL, dtype=np.int32)
    quals = np.zeros((b, width), dtype=np.float32)
    quals_raw = np.zeros((b, width), dtype=np.uint8)
    lengths = np.zeros(b, dtype=np.int32)
    for i, r in enumerate(reads):
        n = len(r.input_ids)
        input_ids[i, :n] = r.input_ids
        labels[i, :n] = r.labels
        quals[i, :n] = r.quals
        if r.quals_raw is not None:
            quals_raw[i, :n] = r.quals_raw
        lengths[i] = n
    ids = pack_read_ids([r.id for r in reads], [r.truncated for r in reads])
    return Batch(
        input_ids,
        labels,
        quals,
        ids,
        lengths,
        [r.id for r in reads],
        [r.seq for r in reads],
        quals_raw,
    )


def bucketed_batches(
    reads: Iterable[EncodedRead],
    buckets: list[int] | None = None,
    tokens_per_batch: int = 1 << 17,
    max_batch: int = 512,
    min_batch: int = 1,
) -> Iterator[Batch]:
    """Group encoded reads into fixed-shape batches.

    Each bucket accumulates until its batch size target
    (`tokens_per_batch // width`, clamped to [min_batch, max_batch]) is hit.
    Remainders flush at the end (smaller final batch per bucket — still only
    one extra compile per bucket that underfills, and the engine pads batch
    dims up to the target to avoid even that).
    """
    buckets = buckets or default_buckets()
    pending: dict[int, list[EncodedRead]] = {w: [] for w in buckets}
    for r in reads:
        w = pick_bucket(len(r.input_ids), buckets)
        pending[w].append(r)
        target = max(min_batch, min(max_batch, tokens_per_batch // w))
        if len(pending[w]) >= target:
            yield pad_batch(pending[w], w)
            pending[w] = []
    for w, rs in pending.items():
        if rs:
            yield pad_batch(rs, w)
