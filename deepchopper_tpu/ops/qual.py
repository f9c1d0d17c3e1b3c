"""Quality-score encoding ops (vectorized host path).

Replaces the reference's per-record Rust loops with NumPy vector ops
(reference: src/fq_encode/triat.rs:102-134, src/kmer.rs:14-27).
"""

from __future__ import annotations

import numpy as np

from .. import default
from .sequence import seq_to_bytes


def encode_qual(qual: str | bytes, qual_offset: int = default.QUAL_OFFSET) -> np.ndarray:
    """Phred+offset ASCII quality string -> int32 scores.

    API-compatible with the reference's `encode_qual(qual, qual_offset)`
    (reference: src/python.rs:25-35).
    """
    return (seq_to_bytes(qual).astype(np.int32)) - int(qual_offset)


def encode_qual_kmer(
    qual: str | bytes,
    kmer_size: int,
    qual_offset: int = default.QUAL_OFFSET,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-base scores plus per-overlapping-kmer integer-mean scores.

    Mirrors `Encoder::encode_qual` exactly, including the u8 integer floor
    division used for the k-mer mean (reference: src/fq_encode/triat.rs:102-134).
    """
    scores = encode_qual(qual, qual_offset)
    k = int(kmer_size)
    if k <= 0 or scores.size < k:
        return scores, np.zeros(0, dtype=np.int32)
    windows = np.lib.stride_tricks.sliding_window_view(scores, k)
    # Reference sums into u8 then floor-divides; phred scores are <=93 so a sum
    # of k<=3 values fits u8, but emulate the wrap for robustness.
    sums = windows.sum(axis=1).astype(np.int64) % 256
    means = (sums // k).astype(np.int32)
    return scores, means


def splite_qual_by_offsets(target: list[int] | np.ndarray, offsets) -> list[int]:
    """Mean quality per token span; 0 for empty (special-token) spans.

    API-compatible with `splite_qual_by_offsets` (reference: src/kmer.rs:14-27,
    including the integer floor mean).
    """
    target = np.asarray(target, dtype=np.int64)
    out: list[int] = []
    for start, end in offsets:
        if start == end:
            out.append(0)
        else:
            out.append(int(target[start:end].sum() // (end - start)))
    return out


def normalize_quals(quals: np.ndarray, axis: int = -1, eps: float = 1e-12) -> np.ndarray:
    """L2-normalize quality vectors, matching torch.nn.functional.normalize.

    The reference normalizes the (len+1)-long qual vector per read before
    padding (reference: deepchopper/models/llm/tokenizer.py:131). Zero padding
    afterwards does not change the L2 norm, so normalizing the padded
    fixed-shape batch is numerically identical — that is what the TPU
    batching path does.
    """
    quals = np.asarray(quals, dtype=np.float32)
    norm = np.sqrt(np.sum(quals * quals, axis=axis, keepdims=True))
    return quals / np.maximum(norm, eps)
