"""Error types (reference: src/error.rs:4-53)."""

from __future__ import annotations


class EncodingError(ValueError):
    """Base error for encode/chop pipeline failures."""


class TargetRegionInvalid(EncodingError):
    """Target region is out of bounds or inverted (reference: src/error.rs)."""


class SeqShorterThanKmer(EncodingError):
    """Sequence shorter than the requested k-mer size."""


class InvalidInterval(EncodingError):
    """Interval does not fit inside the sequence (reference: src/output/split.rs:311)."""


class InvalidKmerId(EncodingError):
    """Unknown k-mer id during decoding."""


class QualSeqLengthMismatch(EncodingError):
    """Sequence and quality lengths differ (reference: src/output/split.rs:86-107)."""
