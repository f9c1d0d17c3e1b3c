"""Host data pipeline: FASTQ parsing, tokenizer-contract encoding, bucketing."""

from .bucketing import (
    Batch,
    EncodedRead,
    bucketed_batches,
    default_buckets,
    encode_read,
    pad_batch,
    pick_bucket,
)
from .fastq_module import iter_batches, iter_encoded_reads, parse_fastq_file

__all__ = [
    "Batch",
    "EncodedRead",
    "bucketed_batches",
    "default_buckets",
    "encode_read",
    "iter_batches",
    "iter_encoded_reads",
    "pad_batch",
    "parse_fastq_file",
    "pick_bucket",
]
