"""Global constants for deepchopper_tpu.

Mirrors the reference compile-time constants (reference: src/default.rs:1-7) plus
the tokenizer vocabulary contract used across the whole pipeline
(reference: deepchopper/models/llm/tokenizer.py, src/smooth/utils.rs:6-25).
"""

from __future__ import annotations

# --- FASTQ / encoding constants (reference: src/default.rs:1-7) ---
QUAL_OFFSET: int = 33
BASES: str = "ATCGN"
KMER_SIZE: int = 3
VECTORIZED_TARGET: bool = True
MIN_READ_LEN: int = 150
MIN_CHOPED_SEQ_LEN: int = 20
IGNORE_LABEL: int = -100

# --- Character-level tokenizer vocabulary ---
# Matches the HyenaDNA character tokenizer id layout the reference depends on
# (reference: src/smooth/utils.rs:6-25 maps ids 7..11 -> ACGTN).
TOKEN_CLS: int = 0
TOKEN_SEP: int = 1  # appended at end of every tokenized read (EOS)
TOKEN_BOS: int = 2
TOKEN_MASK: int = 3
TOKEN_PAD: int = 4
TOKEN_RESERVED: int = 5
TOKEN_UNK: int = 6
TOKEN_A: int = 7
TOKEN_C: int = 8
TOKEN_G: int = 9
TOKEN_T: int = 10
TOKEN_N: int = 11
VOCAB_SIZE: int = 12

# Max sequence lengths per backbone family
# (reference: deepchopper/models/llm/components.py:8-14).
HYENA_MAX_LENGTHS: dict[str, int] = {
    "hyenadna-tiny-1k-seqlen": 1024,
    "hyenadna-small-32k-seqlen": 32768,
    "hyenadna-medium-160k-seqlen": 160_000,
    "hyenadna-medium-450k-seqlen": 450_000,
    "hyenadna-large-1m-seqlen": 1_000_000,
}

# --- Chop-stage tuned defaults (reference: src/bin/predict.rs:39-78) ---
SMOOTH_WINDOW_SIZE: int = 21
MIN_INTERVAL_SIZE: int = 13
APPROVED_INTERVAL_NUMBER: int = 20
MAX_PROCESS_INTERVALS: int = 4
MIN_READ_LENGTH_AFTER_CHOP: int = 20
CHOP_CHUNK_SIZE: int = 10_000

# Packed-ascii read-id width in prediction shards
# (reference: deepchopper/models/llm/tokenizer.py:145-178).
MAX_ID_LENGTH: int = 256
