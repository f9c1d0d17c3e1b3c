"""Vectorized base-sequence ops: normalization, tokenization LUTs, complement.

TPU-first design note: the vocabulary is tiny and fixed, so "tokenization" is a
uint8 table gather over the raw read bytes — a single NumPy `take` on host (or a
gather on device). This replaces the reference's per-record HF-tokenizer `.map`
(reference: deepchopper/models/llm/tokenizer.py:96-142) and needletail's
`normalize` (reference: src/fq_encode/triat.rs:76).
"""

from __future__ import annotations

import numpy as np

from .. import default

# ---------------------------------------------------------------------------
# Lookup tables (built once at import)
# ---------------------------------------------------------------------------


def _build_normalize_lut(iupac: bool) -> np.ndarray:
    """ASCII -> normalized-base LUT: uppercase, U->T, everything else N."""
    lut = np.full(256, ord("N"), dtype=np.uint8)
    for ch in "ACGT":
        lut[ord(ch)] = ord(ch)
        lut[ord(ch.lower())] = ord(ch)
    for ch in ("U", "u"):
        lut[ord(ch)] = ord("T")
    if iupac:
        for ch in "BDHKMRSVWY":
            lut[ord(ch)] = ord(ch)
            lut[ord(ch.lower())] = ord(ch)
    return lut


_NORM_LUT = _build_normalize_lut(iupac=False)
_NORM_LUT_IUPAC = _build_normalize_lut(iupac=True)


def _build_token_lut() -> np.ndarray:
    """ASCII -> token-id LUT (A=7 C=8 G=9 T=10 N=11, unknown -> UNK)."""
    lut = np.full(256, default.TOKEN_UNK, dtype=np.int32)
    mapping = {
        "A": default.TOKEN_A,
        "C": default.TOKEN_C,
        "G": default.TOKEN_G,
        "T": default.TOKEN_T,
        "N": default.TOKEN_N,
    }
    for ch, tok in mapping.items():
        lut[ord(ch)] = tok
        lut[ord(ch.lower())] = tok
    # U tokenizes as T after normalization; accept raw U too.
    lut[ord("U")] = default.TOKEN_T
    lut[ord("u")] = default.TOKEN_T
    return lut


_TOKEN_LUT = _build_token_lut()


def _build_detoken_lut() -> np.ndarray:
    """token-id -> ASCII base LUT; unknown ids decode to 'N'.

    Matches reference id tables where ids outside 7..11 map to 'N'
    (reference: src/smooth/utils.rs:6-46).
    """
    lut = np.full(256, ord("N"), dtype=np.uint8)
    lut[default.TOKEN_A] = ord("A")
    lut[default.TOKEN_C] = ord("C")
    lut[default.TOKEN_G] = ord("G")
    lut[default.TOKEN_T] = ord("T")
    lut[default.TOKEN_N] = ord("N")
    return lut


_DETOKEN_LUT = _build_detoken_lut()


def _build_revcomp_lut() -> np.ndarray:
    lut = np.arange(256, dtype=np.uint8)
    pairs = {"A": "T", "T": "A", "C": "G", "G": "C", "a": "t", "t": "a", "c": "g", "g": "c"}
    for src, dst in pairs.items():
        lut[ord(src)] = ord(dst)
    return lut


_REVCOMP_LUT = _build_revcomp_lut()

# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def seq_to_bytes(seq: str | bytes | np.ndarray) -> np.ndarray:
    """Coerce a sequence to a uint8 byte array (zero-copy for bytes)."""
    if isinstance(seq, np.ndarray):
        return seq.astype(np.uint8, copy=False)
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return np.frombuffer(seq, dtype=np.uint8)


def normalize_seq(seq: str | bytes, iupac: bool = False) -> str:
    """Uppercase and map non-ACGT(N) characters to N; U/u map to T.

    API-compatible with the reference's `normalize_seq`
    (reference: src/python.rs `normalize_seq`, needletail normalize semantics).
    """
    lut = _NORM_LUT_IUPAC if iupac else _NORM_LUT
    out = lut[seq_to_bytes(seq)]
    return out.tobytes().decode("ascii")


def normalize_seq_bytes(seq: np.ndarray, iupac: bool = False) -> np.ndarray:
    """Vectorized `normalize_seq` over a uint8 array (batched host path)."""
    lut = _NORM_LUT_IUPAC if iupac else _NORM_LUT
    return lut[seq]


def reverse_complement(seq: str) -> str:
    """Reverse complement (reference: src/python.rs `reverse_complement`)."""
    out = _REVCOMP_LUT[seq_to_bytes(seq)][::-1]
    return out.tobytes().decode("ascii")


def tokenize_bases(seq: str | bytes | np.ndarray) -> np.ndarray:
    """Base characters -> token ids (int32), one id per base.

    Equivalent to the HyenaDNA character tokenizer on a normalized sequence,
    WITHOUT special tokens (callers append SEP / pad as the batch contract
    requires; see data.collator).
    """
    return _TOKEN_LUT[seq_to_bytes(seq)]


def detokenize_bases(ids: np.ndarray) -> str:
    """Token ids -> base string; ids outside 7..11 decode to 'N'.

    Equivalent to `id_list2seq_i64` (reference: src/smooth/utils.rs:34-39).
    """
    ids = np.asarray(ids)
    clipped = np.clip(ids, 0, 255).astype(np.int64)
    # Negative ids (shouldn't occur) also land on 'N' via clip to 0.
    return _DETOKEN_LUT[clipped].tobytes().decode("ascii")


def id_list2seq(id_list) -> str:
    """API-compatible alias for the reference's `id_list2seq`."""
    return detokenize_bases(np.asarray(id_list))


def ascii_list2str(ascii_list) -> str:
    """Packed ascii codes -> str (reference: src/smooth/utils.rs:27-32)."""
    arr = np.asarray(ascii_list, dtype=np.int64)
    return arr.astype(np.uint8).tobytes().decode("ascii", errors="replace")
