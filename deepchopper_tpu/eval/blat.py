"""BLAT subprocess wrapper + PSL parsing.

Equivalent of `smooth::blat` (reference: src/smooth/blat.rs:19-184): run the
external `blat` binary on a candidate adapter sequence against a 2bit genome
and parse the PSL output. The binary is external in the reference too, so
callers must pass its path; everything degrades gracefully when absent.
"""

from __future__ import annotations

import dataclasses
import subprocess
import tempfile
from pathlib import Path

# Sequences shorter than this cannot be blatted (reference: src/smooth/blat.rs:19).
MIN_SEQ_SIZE = 20

# Flags from the reference driver (reference: src/smooth/blat.rs:166-173).
BLAT_ARGS = ["-stepSize=5", "-repMatch=2253", "-minScore=20", "-minIdentity=0"]


@dataclasses.dataclass
class PslAlignment:
    """One PSL line (reference: src/smooth/blat.rs:27-50)."""

    qname: str = ""
    qsize: int = 0
    qstart: int = 0
    qend: int = 0
    qmatch: int = 0
    tname: str = ""
    tsize: int = 0
    tstart: int = 0
    tend: int = 0
    identity: float = 0.0


def parse_psl(path: str | Path) -> list[PslAlignment]:
    """Parse a PSL file, skipping the 5 header lines; identity = match/qsize
    (reference: src/smooth/blat.rs:72-118)."""
    out: list[PslAlignment] = []
    with open(path) as fh:
        for i, line in enumerate(fh):
            if i < 5:
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 17:
                continue
            match = int(cols[0])
            qsize = int(cols[10])
            out.append(
                PslAlignment(
                    qname=cols[9],
                    qsize=qsize,
                    qstart=int(cols[11]),
                    qend=int(cols[12]),
                    qmatch=match,
                    tname=cols[13],
                    tsize=int(cols[14]),
                    tstart=int(cols[15]),
                    tend=int(cols[16]),
                    identity=match / qsize if qsize else 0.0,
                )
            )
    # Best alignment first (reference sorts by identity implicitly by taking [0]).
    out.sort(key=lambda a: a.identity, reverse=True)
    return out


def parse_psl_by_qname(path: str | Path) -> dict[str, list[PslAlignment]]:
    """Group PSL alignments by query name (reference: src/smooth/blat.rs:62-70)."""
    grouped: dict[str, list[PslAlignment]] = {}
    for al in parse_psl(path):
        grouped.setdefault(al.qname, []).append(al)
    return grouped


def blat(
    seq: str,
    blat_cli: str | Path,
    two_bit: str | Path,
    qname: str | None = None,
) -> list[PslAlignment]:
    """BLAT one sequence against a 2bit genome
    (reference: src/smooth/blat.rs:120-184). Raises on subprocess failure."""
    if len(seq) < MIN_SEQ_SIZE:
        raise ValueError(f"sequence shorter than MIN_SEQ_SIZE={MIN_SEQ_SIZE}")
    with tempfile.TemporaryDirectory() as tmp:
        fa = Path(tmp) / "query.fa"
        psl = Path(tmp) / "out.psl"
        fa.write_text(f">{qname or 'seq'}\n{seq}\n")
        cmd = [str(blat_cli), *BLAT_ARGS, str(two_bit), str(fa), str(psl)]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"blat failed ({proc.returncode}): {proc.stderr[:500]}")
        return parse_psl(psl)
