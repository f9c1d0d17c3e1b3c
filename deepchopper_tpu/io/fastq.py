"""FASTQ streaming IO with compression sniffing.

TPU-native equivalent of the reference's noodles-based reader/writer stack
(reference: src/output/writefq.rs:84-349): magic-byte format detection,
a streaming record iterator, plain/bgzf writers, and multi-file merge.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import zipfile
from collections.abc import Iterable, Iterator
from pathlib import Path

from .bgzf import open_bgzf_writer
from .chop import FastqRecord

_MAGICS: list[tuple[bytes, str]] = [
    (b"\x1f\x8b", "gzip"),
    (b"PK\x03\x04", "zip"),
    (b"BZh", "bz2"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
]


def detect_compression(path: str | Path) -> str:
    """Sniff compression from magic bytes (reference: src/output/writefq.rs:84-135).

    Returns one of: "plain", "gzip", "bgzip", "zip", "bz2", "xz", "zstd".
    """
    with open(path, "rb") as fh:
        head = fh.read(18)
    for magic, name in _MAGICS:
        if head.startswith(magic):
            if name == "gzip":
                # BGZF: FLG has FEXTRA and the extra field starts with 'BC'.
                if len(head) >= 14 and head[3] & 0x04 and head[12:14] == b"BC":
                    return "bgzip"
                return "gzip"
            return name
    return "plain"


def open_compressed_reader(path: str | Path) -> io.BufferedIOBase:
    """Open a binary reader that transparently decompresses
    (reference: src/output/writefq.rs:148-160)."""
    kind = detect_compression(path)
    if kind == "bgzip":
        from .. import native

        if native.available():
            from .bgzf import open_bgzf_reader

            return open_bgzf_reader(path)
        return gzip.open(path, "rb")  # gzip handles concatenated bgzf members
    if kind == "gzip":
        return gzip.open(path, "rb")
    if kind == "bz2":
        return bz2.open(path, "rb")
    if kind == "xz":
        return lzma.open(path, "rb")
    if kind == "zip":
        zf = zipfile.ZipFile(path)
        names = zf.namelist()
        if len(names) != 1:
            raise ValueError(f"zip archive {path} must contain exactly one file")
        return zf.open(names[0], "r")  # type: ignore[return-value]
    if kind == "zstd":
        try:
            from compression import zstd  # Python >= 3.14

            return zstd.open(path, "rb")
        except ImportError:
            pass
        from . import zstd_ctypes

        if zstd_ctypes.available():
            return zstd_ctypes.open_zstd_reader(path)
        import shutil
        import subprocess

        if shutil.which("zstd"):  # pragma: no cover - env-dependent fallback
            proc = subprocess.Popen(["zstd", "-dc", str(path)], stdout=subprocess.PIPE)
            assert proc.stdout is not None
            return proc.stdout
        raise NotImplementedError(
            "zstd input needs Python >= 3.14, libzstd, or a zstd binary"
        )  # pragma: no cover
    return open(path, "rb")


_NATIVE_CHUNK = 8 << 20


class StreamingFastqReader:
    """Iterator over FASTQ records from any (possibly compressed) file.

    Equivalent to the reference's `StreamingFastqReader`
    (reference: src/output/writefq.rs:174-193). Yields `FastqRecord`s without
    materializing the file. When the native host library is available, record
    boundaries come from the C++ buffer scanner (`native.fq_index`) over large
    chunks instead of a per-line Python loop.
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._fh = open_compressed_reader(self.path)

    def __iter__(self) -> Iterator[FastqRecord]:
        from .. import native

        if native.available():
            return self._iter_native()
        return self._iter_python()

    def _iter_native(self) -> Iterator[FastqRecord]:
        import numpy as np

        from .. import native

        fh = self._fh
        carry = b""
        try:
            while True:
                chunk = fh.read(_NATIVE_CHUNK)
                final = not chunk
                buf = carry + chunk if carry else chunk
                if not buf:
                    break
                spans, consumed = native.fq_index(
                    np.frombuffer(buf, np.uint8), final=final
                )
                for row in spans:
                    id_off, id_len, s_off, s_len, q_off, q_len, d_off, d_len = (
                        int(v) for v in row
                    )
                    # Full header line (name + description, original separator).
                    end = d_off + d_len if d_off >= 0 else id_off + id_len
                    name = buf[id_off:end].decode("ascii")
                    yield FastqRecord(
                        name, buf[s_off : s_off + s_len], buf[q_off : q_off + q_len]
                    )
                carry = buf[consumed:]
                if final:
                    if carry.strip(b"\r\n"):
                        raise ValueError(f"{self.path}: truncated FASTQ record at EOF")
                    break
        finally:
            fh.close()

    def _iter_python(self) -> Iterator[FastqRecord]:
        fh = self._fh
        try:
            while True:
                header = fh.readline()
                if not header:
                    break
                header = header.rstrip(b"\r\n")
                if not header:
                    continue
                if not header.startswith(b"@"):
                    raise ValueError(f"{self.path}: malformed FASTQ header: {header[:60]!r}")
                seq = fh.readline().rstrip(b"\r\n")
                plus = fh.readline()
                if not plus.startswith(b"+"):
                    raise ValueError(f"{self.path}: malformed FASTQ separator for {header[:60]!r}")
                qual = fh.readline().rstrip(b"\r\n")
                yield FastqRecord(header[1:].decode("ascii"), seq, qual)
        finally:
            fh.close()


def read_fastq_records(path: str | Path) -> list[FastqRecord]:
    """Read all records (reference: `read_noodel_records_from_fq_or_zip_fq`)."""
    return list(StreamingFastqReader(path))


def iter_fastq_chunks(path: str | Path, chunk_size: int) -> Iterator[list[FastqRecord]]:
    """Stream records in fixed-size chunks (reference: src/bin/predict.rs:282-316)."""
    chunk: list[FastqRecord] = []
    for rec in StreamingFastqReader(path):
        chunk.append(rec)
        if len(chunk) >= chunk_size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def write_fq(records: Iterable[FastqRecord], path: str | Path | None = None) -> None:
    """Write records as plain FASTQ to `path` (or stdout when None)
    (reference: src/output/writefq.rs `write_fq`)."""
    if path is None:
        import sys

        for rec in records:
            sys.stdout.buffer.write(rec.to_bytes())
        return
    with open(path, "wb") as fh:
        for rec in records:
            fh.write(rec.to_bytes())


def write_fq_parallel(
    records: Iterable[FastqRecord], path: str | Path, threads: int = 4
) -> None:
    """Write records as BGZF-compressed FASTQ with pooled block compression
    (reference: src/output/writefq.rs:222-251)."""
    with open_bgzf_writer(path, threads=threads) as fh:
        for rec in records:
            fh.write(rec.to_bytes())


def write_fq_auto(records: Iterable[FastqRecord], path: str | Path, threads: int = 4) -> None:
    """Write plain or bgzf FASTQ depending on the file suffix."""
    if str(path).endswith((".gz", ".bgz")):
        write_fq_parallel(records, path, threads)
    else:
        write_fq(records, path)


def convert_multiple_fqs_to_one_fq(
    paths: list[str | Path], result_path: str | Path, parallel: bool = True
) -> None:
    """Merge FASTQs into one bgzf output (reference: src/output/writefq.rs:311-349)."""

    def _iter_all() -> Iterator[FastqRecord]:
        for p in paths:
            yield from StreamingFastqReader(p)

    write_fq_auto(_iter_all(), result_path, threads=4 if parallel else 1)
