"""Minimal libzstd binding via ctypes.

The reference sniffs and reads zstd-compressed FASTQ input
(reference: src/output/writefq.rs:84-135 via the `zstd` crate). This
environment has neither the `zstandard` package nor Python 3.14's
`compression.zstd`, but the system `libzstd.so.1` is present — so the
streaming decompressor binds it directly. A one-shot `compress` is included
so tests can build fixtures without an external `zstd` binary.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import io
from pathlib import Path


class _Buffer(ctypes.Structure):
    # ZSTD_inBuffer / ZSTD_outBuffer share this layout.
    _fields_ = [
        ("ptr", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    try:
        lib.ZSTD_createDStream.restype = ctypes.c_void_p
        lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
        lib.ZSTD_initDStream.argtypes = [ctypes.c_void_p]
        lib.ZSTD_initDStream.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_Buffer),
            ctypes.POINTER(_Buffer),
        ]
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
        lib.ZSTD_getErrorName.restype = ctypes.c_char_p
        lib.ZSTD_DStreamInSize.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
        lib.ZSTD_compress.restype = ctypes.c_size_t
    except AttributeError:
        return None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def compress(data: bytes, level: int = 3) -> bytes:
    """One-shot compress (fixture/testing helper)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libzstd not available")
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(dst, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise RuntimeError(f"zstd compress: {lib.ZSTD_getErrorName(n).decode()}")
    return dst.raw[:n]


class _ZstdRaw(io.RawIOBase):
    """Streaming decompressor over a file, as a raw binary reader."""

    def __init__(self, path: str | Path):
        lib = _load()
        if lib is None:
            raise RuntimeError("libzstd not available")
        self._lib = lib
        self._fh = open(path, "rb")
        self._ds = lib.ZSTD_createDStream()
        if not self._ds:
            self._fh.close()
            raise RuntimeError("ZSTD_createDStream failed")
        lib.ZSTD_initDStream(self._ds)
        self._chunk = int(lib.ZSTD_DStreamInSize())
        self._in = _Buffer(None, 0, 0)
        self._in_bytes = b""  # keeps the ctypes-pointed input alive
        self._src_eof = False

    def readable(self) -> bool:  # pragma: no cover - trivial
        return True

    def readinto(self, b) -> int:
        if not b:
            return 0
        mv = memoryview(b).cast("B")
        out_arr = (ctypes.c_char * len(mv)).from_buffer(mv)
        out = _Buffer(ctypes.cast(out_arr, ctypes.c_void_p), len(mv), 0)
        lib = self._lib
        while out.pos == 0:
            if self._in.pos >= self._in.size:
                if self._src_eof:
                    return 0
                self._in_bytes = self._fh.read(self._chunk)
                if not self._in_bytes:
                    self._src_eof = True
                    return 0
                self._in = _Buffer(
                    ctypes.cast(ctypes.c_char_p(self._in_bytes), ctypes.c_void_p),
                    len(self._in_bytes),
                    0,
                )
            ret = lib.ZSTD_decompressStream(
                self._ds, ctypes.byref(out), ctypes.byref(self._in)
            )
            if lib.ZSTD_isError(ret):
                raise OSError(f"zstd decompress: {lib.ZSTD_getErrorName(ret).decode()}")
            if ret == 0 and self._in.pos >= self._in.size and out.pos == 0:
                # frame boundary with no pending input: try next frame/EOF
                continue
        return out.pos

    def close(self) -> None:
        if not self.closed:
            if getattr(self, "_ds", None):
                self._lib.ZSTD_freeDStream(self._ds)
                self._ds = None
            if getattr(self, "_fh", None):
                self._fh.close()
        super().close()


def open_zstd_reader(path: str | Path) -> io.BufferedIOBase:
    return io.BufferedReader(_ZstdRaw(path))
