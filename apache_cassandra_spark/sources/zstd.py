"""Zstandard (RFC 8878) via a ctypes binding to the SYSTEM libzstd —
the companion of :mod:`.brotli` for the crawl-ingest decode path.
``Content-Encoding: zstd`` is the IANA-registered content coding
(RFC 8878 §7.2) and ships in current Chrome/CDN stacks, so fresh crawls
carry it alongside ``br``.

Same posture as the brotli binding (see that module's docstring for the
rationale): runtime ``ctypes.util.find_library`` against the distro's
canonical public implementation (facebook/zstd, BSD-licensed) — no
Python package needed; :func:`available` is False when the shared
library is absent and callers keep the flagged-row contract. Hostile
input is attacker-controlled crawl bytes: streaming decode in 64 KiB
hops under a hard ``max_output`` decompression-bomb cap, strict
``ValueError`` on corruption and truncation, and the RFC's
one-or-more-frames framing (a content coding may concatenate frames —
§4.1) is honored by continuing across frame boundaries while trailing
NON-frame garbage still errors.

:func:`compress` (one-shot ``ZSTD_compress``) exists for fixtures and
round-trip fuzz — the encoder-feeds-decoder-tests pattern.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from ctypes import POINTER, byref, c_int, c_size_t, c_void_p

_LIB = None
_LOADED = False


class _InBuffer(ctypes.Structure):
    _fields_ = [("src", c_void_p), ("size", c_size_t), ("pos", c_size_t)]


class _OutBuffer(ctypes.Structure):
    _fields_ = [("dst", c_void_p), ("size", c_size_t), ("pos", c_size_t)]


def _ensure_loaded() -> None:
    global _LIB, _LOADED
    if _LOADED:
        return
    _LOADED = True
    path = ctypes.util.find_library("zstd")
    if not path:
        return
    try:
        lib = ctypes.CDLL(path)
        lib.ZSTD_createDCtx.restype = c_void_p
        lib.ZSTD_createDCtx.argtypes = []
        lib.ZSTD_freeDCtx.restype = c_size_t
        lib.ZSTD_freeDCtx.argtypes = [c_void_p]
        lib.ZSTD_decompressStream.restype = c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            c_void_p, POINTER(_OutBuffer), POINTER(_InBuffer)
        ]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [c_size_t]
        lib.ZSTD_compressBound.restype = c_size_t
        lib.ZSTD_compressBound.argtypes = [c_size_t]
        lib.ZSTD_compress.restype = c_size_t
        lib.ZSTD_compress.argtypes = [
            c_void_p, c_size_t, c_void_p, c_size_t, c_int
        ]
    except (OSError, AttributeError):
        return
    _LIB = lib


def available() -> bool:
    """True when the system ``libzstd`` is loadable."""
    _ensure_loaded()
    return _LIB is not None


def decompress(data: bytes, max_output: int = 64 * 1024 * 1024) -> bytes:
    """Streaming-strict zstd decode of one-or-more concatenated frames
    (the RFC 8878 content-coding framing).

    Raises ``ValueError`` on corrupt bytes, a truncated final frame, or
    decoded output past ``max_output`` (decompression-bomb guard);
    ``NotImplementedError`` when the system library is absent."""
    _ensure_loaded()
    if _LIB is None:
        raise NotImplementedError(
            "zstd: system libzstd not present; rows keep "
            "http_encoding='zstd' and NULL body_text"
        )
    lib = _LIB
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise ValueError("zstd: decoder context allocation failed")
    try:
        src = ctypes.create_string_buffer(data, len(data)) if data else ctypes.create_string_buffer(1)
        inb = _InBuffer(ctypes.cast(src, c_void_p), len(data), 0)
        hop = 64 * 1024
        out_buf = ctypes.create_string_buffer(hop)
        chunks: list[bytes] = []
        total = 0
        last_ret = None
        while inb.pos < inb.size:
            outb = _OutBuffer(ctypes.cast(out_buf, c_void_p), hop, 0)
            before = (inb.pos, 0)
            ret = lib.ZSTD_decompressStream(dctx, byref(outb), byref(inb))
            if lib.ZSTD_isError(ret):
                raise ValueError("zstd: corrupt stream")
            if outb.pos:
                chunks.append(out_buf.raw[: outb.pos])
                total += outb.pos
                if total > max_output:
                    raise ValueError(
                        f"zstd: decoded output exceeds max_output={max_output}"
                    )
            last_ret = ret
            if inb.pos == before[0] and outb.pos == 0:
                # no progress: demands more output room for zero input —
                # cannot happen with a fresh out buffer; corrupt framing
                raise ValueError("zstd: corrupt stream (no progress)")
        # ret == 0 means the LAST frame ended exactly at the input end;
        # anything else is a frame cut mid-way (RFC framing violated)
        if last_ret is None or last_ret != 0:
            raise ValueError("zstd: truncated stream")
        return b"".join(chunks)
    finally:
        lib.ZSTD_freeDCtx(dctx)


def compress(data: bytes, level: int = 3) -> bytes:
    """One-shot zstd encode (``ZSTD_compress``). Fixture/round-trip aid;
    raises ``NotImplementedError`` without the system library."""
    _ensure_loaded()
    if _LIB is None:
        raise NotImplementedError("zstd: system libzstd not present")
    lib = _LIB
    bound = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    src = ctypes.create_string_buffer(data, len(data)) if data else ctypes.create_string_buffer(1)
    ret = lib.ZSTD_compress(
        ctypes.cast(out, c_void_p), bound, ctypes.cast(src, c_void_p), len(data), level
    )
    if lib.ZSTD_isError(ret):
        raise ValueError("zstd: encode failed")
    return out.raw[:ret]
