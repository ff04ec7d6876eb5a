"""Brotli (RFC 7932) via a ctypes binding to the SYSTEM libbrotli —
closing the last big crawl-ingest codec boundary (``Content-Encoding:
br`` is a CDN default on the modern web, so a meaningful slice of any
2020s crawl carries brotli bodies).

Why a binding and not a pure-Python decoder: RFC 7932 decoding REQUIRES
the 122,784-byte static dictionary (Appendix A) — typical CDN output
references it constantly — and shipping that blob as source is worse
engineering than binding the canonical public implementation
(google/brotli, MIT-licensed, packaged as ``libbrotlidec``/
``libbrotlienc`` on every mainstream distro). No Python package is
needed: ``ctypes.util.find_library`` resolves the shared objects at
runtime. When the library is absent, :func:`available` is False and
callers keep the honest flagged-row contract (``http_decode_error``,
NULL ``body_text``) exactly as before — the boundary degrades, never
errors.

Scale/safety posture (the bytes are attacker-controlled crawl input):

* streaming decode in 64 KiB output hops with a hard ``max_output``
  cap (default 64 MiB) — one hostile decompression bomb cannot OOM an
  executor; over-cap raises ``ValueError`` which the decode pass turns
  into a flagged row, never a task kill;
* truncated input, corrupt streams, and trailing garbage each raise
  ``ValueError`` with a distinct message (mirrors ``_gunzip_strict``'s
  strictness — a prefix must never silently pass as the full body);
* the library handle loads lazily ONCE per Python worker process and
  is shared across rows (the zlib cost model: a C call per row inside
  the existing Arrow ``mapInPandas`` crossing).

:func:`compress` (one-shot ``BrotliEncoderCompress``) exists for
fixture generation, round-trip fuzz, and symmetric sink support — the
same encoder-feeds-decoder-tests pattern as ``analytics/jpeg.py``.

Reference parity: the reference engine stores opaque byte[] values
(``db/ColumnFamily.java``) — content decode was always client-side
there; this extends the engine for the LLM-pipeline mandate.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from ctypes import POINTER, byref, c_int, c_size_t, c_ubyte, c_void_p

# BrotliDecoderResult (decode.h)
_DEC_ERROR, _DEC_SUCCESS, _DEC_NEEDS_IN, _DEC_NEEDS_OUT = 0, 1, 2, 3

_DEC_LIB = None
_ENC_LIB = None
_LOADED = False


def _load_lib(stem: str):
    """dlopen one brotli shared object; None when absent/unloadable."""
    path = ctypes.util.find_library(stem)
    if not path:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


def _ensure_loaded() -> None:
    global _DEC_LIB, _ENC_LIB, _LOADED
    if _LOADED:
        return
    _LOADED = True
    dec = _load_lib("brotlidec")
    if dec is not None:
        try:
            dec.BrotliDecoderCreateInstance.restype = c_void_p
            dec.BrotliDecoderCreateInstance.argtypes = [c_void_p, c_void_p, c_void_p]
            dec.BrotliDecoderDestroyInstance.restype = None
            dec.BrotliDecoderDestroyInstance.argtypes = [c_void_p]
            dec.BrotliDecoderDecompressStream.restype = c_int
            dec.BrotliDecoderDecompressStream.argtypes = [
                c_void_p,
                POINTER(c_size_t),
                POINTER(POINTER(c_ubyte)),
                POINTER(c_size_t),
                POINTER(POINTER(c_ubyte)),
                POINTER(c_size_t),
            ]
        except AttributeError:
            dec = None
    _DEC_LIB = dec
    enc = _load_lib("brotlienc")
    if enc is not None:
        try:
            enc.BrotliEncoderMaxCompressedSize.restype = c_size_t
            enc.BrotliEncoderMaxCompressedSize.argtypes = [c_size_t]
            enc.BrotliEncoderCompress.restype = c_int
            enc.BrotliEncoderCompress.argtypes = [
                c_int,
                c_int,
                c_int,
                c_size_t,
                POINTER(c_ubyte),
                POINTER(c_size_t),
                POINTER(c_ubyte),
            ]
        except AttributeError:
            enc = None
    _ENC_LIB = enc


def available() -> bool:
    """True when the system ``libbrotlidec`` is loadable (decode side —
    the one the crawl pipeline needs)."""
    _ensure_loaded()
    return _DEC_LIB is not None


def encoder_available() -> bool:
    """True when ``libbrotlienc`` is loadable (fixtures/round-trips)."""
    _ensure_loaded()
    return _ENC_LIB is not None


def decompress(data: bytes, max_output: int = 64 * 1024 * 1024) -> bytes:
    """Streaming-strict brotli decode of one complete stream.

    Raises ``ValueError`` on corrupt bytes, truncated input, trailing
    garbage after the stream, or decoded output past ``max_output``
    (decompression-bomb guard); ``NotImplementedError`` when the system
    library is absent — callers that already speak the flagged-row
    contract catch both."""
    _ensure_loaded()
    if _DEC_LIB is None:
        raise NotImplementedError(
            "brotli: system libbrotlidec not present; rows keep "
            "http_encoding='br' and NULL body_text"
        )
    lib = _DEC_LIB
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise ValueError("brotli: decoder instance allocation failed")
    try:
        in_buf = (c_ubyte * len(data)).from_buffer_copy(data) if data else (c_ubyte * 1)()
        next_in = ctypes.cast(in_buf, POINTER(c_ubyte))
        avail_in = c_size_t(len(data))
        chunks: list[bytes] = []
        total = 0
        hop = 64 * 1024
        out_buf = (c_ubyte * hop)()
        while True:
            next_out = ctypes.cast(out_buf, POINTER(c_ubyte))
            avail_out = c_size_t(hop)
            res = lib.BrotliDecoderDecompressStream(
                state, byref(avail_in), byref(next_in), byref(avail_out), byref(next_out), None
            )
            produced = hop - avail_out.value
            if produced:
                chunks.append(bytes(out_buf[:produced]))
                total += produced
                if total > max_output:
                    raise ValueError(
                        f"brotli: decoded output exceeds max_output={max_output}"
                    )
            if res == _DEC_SUCCESS:
                if avail_in.value != 0:
                    raise ValueError("brotli: trailing garbage after stream")
                return b"".join(chunks)
            if res == _DEC_NEEDS_OUT:
                continue
            if res == _DEC_NEEDS_IN:
                raise ValueError("brotli: truncated stream")
            raise ValueError("brotli: corrupt stream")
    finally:
        lib.BrotliDecoderDestroyInstance(state)


def compress(data: bytes, quality: int = 5, lgwin: int = 22) -> bytes:
    """One-shot brotli encode (``BrotliEncoderCompress``, generic mode).
    Fixture/round-trip aid and symmetric sink support; raises
    ``NotImplementedError`` without the system ``libbrotlienc``."""
    _ensure_loaded()
    if _ENC_LIB is None:
        raise NotImplementedError("brotli: system libbrotlienc not present")
    if not 0 <= quality <= 11:
        raise ValueError("brotli: quality must be 0..11")
    lib = _ENC_LIB
    bound = lib.BrotliEncoderMaxCompressedSize(len(data))
    if bound == 0:  # header-room fallback for degenerate inputs
        bound = len(data) + 1024
    in_buf = (c_ubyte * len(data)).from_buffer_copy(data) if data else (c_ubyte * 1)()
    out_buf = (c_ubyte * bound)()
    out_len = c_size_t(bound)
    ok = lib.BrotliEncoderCompress(
        quality,
        lgwin,
        0,  # BROTLI_MODE_GENERIC
        len(data),
        ctypes.cast(in_buf, POINTER(c_ubyte)),
        byref(out_len),
        ctypes.cast(out_buf, POINTER(c_ubyte)),
    )
    if not ok:
        raise ValueError("brotli: encode failed")
    return bytes(out_buf[: out_len.value])
