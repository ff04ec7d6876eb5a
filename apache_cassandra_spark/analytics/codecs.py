"""Real media codecs for the multimodal column pipeline — pure
numpy/stdlib, no external decode libraries.

Formats with a genuinely parsed decode path:

* **netpbm P6/P5** (binary PPM/PGM) — header + raw pixel planes
* **BMP** (uncompressed 24-bit BI_RGB, bottom-up) — struct header + padded rows
* **WAV** (PCM16 RIFF) — stdlib ``wave`` reader

Compressed codecs (JPEG/PNG/MP3/H.264) still raise
``NotImplementedError`` — those need PIL/ffmpeg, which this container
doesn't ship; the dispatch keeps an honest boundary between the real and
unavailable paths instead of faking them.

The decode functions are plain ``bytes -> dict`` so they are trivially
testable and are applied inside Arrow-batched ``mapInPandas`` (see
``analytics.multimodal.decode_media``) — one Python crossing per batch,
payload bytes never round-trip through the driver.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

#: unified decode record; absent fields are None
DECODE_FIELDS = (
    "format",
    "width",
    "height",
    "channels",
    "sample_rate",
    "n_frames",
    "mean_r",
    "mean_g",
    "mean_b",
    "rms",
)


def sniff(payload: bytes) -> str:
    """Container sniff by magic bytes (the reference stores opaque column
    values; format discovery is the decoder's job, not the schema's)."""
    if not payload:
        return "empty"
    if payload[:2] in (b"P6", b"P5"):
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def _ppm_header(payload: bytes) -> tuple[str, int, int, int, int]:
    """Parse the netpbm header: magic, whitespace/comment-separated width,
    height, maxval; returns (magic, width, height, maxval, data_offset)."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comment lines
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    return payload[:2].decode("ascii"), fields[0], fields[1], fields[2], pos


def decode_ppm(payload: bytes) -> dict:
    """Decode binary netpbm: P6 (RGB) or P5 (grayscale), maxval <= 255."""
    magic, w, h, maxval, off = _ppm_header(payload)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if magic == "P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
    px = px.reshape(h, w, ch).astype(np.float64)
    means = px.mean(axis=(0, 1))
    return {
        "format": "ppm",
        "width": w,
        "height": h,
        "channels": ch,
        "mean_r": float(means[0]),
        "mean_g": float(means[1] if ch == 3 else means[0]),
        "mean_b": float(means[2] if ch == 3 else means[0]),
    }


def decode_bmp(payload: bytes) -> dict:
    """Decode uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER, bottom-up
    rows padded to 4 bytes, BGR order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", payload, 14)[:3]
    w_abs = abs(w)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    h_abs = abs(int(np.int32(h)))
    stride = (w_abs * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h_abs, offset=data_off)
    rows = rows.reshape(h_abs, stride)[:, : w_abs * 3].reshape(h_abs, w_abs, 3)
    bgr = rows[::-1] if int(np.int32(h)) > 0 else rows  # bottom-up unless height negative
    means = bgr.astype(np.float64).mean(axis=(0, 1))
    return {
        "format": "bmp",
        "width": w_abs,
        "height": h_abs,
        "channels": 3,
        "mean_r": float(means[2]),
        "mean_g": float(means[1]),
        "mean_b": float(means[0]),
    }


def decode_wav(payload: bytes) -> dict:
    """Decode PCM WAV via the stdlib reader; RMS over PCM16 samples."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        ch = wf.getnchannels()
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        frames = wf.readframes(n)
    if width != 2:
        raise NotImplementedError(f"only PCM16 supported (sampwidth={width})")
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
    rms = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
    return {
        "format": "wav",
        "channels": ch,
        "sample_rate": rate,
        "n_frames": n,
        "rms": rms,
    }


_DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "wav": decode_wav}


def decode_bytes(payload: bytes) -> dict:
    """Sniff + decode one payload into the unified DECODE_FIELDS record.

    Real parse for ppm/bmp/wav; compressed formats raise
    ``NotImplementedError`` (install PIL/ffmpeg and register a decoder in
    ``_DECODERS`` to extend — the Spark plumbing is format-agnostic)."""
    fmt = sniff(payload)
    dec = _DECODERS.get(fmt)
    if dec is None:
        raise NotImplementedError(f"no codec for format {fmt!r}")
    out = {k: None for k in DECODE_FIELDS}
    out.update(dec(payload))
    return out


# ---------------------------------------------------------------------------
# encoders (fixture generation + tests; also real, also stdlib-only)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """P6 with a constant fill — matches the Spark-side JVM generator in
    ``multimodal.synthetic_ppm_payload`` byte for byte."""
    return (f"P6\n{width} {height}\n255\n").encode("ascii") + bytes(rgb) * (width * height)


def encode_wav_constant(n_frames: int, amplitude: int, rate: int = 8000) -> bytes:
    """Mono PCM16 WAV, every sample == ``amplitude`` — matches
    ``multimodal.synthetic_wav_payload``."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{n_frames}h", *([amplitude] * n_frames)))
    return buf.getvalue()
