"""Zstandard ctypes binding (sources/zstd.py) — round-trips, the
RFC 8878 one-or-more-frames content coding, hostile-input strictness,
the absent-library contract, and decode_http_bodies wiring."""

import os
import random

import pytest

from apache_cassandra_spark.sources import warc
from apache_cassandra_spark.sources import zstd as zs

needs_zstd = pytest.mark.skipif(not zs.available(), reason="system libzstd not present")


@needs_zstd
def test_roundtrip_levels_and_shapes():
    rnd = random.Random(88)
    cases = [
        b"",
        b"y",
        b"zstd data " * 8192,
        os.urandom(150_000),
        bytes(rnd.randrange(256) for _ in range(57)) * 777,
    ]
    for data in cases:
        for level in (1, 3, 19):
            assert zs.decompress(zs.compress(data, level=level)) == data, (len(data), level)


@needs_zstd
def test_multi_frame_content_coding():
    """RFC 8878 §4.1: a zstd content coding is one OR MORE concatenated
    frames — the decoder continues across frame boundaries."""
    parts = [b"alpha ", b"beta ", b"gamma"]
    blob = b"".join(zs.compress(p) for p in parts)
    assert zs.decompress(blob) == b"alpha beta gamma"


@needs_zstd
def test_hostile_inputs_raise_valueerror():
    good = zs.compress(b"payload " * 2000)
    with pytest.raises(ValueError, match="truncated"):
        zs.decompress(good[:-4])
    with pytest.raises(ValueError, match="corrupt"):
        zs.decompress(b"\x28\xb5\x2f\xfdnot-a-real-frame")
    with pytest.raises(ValueError, match="corrupt|truncated"):
        zs.decompress(good + b"JUNK")
    with pytest.raises(ValueError, match="corrupt|truncated"):
        zs.decompress(b"\xff" * 64)


@needs_zstd
def test_decompression_bomb_cap():
    bomb = zs.compress(b"\x00" * (8 << 20), level=9)
    assert len(bomb) < 64 * 1024
    with pytest.raises(ValueError, match="max_output"):
        zs.decompress(bomb, max_output=1 << 20)
    assert len(zs.decompress(bomb)) == 8 << 20


def test_absent_library_contract(monkeypatch):
    monkeypatch.setattr(zs, "_LOADED", True)
    monkeypatch.setattr(zs, "_LIB", None)
    assert zs.available() is False
    with pytest.raises(NotImplementedError, match="libzstd"):
        zs.decompress(b"\x28")
    with pytest.raises(NotImplementedError, match="libzstd"):
        zs.compress(b"x")


@needs_zstd
def test_inflate_body_zstd_content_and_transfer_codings():
    plain = b"<p>zstd both ways</p>"
    c = zs.compress(plain)
    assert warc._inflate_body(c, "zstd", "") == (plain, None)
    assert warc._inflate_body(c, "", "zstd") == (plain, None)
    chunked = (
        b"10\r\n" + c[:16] + b"\r\n"
        + f"{len(c) - 16:x}".encode() + b"\r\n" + c[16:] + b"\r\n0\r\n\r\n"
    )
    assert warc._inflate_body(chunked, "", "zstd, chunked") == (plain, None)


def test_inflate_body_zstd_without_library_flags(monkeypatch):
    monkeypatch.setattr(zs, "_LOADED", True)
    monkeypatch.setattr(zs, "_LIB", None)
    data = b"\x28\xb5\x2f\xfdwhatever"
    out, err = warc._inflate_body(data, "zstd", "")
    assert out == data and "unsupported Content-Encoding: zstd" in err
    out, err = warc._inflate_body(data, "", "zstd")
    assert out == data and "unsupported Transfer-Encoding: zstd" in err


@needs_zstd
def test_decode_http_bodies_zstd_end_to_end(spark, tmp_path):
    from tests.test_warc_binary import _http_enc, _record

    recs = _record(
        _http_enc(zs.compress("<p>zstd page</p>".encode()), b"Content-Encoding: zstd\r\n"),
        uri=b"http://e.com/z1",
    ) + _record(
        _http_enc(b"\x28\xb5\x2f\xfdbroken", b"Content-Encoding: zstd\r\n"),
        uri=b"http://e.com/z-corrupt",
    )
    p = tmp_path / "z.warc"
    p.write_bytes(recs)
    parts = warc.http_response_parts(warc.read_warc(spark, str(p)))
    got = {r["target_uri"]: r for r in warc.decode_http_bodies(parts).collect()}
    ok = got["http://e.com/z1"]
    assert ok["http_decode_error"] is None and ok["body_text"] == "<p>zstd page</p>"
    bad = got["http://e.com/z-corrupt"]
    assert bad["http_decode_error"] is not None and bad["body_text"] is None
    assert bad["http_encoding"] == "zstd"
