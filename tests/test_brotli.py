"""Brotli ctypes binding (sources/brotli.py) — round-trips across
qualities/sizes, strictness on hostile input (truncation, corruption,
trailing garbage, decompression bombs), the absent-library fallback
contract, and the Transfer-/Content-Encoding wiring through
decode_http_bodies."""

import os
import random

import pytest

from apache_cassandra_spark.sources import brotli as br
from apache_cassandra_spark.sources import warc

needs_brotli = pytest.mark.skipif(
    not (br.available() and br.encoder_available()),
    reason="system libbrotli not present",
)


@needs_brotli
def test_roundtrip_qualities_and_shapes():
    rnd = random.Random(7)
    cases = [
        b"",
        b"x",
        b"hello world " * 4096,
        os.urandom(100_000),
        bytes(rnd.randrange(256) for _ in range(33)) * 999,
        # static-dictionary territory: real-ish HTML at q11
        ("<html><head><title>t</title></head><body>"
         "<p>The quick brown fox jumps over the lazy dog.</p>"
         "</body></html>").encode() * 64,
    ]
    for data in cases:
        for q in (0, 5, 11):
            assert br.decompress(br.compress(data, quality=q)) == data, (len(data), q)


@needs_brotli
def test_hostile_inputs_raise_valueerror_never_pass():
    good = br.compress(b"payload " * 1000, quality=5)
    with pytest.raises(ValueError, match="truncated"):
        br.decompress(good[:-4])
    with pytest.raises(ValueError, match="trailing garbage"):
        br.decompress(good + b"JUNK")
    # arbitrary garbage is rejected either way: an impossible prefix is
    # "corrupt", a syntactically-open one is "truncated" — never output
    with pytest.raises(ValueError, match="corrupt|truncated"):
        br.decompress(b"\x8b\x02\x80not-a-brotli-stream")
    with pytest.raises(ValueError, match="corrupt"):
        br.decompress(b"\xff" * 64)
    # flipping a mid-stream byte must not yield silently-wrong output
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0xFF
    try:
        out = br.decompress(bytes(bad))
        assert out != b"payload " * 1000
    except ValueError:
        pass


@needs_brotli
def test_decompression_bomb_cap():
    bomb = br.compress(b"\x00" * (8 << 20), quality=9)
    assert len(bomb) < 64 * 1024  # it IS a bomb
    with pytest.raises(ValueError, match="max_output"):
        br.decompress(bomb, max_output=1 << 20)
    assert len(br.decompress(bomb)) == 8 << 20  # default cap admits it


@needs_brotli
def test_quality_bounds_rejected():
    with pytest.raises(ValueError):
        br.compress(b"x", quality=12)
    with pytest.raises(ValueError):
        br.compress(b"x", quality=-1)


def test_absent_library_contract(monkeypatch):
    """Without libbrotlidec the module reports unavailable and decode
    raises the typed NotImplementedError — the flagged-row contract's
    trigger (pre-r13 behavior, still the truth on bare containers)."""
    monkeypatch.setattr(br, "_LOADED", True)
    monkeypatch.setattr(br, "_DEC_LIB", None)
    monkeypatch.setattr(br, "_ENC_LIB", None)
    assert br.available() is False and br.encoder_available() is False
    with pytest.raises(NotImplementedError, match="libbrotlidec"):
        br.decompress(b"\x1b")
    with pytest.raises(NotImplementedError, match="libbrotlienc"):
        br.compress(b"x")


@needs_brotli
def test_inflate_body_br_content_and_transfer_codings():
    plain = b"<p>brotli both ways</p>"
    c = br.compress(plain, quality=5)
    out, err = warc._inflate_body(c, "br", "")
    assert (out, err) == (plain, None)
    out, err = warc._inflate_body(c, "", "br")
    assert (out, err) == (plain, None)
    # br under chunked framing: undo chunked first, then br
    chunked = b"10\r\n" + c[:16] + b"\r\n" + f"{len(c) - 16:x}".encode() + b"\r\n" + c[16:] + b"\r\n0\r\n\r\n"
    out, err = warc._inflate_body(chunked, "", "br, chunked")
    assert (out, err) == (plain, None)


def test_inflate_body_br_without_library_flags(monkeypatch):
    monkeypatch.setattr(br, "_LOADED", True)
    monkeypatch.setattr(br, "_DEC_LIB", None)
    data = b"\x1b\x00\x00whatever"
    out, err = warc._inflate_body(data, "br", "")
    assert out == data and "unsupported Content-Encoding: br" in err
    out, err = warc._inflate_body(data, "", "br")
    assert out == data and "unsupported Transfer-Encoding: br" in err


@needs_brotli
def test_decode_http_bodies_brotli_end_to_end(spark, tmp_path):
    """A br-encoded HTML response decodes through the Arrow pass:
    cleared encoding label, recomputed body_text, charset applied
    POST-inflate (cp1251 under br)."""
    from tests.test_warc_binary import _http_enc, _record

    ru = "привет из brotli"
    recs = (
        _record(
            _http_enc(br.compress("<p>brotli page</p>".encode(), quality=5),
                      b"Content-Encoding: br\r\n"),
            uri=b"http://e.com/br1",
        )
        + _record(
            _http_enc(
                br.compress(ru.encode("cp1251"), quality=5),
                b"Content-Encoding: br\r\n",
                ctype=b"text/html; charset=windows-1251",
            ),
            uri=b"http://e.com/br-ru",
        )
    )
    p = tmp_path / "br.warc"
    p.write_bytes(recs)
    parts = warc.http_response_parts(warc.read_warc(spark, str(p)))
    got = {r["target_uri"]: r for r in warc.decode_http_bodies(parts).collect()}
    one = got["http://e.com/br1"]
    assert one["http_decode_error"] is None and one["http_encoding"] == ""
    assert one["body_text"] == "<p>brotli page</p>"
    assert got["http://e.com/br-ru"]["body_text"] == ru
