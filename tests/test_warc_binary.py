"""Binary WARC (`response`) ingest — Content-Length framing walk,
gzip members, corruption resync, HTTP envelope split, and the
WARC->corpus bridge. Fixture files are built byte-by-byte so every
framing claim is pinned against literal bytes, not the writer."""

import gzip

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.sources import warc


def _record(payload: bytes, rtype=b"response", uri=b"http://e.com/a",
            date=b"2013-01-01T00:00:00Z", clen=None, sep=b"\r\n\r\n"):
    clen = len(payload) if clen is None else clen
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:0001>\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: " + date + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(clen).encode() + b"\r\n"
        b"\r\n" + payload + sep
    )


def _http(body: bytes, status=b"200 OK", ctype=b"text/html; charset=utf-8"):
    return (
        b"HTTP/1.1 " + status + b"\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body
    )


def test_walk_exact_framing_with_embedded_magic():
    """The case the WET text split CANNOT handle: a payload containing
    the record magic. Content-Length walking must keep it whole."""
    evil = b"binary \x00\x01 then WARC/1.0\r\n inside payload \xff\xfe"
    data = _record(evil) + _record(b"second", uri=b"http://e.com/b")
    recs = list(warc.walk_warc_records([data]))
    assert len(recs) == 2
    assert recs[0][3] == evil and recs[0][4] is True and recs[0][5] is None
    assert recs[1][3] == b"second" and recs[1][4] is True


def test_walk_offsets_and_chunk_boundaries():
    """Record offsets are absolute; a 1-byte chunk stream (worst-case
    block boundaries) walks identically to one big chunk."""
    data = _record(b"alpha") + _record(b"beta", uri=b"http://e.com/b")
    whole = list(warc.walk_warc_records([data]))
    tiny = list(warc.walk_warc_records([bytes([b]) for b in data]))
    assert whole == tiny
    assert whole[0][1] == 0
    assert whole[1][1] == data.index(b"WARC/", 5)


def test_walk_truncated_payload_flags_and_stops():
    data = _record(b"full payload bytes", clen=100)[: -4]  # declared 100, short
    recs = list(warc.walk_warc_records([data]))
    assert len(recs) == 1
    assert recs[0][4] is False and recs[0][5] == "truncated_payload"


def test_walk_bad_length_then_resync():
    """A record whose declared length overruns into the next record's
    region flags missing_separator, and the walk resyncs to the NEXT
    magic — one bad record must not eat the shard."""
    good = _record(b"good tail", uri=b"http://e.com/c")
    bad = _record(b"0123456789", clen=7)  # separator check lands mid-payload
    recs = list(warc.walk_warc_records([bad + good]))
    errs = [r[5] for r in recs]
    assert "missing_separator" in errs
    assert any(r[3] == b"good tail" and r[4] for r in recs)


def test_walk_garbage_prefix_resync():
    data = b"NOT A WARC FILE\r\njunk" + b"\r\n" + _record(b"ok")
    recs = list(warc.walk_warc_records([data]))
    assert recs[0][5].startswith("garbage_before_record")
    assert recs[-1][3] == b"ok" and recs[-1][4] is True


def test_walk_missing_content_length_resync():
    block = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    data = block + _record(b"fine")
    recs = list(warc.walk_warc_records([data]))
    assert recs[0][5] == "missing_content_length"
    assert recs[-1][3] == b"fine" and recs[-1][4] is True


def test_gzip_member_per_record_stream():
    """Common Crawl .warc.gz = one gzip member per record; the chunked
    member decompressor must walk across member boundaries."""
    data = gzip.compress(_record(b"one")) + gzip.compress(_record(b"two", uri=b"http://e.com/b"))
    out = b"".join(warc._gzip_members([data[i:i + 7] for i in range(0, len(data), 7)]))
    assert out == _record(b"one") + _record(b"two", uri=b"http://e.com/b")


def test_read_warc_end_to_end(spark, tmp_path):
    body = "<html><body>héllo wörld</body></html>".encode("utf-8")
    payload = _http(body)
    raw = _record(payload) + _record(_http(b"plain", ctype=b"text/plain"), uri=b"http://e.com/t")
    p = tmp_path / "shard-000.warc"
    p.write_bytes(raw)
    gz = tmp_path / "shard-001.warc.gz"
    gz.write_bytes(gzip.compress(_record(_http(b"<p>gz</p>"), uri=b"http://e.com/gz")))

    df = warc.read_warc(spark, str(tmp_path) + "/*", record_types=("response",))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert set(rows) == {"http://e.com/a", "http://e.com/t", "http://e.com/gz"}
    assert all(r["framing_ok"] for r in rows.values())
    assert bytes(rows["http://e.com/a"]["payload"]) == payload
    assert rows["http://e.com/a"]["content_length"] == len(payload)
    assert rows["http://e.com/a"]["record_id"] == "<urn:uuid:0001>"

    parts = warc.http_response_parts(df)
    prow = {r["target_uri"]: r for r in parts.collect()}
    assert prow["http://e.com/a"]["http_status"] == 200
    assert prow["http://e.com/a"]["http_content_type"] == "text/html"
    assert prow["http://e.com/a"]["http_charset"] == "utf-8"
    assert bytes(prow["http://e.com/a"]["body"]) == body
    assert prow["http://e.com/a"]["body_text"] == "<html><body>héllo wörld</body></html>"
    assert prow["http://e.com/t"]["http_content_type"] == "text/plain"

    pages = warc.responses_to_pages(df).collect()
    assert {r["url"] for r in pages} == {"http://e.com/a", "http://e.com/gz"}  # html only


def test_http_parts_latin1_and_headerless(spark, tmp_path):
    latin_body = "caf\u00e9".encode("iso-8859-1")
    raw = (
        _record(_http(latin_body, ctype=b"text/html; charset=iso-8859-1"))
        + _record(b"\x89PNG not http", uri=b"http://e.com/png")
    )
    p = tmp_path / "s.warc"
    p.write_bytes(raw)
    df = warc.http_response_parts(warc.read_warc(spark, str(p)))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert rows["http://e.com/a"]["body_text"] == "café"
    assert bytes(rows["http://e.com/a"]["body"]) == latin_body
    # non-HTTP payload: NULL status, whole payload preserved as body
    assert rows["http://e.com/png"]["http_status"] is None
    assert bytes(rows["http://e.com/png"]["body"]) == b"\x89PNG not http"


def test_write_warc_roundtrip_and_wet_parity(spark, tmp_path):
    """write_warc -> read_warc -> responses_to_pages recovers the corpus
    exactly; and the header fields agree with the WET reader's parse of
    the equivalent WET export (shared expressions — no drift)."""
    docs = spark.createDataFrame(
        [(1, "http://a.com/1", "<p>alpha &amp; beta</p>"), (2, "http://a.com/2", "<p>två</p>")],
        "doc_id long, url string, html string",
    )
    out = str(tmp_path / "warc_out")
    warc.write_warc(docs, out)
    back = warc.responses_to_pages(warc.read_warc(spark, out)).collect()
    assert {(r["url"], r["html"]) for r in back} == {
        ("http://a.com/1", "<p>alpha &amp; beta</p>"),
        ("http://a.com/2", "<p>två</p>"),
    }
    wet_out = str(tmp_path / "wet_out")
    warc.write_wet(docs.withColumnRenamed("html", "text"), wet_out)
    wet = {r["target_uri"]: r for r in warc.read_wet(spark, wet_out).collect()}
    wrc = {r["target_uri"]: r for r in warc.read_warc(spark, out).collect()}
    assert set(wet) == set(wrc)
    for uri in wet:
        assert wet[uri]["warc_date"] == wrc[uri]["warc_date"]


def test_read_warc_scheme_boundary():
    with pytest.raises(NotImplementedError):
        list(warc._file_chunks("s3a://bucket/shard.warc"))


def test_read_warc_stream_matches_batch(spark, tmp_path):
    """The streaming binary reader shares the walk and the header parse
    with the batch reader; maxFilesPerTrigger=1 proves per-shard
    incremental ingest (one .warc and one .warc.gz shard)."""
    src = tmp_path / "warc_src"
    src.mkdir()
    (src / "s0.warc").write_bytes(
        _record(_http(b"<p>a0</p>")) + _record(_http(b"<p>a1</p>"), uri=b"http://e.com/a1")
    )
    (src / "s1.warc.gz").write_bytes(
        gzip.compress(_record(_http(b"<p>b0</p>"), uri=b"http://e.com/b0"))
    )
    key = lambda r: (r["target_uri"], bytes(r["payload"]), r["framing_ok"])  # noqa: E731
    batch = {key(r) for r in warc.read_warc(spark, str(src) + "/*").collect()}
    q = (
        warc.read_warc_stream(spark, str(src) + "/*", max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {key(r) for r in spark.sql("select * from warc_stream_t").collect()}
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert got == batch and len(got) == 3
    assert n_batches >= 2  # one shard per trigger


def test_http_parts_lf_only_header_block(spark, tmp_path):
    """Real servers emit LF-only header blocks; the HTTP split must
    still find the envelope (the WARC record grammar stays strict CRLF
    — only the CAPTURED response is lenient)."""
    payload = b"HTTP/1.1 404 Not Found\nContent-Type: text/plain\n\nmissing page"
    p = tmp_path / "lf.warc"
    p.write_bytes(_record(payload, uri=b"http://e.com/lf"))
    r = warc.http_response_parts(warc.read_warc(spark, str(p))).collect()[0]
    assert r["framing_ok"] is True
    assert r["http_status"] == 404
    assert r["http_content_type"] == "text/plain"
    assert bytes(r["body"]) == b"missing page"


def test_gzip_bitrot_yields_stream_error_row_not_exception():
    """One corrupt byte mid-member must terminate the shard's walk with
    a flagged stream_error row — never a task-killing zlib exception."""
    good = _record(b"before rot", uri=b"http://e.com/ok")
    gz = bytearray(gzip.compress(good) + gzip.compress(_record(b"after rot")))
    gz[len(gz) // 2] ^= 0xFF  # flip a byte in the second member
    recs = list(warc.walk_warc_records(warc._gzip_members([bytes(gz)])))
    assert any(r[3] == b"before rot" and r[4] for r in recs)
    assert recs[-1][5].startswith("stream_error:")
    assert recs[-1][4] is False


def test_malformed_header_block_does_not_donate_content_length(tmp_path):
    """A junk region whose bytes run into the NEXT record's real headers
    must not let that record's Content-Length be claimed by the junk —
    the header-shape validation flags it and the next record survives."""
    junk = b"WARC/1.0\r\nnot a header line at all \x00\x01\r\nstill junk\r\n"
    good = _record(b"survivor", uri=b"http://e.com/s")
    recs = list(warc.walk_warc_records([junk + good]))
    assert any(r[5] == "malformed_headers" for r in recs)
    assert any(r[3] == b"survivor" and r[4] for r in recs)


def test_warc_to_wet_regenerates_text_sidecar(spark, tmp_path):
    """The Common Crawl conversion, composed: raw response shards in,
    WET conversion records out — capture dates preserved, non-HTML and
    non-200 records dropped, markup rendered to text."""
    raw = (
        _record(_http("<p>alpha &amp; beta</p>".encode()), uri=b"http://e.com/a",
                date=b"2014-05-05T05:05:05Z")
        + _record(_http(b"plain", ctype=b"text/plain"), uri=b"http://e.com/txt")
        + _record(_http(b"<p>gone</p>", status=b"404 Not Found"), uri=b"http://e.com/404")
    )
    (tmp_path / "in.warc").write_bytes(raw)
    out = str(tmp_path / "wet_out")
    warc.warc_to_wet(spark, str(tmp_path / "in.warc"), out)
    rows = warc.read_wet(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["target_uri"] == "http://e.com/a"
    assert r["warc_date"] == "2014-05-05T05:05:05Z"  # capture date kept
    assert r["text"] == "alpha & beta"
    assert r["framing_ok"] is True


def test_warc_to_wet_main_content_only(spark, tmp_path):
    page = (
        '<div><a href="/">Home</a> <a href="/a">About</a></div>'
        "<p>The body paragraph with comfortably more than eight words inside it today.</p>"
    )
    (tmp_path / "in.warc").write_bytes(_record(_http(page.encode()), uri=b"http://e.com/m"))
    out = str(tmp_path / "wet_main")
    warc.warc_to_wet(spark, str(tmp_path / "in.warc"), out, main_content_only=True)
    r = warc.read_wet(spark, out).collect()[0]
    assert r["text"].startswith("The body paragraph") and "Home" not in r["text"]


def test_single_byte_charset_decodes(spark, tmp_path):
    """cp1251 (the Cyrillic web), koi8-r, and cp1252's high half decode
    exactly; an UNDEFINED cp1252 byte becomes U+FFFD, never an error."""
    cases = [
        (b"http://e.com/ru", b"text/html; charset=windows-1251",
         "Привет мир".encode("cp1251"), "Привет мир"),
        (b"http://e.com/koi", b"text/plain; charset=koi8-r",
         "мир".encode("koi8_r"), "мир"),
        (b"http://e.com/cp1252", b"text/html; charset=windows-1252",
         b"\x93quoted\x94 \x97 dash", "“quoted” — dash"),
        (b"http://e.com/undef", b"text/html; charset=windows-1252",
         b"bad\x81byte", "bad�byte"),
        (b"http://e.com/utf8", b"text/html; charset=utf-8",
         "ütf-8 ✓".encode("utf-8"), "ütf-8 ✓"),
    ]
    raw = b"".join(_record(_http(body, ctype=ct), uri=u) for u, ct, body, _ in cases)
    p = tmp_path / "cs.warc"
    p.write_bytes(raw)
    rows = {
        r["target_uri"]: r
        for r in warc.http_response_parts(warc.read_warc(spark, str(p))).collect()
    }
    for u, _, body, want in cases:
        r = rows[u.decode()]
        assert bytes(r["body"]) == body  # bytes always exact
        assert r["body_text"] == want


def test_declared_latin1_reads_as_cp1252_whatwg(spark, tmp_path):
    """WHATWG aliases latin-1 labels to windows-1252: declared-latin-1
    smart quotes must decode as cp1252 punctuation, not C1 controls."""
    body = b"\x93hi\x94 caf\xe9"
    p = tmp_path / "l1.warc"
    p.write_bytes(_record(_http(body, ctype=b"text/html; charset=iso-8859-1")))
    r = warc.http_response_parts(warc.read_warc(spark, str(p))).collect()[0]
    assert r["body_text"] == "“hi” café"
    assert bytes(r["body"]) == body


# --- transport layer: URI schemes, percent-decoding, pyarrow.fs ---------


def test_local_file_path_forms():
    """binaryFile emits RAW paths (spaces and % literal — verified on
    Spark 4.1); user URIs may be percent-encoded. Raw must win when it
    exists; the unquoted form is only a fallback; remote file authority
    raises typed instead of being read as a relative path."""
    import os
    import tempfile

    from apache_cassandra_spark.sources.warc import _local_file_path

    with tempfile.TemporaryDirectory() as d:
        raw = os.path.join(d, "a b%x.warc")
        open(raw, "wb").write(b"")
        # raw-path URI (the Spark 4.1 binaryFile shape)
        assert _local_file_path("file:" + raw) == raw
        # file:///-style with encoded space resolves via the fallback
        enc = "file://" + d.replace(" ", "%20") + "/a%20b%25x.warc"
        assert _local_file_path(enc) == raw
        # literal-% name must NOT be mangled by blind unquoting
        lit = os.path.join(d, "q%20z.warc")
        open(lit, "wb").write(b"")
        assert _local_file_path("file:" + lit) == lit
    assert _local_file_path("/plain/path.warc") == "/plain/path.warc"
    with pytest.raises(NotImplementedError):
        _local_file_path("file://nfs-host/share/x.warc")


def test_file_chunks_unknown_scheme_raises_typed():
    from apache_cassandra_spark.sources.warc import _file_chunks

    with pytest.raises(NotImplementedError):
        _file_chunks("bogus-scheme://bucket/shard.warc")


def test_walker_through_pyarrow_fs_transport(monkeypatch, tmp_path):
    """The object-store transport: route a real shard through
    _pafs_chunks (pyarrow LocalFileSystem standing in for S3/GCS/HDFS —
    from_uri is monkeypatched to resolve a fake scheme, everything
    downstream is the production code path) and assert the walk is
    byte-identical to the POSIX transport, gzip members included."""
    import pyarrow.fs as pafs

    from apache_cassandra_spark.sources.warc import (
        _file_chunks,
        _pafs_chunks,
        walk_warc_records,
    )

    raw = _record(_http(b"hello <b>WARC/1.0</b> world")) + _record(
        _http(b"second"), uri=b"http://e.com/b"
    )
    plain = tmp_path / "shard.warc"
    plain.write_bytes(raw)
    gz = tmp_path / "shard.warc.gz"
    gz.write_bytes(gzip.compress(raw))

    def fake_from_uri(uri):
        assert uri.startswith("objstore://")
        return pafs.LocalFileSystem(), uri[len("objstore:/") :]

    monkeypatch.setattr(warc, "_fs_from_uri", fake_from_uri)
    for name in ("shard.warc", "shard.warc.gz"):
        via_posix = list(walk_warc_records(_file_chunks(str(tmp_path / name))))
        via_pafs = list(
            walk_warc_records(_pafs_chunks(f"objstore:/{tmp_path}/{name}", 1 << 22))
        )
        assert via_pafs == via_posix and len(via_pafs) == 2
        assert all(r[4] for r in via_pafs)  # framing_ok through the transport


def test_pafs_open_failure_is_stream_error_row_not_task_kill(monkeypatch):
    """A transport that resolves but fails to OPEN must surface as the
    walker's one flagged stream_error row — the same contract as a
    bit-rotted local shard — because the stream opens lazily inside the
    generator."""
    import pyarrow.fs as pafs

    from apache_cassandra_spark.sources.warc import _pafs_chunks, walk_warc_records

    monkeypatch.setattr(
        warc, "_fs_from_uri", lambda uri: (pafs.LocalFileSystem(), "/nonexistent/x.warc")
    )
    chunks = _pafs_chunks("objstore://b/x.warc", 1 << 22)  # must NOT raise here
    rows = list(walk_warc_records(chunks, source_file="objstore://b/x.warc"))
    assert len(rows) == 1 and rows[0][5].startswith("stream_error:")


# --- Content-Encoding / Transfer-Encoding (r11 advice) -------------------


def _http_enc(body: bytes, extra_headers: bytes, ctype=b"text/html; charset=utf-8"):
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: " + ctype + b"\r\n" + extra_headers +
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body
    )


def _chunked(payload: bytes, sizes):
    out, pos = [], 0
    for s in sizes:
        part = payload[pos : pos + s]
        out.append(hex(len(part))[2:].encode() + b"\r\n" + part + b"\r\n")
        pos += s
    out.append(b"0\r\n\r\n")
    return b"".join(out)


def test_encoded_bodies_null_text_and_surface_encoding(spark, tmp_path):
    """gzip / chunked bodies must NOT decode as mojibake or leak
    chunk-size lines into body_text — NULL text, labeled columns,
    exact original bytes preserved."""
    import gzip as _gz

    html = "<p>compressed content</p>".encode()
    gz_body = _gz.compress(html)
    ch_body = _chunked(html, [7, 9, 100])
    recs = (
        _record(_http_enc(gz_body, b"Content-Encoding: gzip\r\n"), uri=b"http://e.com/gz")
        + _record(
            _http_enc(ch_body, b"Transfer-Encoding: chunked\r\n"), uri=b"http://e.com/ch"
        )
        + _record(_http_enc(html, b""), uri=b"http://e.com/plain")
    )
    p = tmp_path / "enc.warc"
    p.write_bytes(recs)
    got = {
        r["target_uri"]: r
        for r in warc.http_response_parts(warc.read_warc(spark, str(p))).collect()
    }
    gz_row = got["http://e.com/gz"]
    assert gz_row["http_encoding"] == "gzip" and gz_row["body_text"] is None
    assert bytes(gz_row["body"]) == gz_body  # exact bytes, never mangled
    ch_row = got["http://e.com/ch"]
    assert ch_row["http_transfer_encoding"] == "chunked" and ch_row["body_text"] is None
    plain = got["http://e.com/plain"]
    assert plain["http_encoding"] == "" and plain["body_text"] == html.decode()
    # the corpus bridge DROPS unreadable bodies by default...
    urls = {r["url"] for r in warc.responses_to_pages(warc.read_warc(spark, str(p))).collect()}
    assert urls == {"http://e.com/plain"}
    # ...and recovers them with decode_bodies=True
    pages = {
        r["url"]: r["html"]
        for r in warc.responses_to_pages(
            warc.read_warc(spark, str(p)), decode_bodies=True
        ).collect()
    }
    assert pages == {u: html.decode() for u in ("http://e.com/gz", "http://e.com/ch", "http://e.com/plain")}


def _raw_deflate(data: bytes) -> bytes:
    co = __import__("zlib").compressobj(wbits=-15)
    return co.compress(data) + co.flush()


def test_decode_http_bodies_matrix(spark, tmp_path):
    """deflate (zlib AND raw), gzip+charset interplay (cp1251 text under
    gzip), chunked+gzip combo, br (decodes via the system-libbrotli
    binding when present, honest flagged row otherwise), corrupt gzip
    (flagged, bytes preserved)."""
    import gzip as _gz
    import zlib

    from apache_cassandra_spark.sources import brotli as _brotli

    ru = "привет мир"
    cp1251_gz = _gz.compress(ru.encode("cp1251"))
    plain = "<p>ok</p>".encode()
    recs = (
        _record(
            _http_enc(zlib.compress(plain), b"Content-Encoding: deflate\r\n"),
            uri=b"http://e.com/zlib",
        )
        + _record(
            _http_enc(_raw_deflate(plain), b"Content-Encoding: deflate\r\n"),
            uri=b"http://e.com/raw",
        )
        + _record(
            _http_enc(
                cp1251_gz,
                b"Content-Encoding: gzip\r\n",
                ctype=b"text/html; charset=windows-1251",
            ),
            uri=b"http://e.com/ru",
        )
        + _record(
            _http_enc(
                _chunked(_gz.compress(plain), [5, 11, 100]),
                b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
            ),
            uri=b"http://e.com/combo",
        )
        + _record(
            _http_enc(
                _brotli.compress("<p>br body</p>".encode(), quality=5)
                if _brotli.encoder_available()
                else b"\x8b\x02\x80br-bytes",
                b"Content-Encoding: br\r\n",
            ),
            uri=b"http://e.com/br",
        )
        + _record(
            _http_enc(b"\x8b\x02\x80br-bytes", b"Content-Encoding: br\r\n"),
            uri=b"http://e.com/br-corrupt",
        )
        + _record(
            _http_enc(b"\x1f\x8b\x08\x00garbage!!", b"Content-Encoding: gzip\r\n"),
            uri=b"http://e.com/corrupt",
        )
    )
    p = tmp_path / "matrix.warc"
    p.write_bytes(recs)
    parts = warc.http_response_parts(warc.read_warc(spark, str(p)))
    got = {r["target_uri"]: r for r in warc.decode_http_bodies(parts).collect()}
    for u in ("http://e.com/zlib", "http://e.com/raw"):
        assert bytes(got[u]["body"]) == plain and got[u]["http_decode_error"] is None
        assert got[u]["body_text"] == plain.decode() and got[u]["http_encoding"] == ""
    assert got["http://e.com/ru"]["body_text"] == ru  # charset applies POST-inflate
    assert got["http://e.com/combo"]["body_text"] == plain.decode()
    assert got["http://e.com/combo"]["http_transfer_encoding"] == ""
    br = got["http://e.com/br"]
    if _brotli.available() and _brotli.encoder_available():
        assert br["http_decode_error"] is None and br["http_encoding"] == ""
        assert br["body_text"] == "<p>br body</p>"
    else:
        assert "unsupported" in br["http_decode_error"] and br["body_text"] is None
        assert br["http_encoding"] == "br" and bytes(br["body"]) == b"\x8b\x02\x80br-bytes"
    brc = got["http://e.com/br-corrupt"]
    assert brc["http_decode_error"] is not None and brc["body_text"] is None
    assert brc["http_encoding"] == "br"
    assert bytes(brc["body"]) == b"\x8b\x02\x80br-bytes"  # original bytes kept
    bad = got["http://e.com/corrupt"]
    assert bad["http_decode_error"] and bad["body_text"] is None
    assert bytes(bad["body"]) == b"\x1f\x8b\x08\x00garbage!!"


def test_decode_http_bodies_transfer_coding_tokens(spark, tmp_path):
    """Transfer-Encoding beyond bare chunked (r12 ADVICE): a compression
    TRANSFER coding (``gzip``, ``gzip, chunked``) is undone in reverse
    list order; an unknown residual coding keeps the row flagged with
    its label and NULL body_text — never still-compressed bytes
    relabeled as decoded."""
    import gzip as _gz

    plain = "<p>tenc</p>".encode()
    recs = (
        _record(
            _http_enc(_gz.compress(plain), b"Transfer-Encoding: gzip\r\n"),
            uri=b"http://e.com/te-gzip",
        )
        + _record(
            _http_enc(
                _chunked(_gz.compress(plain), [7, 9, 100]),
                b"Transfer-Encoding: gzip, chunked\r\n",
            ),
            uri=b"http://e.com/te-combo",
        )
        + _record(
            _http_enc(_chunked(plain, [100]), b"Transfer-Encoding: identity, chunked\r\n"),
            uri=b"http://e.com/te-identity",
        )
        + _record(
            _http_enc(b"opaque-bytes", b"Transfer-Encoding: frobnicate\r\n"),
            uri=b"http://e.com/te-unknown",
        )
    )
    p = tmp_path / "tenc.warc"
    p.write_bytes(recs)
    parts = warc.http_response_parts(warc.read_warc(spark, str(p)))
    got = {r["target_uri"]: r for r in warc.decode_http_bodies(parts).collect()}
    for u in ("http://e.com/te-gzip", "http://e.com/te-combo"):
        assert bytes(got[u]["body"]) == plain, u
        assert got[u]["body_text"] == plain.decode() and got[u]["http_decode_error"] is None
        assert got[u]["http_transfer_encoding"] == ""
    # identity token is a no-op around the de-chunk
    ident = got["http://e.com/te-identity"]
    assert ident["body_text"] == plain.decode() and ident["http_decode_error"] is None
    unk = got["http://e.com/te-unknown"]
    assert "unsupported Transfer-Encoding" in unk["http_decode_error"]
    assert unk["http_transfer_encoding"] == "frobnicate"
    assert bytes(unk["body"]) == b"opaque-bytes" and unk["body_text"] is None


def test_dechunk_model():
    """_dechunk against hand-built framings: extensions, LF-only, and
    the malformed shapes that must raise (caller flags the row)."""
    import pytest as _pt

    from apache_cassandra_spark.sources.warc import _dechunk

    assert _dechunk(b"5;ext=1\r\nhello\r\n0\r\n\r\n") == b"hello"
    assert _dechunk(b"5\nhello\n0\n\n") == b"hello"          # LF-only servers
    assert _dechunk(b"3\r\nabc\r\n2\r\nde\r\n0\r\n") == b"abcde"
    for bad in (b"5\r\nhel", b"zz\r\nab\r\n0\r\n", b"3\r\nabcX\r\n0\r\n", b""):
        with _pt.raises(ValueError):
            _dechunk(bad)


def test_charset_translate_tables_exhaustive_vs_python_codecs(spark):
    """Every _SINGLE_BYTE_CHARSETS table, all 256 byte values, against
    Python's codec machinery (errors='replace' — the U+FFFD convention
    the translate tables encode). One drifted code point in any table
    flips this; the WHATWG latin-1→cp1252 aliasing means those tokens
    are checked against cp1252, which is the point."""
    from apache_cassandra_spark.sources.warc import _SINGLE_BYTE_CHARSETS, _sb_decode

    all_bytes = bytes(range(256))
    df = spark.createDataFrame([(all_bytes,)], "b binary")
    view = F.decode(F.col("b"), "ISO-8859-1")
    sel = []
    for token, codec in _SINGLE_BYTE_CHARSETS.items():
        col = view if codec is None else _sb_decode(view, codec)
        sel.append(col.alias(f"t_{token.replace('-', '_').replace('.', '_').replace(':', '_')}"))
    row = df.select(*sel).collect()[0]
    for token, codec in _SINGLE_BYTE_CHARSETS.items():
        expect = all_bytes.decode(codec or "iso-8859-1", errors="replace")
        got = row[f"t_{token.replace('-', '_').replace('.', '_').replace(':', '_')}"]
        assert got == expect, (token, codec)


# --- write_warc_binary: the byte-exact distributed sink ------------------


def test_write_warc_binary_roundtrip_arbitrary_bytes(spark, tmp_path):
    """The r11 'can read but not write binary' boundary, closed: NUL
    bytes, embedded record magic, full 0-255 coverage, and a gzip
    member — all byte-exact through write -> read_warc."""
    payloads = {
        "http://e.com/nul": b"\x00\x01\x02 binary \xff\xfe",
        "http://e.com/magic": b"prefix WARC/1.0\r\n embedded magic tail",
        "http://e.com/all": bytes(range(256)) * 3,
        "http://e.com/gzpayload": gzip.compress(b"a payload that IS gzip bytes"),
        "http://e.com/empty": b"",
    }
    df = spark.createDataFrame(
        [(u, p) for u, p in payloads.items()], "target_uri string, payload binary"
    )
    out = str(tmp_path / "bin_warc")
    manifest = warc.write_warc_binary(df, out).collect()
    assert sum(r["n_records"] for r in manifest) == len(payloads)
    assert all(r["shard_path"].endswith(".warc") for r in manifest)
    back = warc.read_warc(spark, out, record_types=()).collect()
    got = {r["target_uri"]: bytes(r["payload"]) for r in back}
    assert got == payloads
    assert all(r["framing_ok"] and r["parse_error"] is None for r in back)
    assert all(r["content_length"] == len(payloads[r["target_uri"]]) for r in back)


def test_write_warc_binary_gzip_members_and_modes(spark, tmp_path):
    """compress=True writes one gzip member per record (the Common
    Crawl shard convention) — read_warc's member walker ingests it;
    mode semantics: error refuses, overwrite clears, append adds."""
    df = spark.createDataFrame(
        [("http://e.com/a", b"one \x00"), ("http://e.com/b", b"two")],
        "target_uri string, payload binary",
    )
    out = str(tmp_path / "gz_sink")
    manifest = warc.write_warc_binary(df, out, compress=True).collect()
    assert all(r["shard_path"].endswith(".warc.gz") for r in manifest)
    back = {r["target_uri"]: bytes(r["payload"]) for r in warc.read_warc(spark, out).collect()}
    assert back == {"http://e.com/a": b"one \x00", "http://e.com/b": b"two"}
    with pytest.raises(ValueError, match="non-empty"):
        warc.write_warc_binary(df, out, compress=True)
    warc.write_warc_binary(df, out, compress=True, mode="append")
    assert warc.read_warc(spark, out).count() == 4
    warc.write_warc_binary(df, out, compress=True, mode="overwrite")
    assert warc.read_warc(spark, out).count() == 2


def test_warc_to_wat_roundtrip(spark, tmp_path):
    """WAT sidecar generation + read-back (the third Common Crawl
    format): per-response metadata records whose JSON carries envelope
    headers, HTTP response message, and HTML head/links — gzip bodies
    inflated before extraction, entity-decoded titles, capture-URL link
    resolution (path-relative -> NULL per the outlink contract),
    non-HTML responses present with NULL html metadata (every status
    kept, the CC convention)."""
    import gzip as _gz
    import json as _json

    html = (b"<html lang='en'><head><title>T&amp;A</title>"
            b"<meta name='description' content='a page'></head>"
            b"<body><a href='/x'>x</a><a href='http://o.org/y'>y</a></body></html>")
    recs = (
        _record(_http_enc(html, b""), uri=b"http://e.com/page")
        + _record(
            _http_enc(_gz.compress(b"<html><title>Gz</title><a href='z'>rel</a></html>"),
                      b"Content-Encoding: gzip\r\n"),
            uri=b"http://e.com/gz",
        )
        + _record(_http_enc(b"%PDF-1.4", b"", ctype=b"application/pdf"),
                  uri=b"http://e.com/doc.pdf")
    )
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.warc").write_bytes(recs)
    wat = str(tmp_path / "wat")
    manifest = warc.warc_to_wat(spark, str(src), wat)
    assert sum(r["n_records"] for r in manifest.collect()) == 3
    # the records ARE WARC metadata records with JSON payloads
    raw = warc.read_warc(spark, wat, record_types=("metadata",)).collect()
    assert all(r["content_type"] == "application/json" for r in raw)
    doc = _json.loads(bytes(next(r for r in raw if r["target_uri"] == "http://e.com/page")["payload"]))
    assert doc["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://e.com/page"
    assert doc["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]["Head"]["Title"] == "T&A"
    back = {r["url"]: r for r in warc.read_wat(spark, wat).collect()}
    page = back["http://e.com/page"]
    assert (page["status"], page["title"], page["language"], page["meta_description"]) == (
        200, "T&A", "en", "a page")
    assert [(l["href"], l["url"]) for l in page["links"]] == [
        ("/x", "http://e.com/x"), ("http://o.org/y", "http://o.org/y")]
    gz = back["http://e.com/gz"]
    assert gz["title"] == "Gz"                       # body inflated pre-extraction
    assert gz["links"][0]["url"] is None             # path-relative contract
    pdf = back["http://e.com/doc.pdf"]
    assert pdf["content_type"] == "application/pdf" and pdf["title"] is None
    assert pdf["links"] is None
    # foreign/partial WAT JSON reads null-tolerantly
    import tests.test_warc_binary as _self  # noqa: F401 (symmetry with other helpers)
    foreign = _record(
        b'{"Envelope": {"WARC-Header-Metadata": {"WARC-Target-URI": "http://f.com/p"}}}',
        rtype=b"metadata", uri=b"http://f.com/p",
    )
    (tmp_path / "foreign").mkdir()
    (tmp_path / "foreign" / "f.warc").write_bytes(foreign)
    fr = warc.read_wat(spark, str(tmp_path / "foreign")).collect()[0]
    assert fr["url"] == "http://f.com/p" and fr["status"] is None


def _revisit(uri, refers_uri=None, refers_date=None, digest=b"sha1:AAAA",
             profile=b"http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"):
    extra = b"WARC-Payload-Digest: " + digest + b"\r\nWARC-Profile: " + profile + b"\r\n"
    if refers_uri:
        extra += b"WARC-Refers-To-Target-URI: " + refers_uri + b"\r\n"
    if refers_date:
        extra += b"WARC-Refers-To-Date: " + refers_date + b"\r\n"
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    return (
        b"WARC/1.1\r\n"
        b"WARC-Type: revisit\r\n"
        b"WARC-Record-ID: <urn:uuid:9>\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: 2013-06-01T00:00:00Z\r\n" + extra +
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def test_revisit_records_and_edges(spark, tmp_path):
    """WARC 1.1 revisit records (how recrawls record duplicate content
    without storing the body twice): read_warc_revisits surfaces the
    refers-to trio; revisit_edges folds to dedup-ready rows — same-URL
    fallback, identical-payload vs server-not-modified profiles."""
    recs = (
        _revisit(b"http://e.com/a", refers_uri=b"http://e.com/a-orig",
                 refers_date=b"2013-01-01T00:00:00Z")
        + _revisit(b"http://e.com/self")  # no Refers-To-Target-URI
        + _revisit(b"http://e.com/304",
                   profile=b"http://netpreserve.org/warc/1.1/revisit/server-not-modified")
        + _record(b"HTTP/1.1 200 OK\r\n\r\nbody", uri=b"http://e.com/normal")
    )
    p = tmp_path / "revisits.warc"
    p.write_bytes(recs)
    df = warc.read_warc_revisits(spark, str(p))
    assert {"warc_refers_to_target_uri", "warc_payload_digest", "warc_profile"} <= set(df.columns)
    got = {r["url"]: r for r in warc.revisit_edges(df).collect()}
    assert set(got) == {"http://e.com/a", "http://e.com/self", "http://e.com/304"}
    a = got["http://e.com/a"]
    assert a["refers_to_uri"] == "http://e.com/a-orig"
    assert a["refers_to_date"] == "2013-01-01T00:00:00Z"
    assert a["payload_digest"] == "sha1:AAAA" and a["identical"] is True
    assert got["http://e.com/self"]["refers_to_uri"] == "http://e.com/self"  # fallback
    assert got["http://e.com/304"]["identical"] is False
    # r13 verdict watch-edge: the same-URL fallback is an INFERENCE —
    # the record may duplicate a capture at a different URL, or its own
    # URL may have no prior capture — and must be distinguishable from
    # a writer-asserted referent so folds can key inferred rows by
    # digest instead
    assert a["refers_to_inferred"] is False
    assert got["http://e.com/self"]["refers_to_inferred"] is True
    assert got["http://e.com/304"]["refers_to_inferred"] is True
    # response records still read untouched (no extra columns by default)
    plain = warc.read_warc(spark, str(p))
    assert "warc_profile" not in plain.columns
    assert plain.count() == 1  # the one response record


def test_write_warc_binary_task_commit_last_wins(spark, tmp_path):
    """Task-commit protocol: committed shard names are deterministic per
    (job, partition), so a replayed attempt (task retry / speculative
    execution — simulated here by re-running the identical job id)
    commits to the SAME names and the target holds each record exactly
    once, byte-identical. A different job id (a genuine append) gets
    disjoint names."""
    import os

    df = spark.createDataFrame(
        [("http://e.com/a", b"one"), ("http://e.com/b", b"two \xff")],
        "target_uri string, payload binary",
    ).repartition(2)
    out = str(tmp_path / "commit")
    m1 = sorted(r["shard_path"] for r in warc.write_warc_binary(df, out, _job="j1").collect())
    bytes1 = {p: open(p, "rb").read() for p in m1}
    # replayed attempt: same job, same input partitions -> same names
    m2 = sorted(
        r["shard_path"]
        for r in warc.write_warc_binary(df, out, mode="append", _job="j1").collect()
    )
    assert m2 == m1
    assert sorted(os.listdir(out)) == sorted(p.rsplit("/", 1)[-1] for p in m1)
    assert {p: open(p, "rb").read() for p in m1} == bytes1
    assert warc.read_warc(spark, out).count() == 2  # not duplicated
    # a genuine second job appends under disjoint names
    m3 = [r["shard_path"] for r in warc.write_warc_binary(df, out, mode="append", _job="j2").collect()]
    assert set(m3).isdisjoint(m1)
    assert warc.read_warc(spark, out).count() == 4


def test_write_warc_binary_reconcile_scoped_to_job(spark, tmp_path):
    """Driver-side reconcile: stray _tmp-<job>-* staging files (failed
    or killed attempts) and part-<job>-* files absent from the manifest
    are deleted after the action — but ONLY this job's prefix; shards
    appended by other jobs survive untouched."""
    import os

    df = spark.createDataFrame(
        [("http://e.com/a", b"one")], "target_uri string, payload binary"
    )
    out = str(tmp_path / "reconcile")
    warc.write_warc_binary(df, out, _job="j1")
    # plant this-job strays (a leaked attempt + an orphaned shard) and
    # an other-job shard that must survive
    (tmp_path / "reconcile" / "_tmp-j1-00007-42.warc").write_bytes(b"partial")
    (tmp_path / "reconcile" / "part-j1-99999.warc").write_bytes(b"orphan")
    other = warc.write_warc_binary(
        spark.createDataFrame([("http://e.com/b", b"two")], "target_uri string, payload binary"),
        out, mode="append", _job="j2",
    ).collect()[0]["shard_path"]
    warc.write_warc_binary(df, out, mode="append", _job="j1")  # j1 re-run reconciles
    names = sorted(os.listdir(out))
    assert "_tmp-j1-00007-42.warc" not in names
    assert "part-j1-99999.warc" not in names
    assert other.rsplit("/", 1)[-1] in names
    back = sorted(r["target_uri"] for r in warc.read_warc(spark, out).collect())
    assert back == ["http://e.com/a", "http://e.com/b"]


def test_write_warc_binary_empty_partition_skew(spark, tmp_path):
    """Manifest under empty-partition skew (r12 verdict item 7): far
    more partitions than rows -> no empty shards on disk, no staging
    leftovers, and the manifest lists exactly the files present."""
    import os

    df = spark.createDataFrame(
        [("http://e.com/a", b"x"), ("http://e.com/b", b"y"), ("http://e.com/c", b"z")],
        "target_uri string, payload binary",
    ).repartition(16)
    out = str(tmp_path / "skew")
    manifest = warc.write_warc_binary(df, out).collect()
    assert all(r["n_records"] > 0 and r["shard_path"] for r in manifest)
    names = sorted(os.listdir(out))
    assert names == sorted(r["shard_path"].rsplit("/", 1)[-1] for r in manifest)
    assert not any(n.startswith("_tmp-") for n in names)
    assert warc.read_warc(spark, out).count() == 3


def test_write_warc_binary_header_injection_and_nulls(spark, tmp_path):
    """CRLF in a URI must not become a spoofed header line; NULL uri or
    payload rows drop per the explicit contract."""
    df = spark.createDataFrame(
        [
            ("http://e.com/x\r\nWARC-Type: evil", b"payload"),
            (None, b"dropped"),
            ("http://e.com/null", None),
        ],
        "target_uri string, payload binary",
    )
    out = str(tmp_path / "inj")
    manifest = warc.write_warc_binary(df, out).collect()
    assert sum(r["n_records"] for r in manifest) == 1
    rec = warc.read_warc(spark, out).collect()[0]
    assert rec["warc_type"] == "response"  # not 'evil'
    assert "evil" in rec["target_uri"] and "\r" not in rec["target_uri"]


def test_write_warc_binary_media_payloads_decode_after_roundtrip(spark, tmp_path):
    """End-to-end with the multimodal family: real JVM-generated PNG
    payloads written as WARC resource records, walked back byte-exact,
    and DECODED by the honest PNG decoder — the raster survives the
    interchange."""
    from apache_cassandra_spark.analytics import multimodal as MM

    docs = spark.range(3).select(
        F.concat(F.lit("http://img.e.com/"), F.col("id")).alias("target_uri"),
        MM.synthetic_png_payload(F.col("id").cast("long")).alias("payload"),
        F.col("id").alias("media_id"),
    )
    expected = {r["target_uri"]: bytes(r["payload"]) for r in docs.collect()}
    out = str(tmp_path / "png_warc")
    warc.write_warc_binary(docs, out, default_type="resource", content_type="image/png")
    back = warc.read_warc(spark, out, record_types=("resource",))
    got = {r["target_uri"]: bytes(r["payload"]) for r in back.collect()}
    assert got == expected
    media = back.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        "payload",
    )
    decoded = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    src = {r["media_id"]: r for r in MM.decode_media(
        MM.png_media_from_documents(spark.range(3).select(F.col("id").alias("doc_id")))
    ).collect()}
    assert set(decoded) == {0, 1, 2}
    for mid, r in decoded.items():
        assert (r["width"], r["height"], r["mean_r"]) == (
            src[mid]["width"], src[mid]["height"], src[mid]["mean_r"])


def test_property_dechunk_roundtrip():
    """Property fuzz (pure Python — no Spark per example): any payload,
    any chunking, any mix of CRLF/LF line endings and chunk extensions
    reassembles exactly; flipping the terminal chunk off raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apache_cassandra_spark.sources.warc import _dechunk

    @settings(max_examples=200, deadline=None)
    @given(
        payload=st.binary(max_size=200),
        sizes=st.lists(st.integers(1, 50), max_size=8),
        crlf=st.booleans(),
        ext=st.booleans(),
        data=st.data(),
    )
    def check(payload, sizes, crlf, ext, data):
        eol = b"\r\n" if crlf else b"\n"
        out, pos = [], 0
        for s in sizes:
            part = payload[pos : pos + s]
            if not part:
                break
            line = hex(len(part))[2:].encode() + (b";x=1" if ext else b"")
            out.append(line + eol + part + eol)
            pos += len(part)
        out.append(b"0" + eol + eol)
        framed = b"".join(out)
        assert _dechunk(framed) == payload[:pos]
        # drop the terminal chunk -> must raise, never return a prefix
        import pytest as _pt

        truncated = framed[: -len(b"0" + eol + eol)]
        if truncated:
            with _pt.raises(ValueError):
                _dechunk(truncated)

    check()


def test_encoding_pipeline_streams_stateless(spark, tmp_path):
    """The full encoding-aware bridge (walk -> HTTP split -> inflate ->
    pages) is stateless per record, so it composes under readStream
    unchanged — streamed results must equal the batch bridge on a mixed
    plain/gzip/chunked shard set."""
    import gzip as _gz

    src = tmp_path / "enc_src"
    src.mkdir()
    html = "<p>stream me</p>".encode()
    (src / "s0.warc").write_bytes(
        _record(_http_enc(_gz.compress(html), b"Content-Encoding: gzip\r\n"),
                uri=b"http://e.com/gz")
        + _record(_http_enc(html, b""), uri=b"http://e.com/plain")
    )
    (src / "s1.warc").write_bytes(
        _record(_http_enc(_chunked(html, [6, 99]), b"Transfer-Encoding: chunked\r\n"),
                uri=b"http://e.com/ch")
    )
    batch = {
        (r["url"], r["html"])
        for r in warc.responses_to_pages(
            warc.read_warc(spark, str(src) + "/*"), decode_bodies=True
        ).collect()
    }
    assert batch == {(f"http://e.com/{p}", html.decode()) for p in ("gz", "plain", "ch")}
    stream = warc.responses_to_pages(
        warc.read_warc_stream(spark, str(src) + "/*", max_files_per_trigger=1),
        decode_bodies=True,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("enc_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r["url"], r["html"]) for r in spark.sql("select * from enc_stream_t").collect()}
    finally:
        q.stop()
    assert got == batch


def test_redirect_edges_resolution_and_filtering(spark, tmp_path):
    """3xx captures become frontier edges: absolute Location kept,
    host-relative resolves against the capture URL, path-relative NULLs
    by contract; 200s, missing-Location 3xxes, and broken-framing rows
    all drop."""
    def _redir(status, location, uri):
        env = (b"HTTP/1.1 " + status + b"\r\nLocation: " + location
               + b"\r\nContent-Length: 0\r\n\r\n")
        return _record(env, uri=uri)

    recs = (
        _redir(b"301 Moved Permanently", b"https://new.e.com/x", b"http://e.com/old1")
        + _redir(b"302 Found", b"/local/path?q=1", b"https://e.com:8080/old2")
        + _redir(b"307 Temporary Redirect", b"rel/next", b"http://e.com/old3")
        + _redir(b"303 See Other", b"//cdn.e.com/m", b"https://e.com/old4")
        + _record(_http(b"<p>ok</p>"), uri=b"http://e.com/fine")
        + _redir(b"301 Moved Permanently", b"", b"http://e.com/noloc")
    )
    p = tmp_path / "redir.warc"
    p.write_bytes(recs)
    got = {r["url"]: r for r in warc.redirect_edges(warc.read_warc(spark, str(p))).collect()}
    assert set(got) == {
        "http://e.com/old1",
        "https://e.com:8080/old2",
        "http://e.com/old3",
        "https://e.com/old4",
    }
    assert got["http://e.com/old1"]["redirect_to"] == "https://new.e.com/x"
    # host-relative inherits scheme AND host:port (resolve_link keeps www/port)
    assert got["https://e.com:8080/old2"]["redirect_to"] == "https://e.com:8080/local/path?q=1"
    assert got["http://e.com/old3"]["redirect_to"] is None  # path-relative contract
    assert got["http://e.com/old3"]["location"] == "rel/next"
    assert got["https://e.com/old4"]["redirect_to"] == "https://cdn.e.com/m"
    assert got["https://e.com:8080/old2"]["http_status"] == 302


def test_extra_headers_collision_is_valueerror(spark, tmp_path):
    """r13 advice: a requested header that snake-cases onto a fixed
    output column (or onto another requested header) must fail fast
    with a clear ValueError, not surface a duplicate column that dies
    later in F.col resolution."""
    df = spark.createDataFrame(
        [("http://e.com/a", b"x")], "target_uri string, payload binary"
    )
    out = str(tmp_path / "coll")
    warc.write_warc_binary(df, out)
    with pytest.raises(ValueError, match="warc_type"):
        warc.read_warc(spark, out, extra_headers=("WARC-Type",))
    with pytest.raises(ValueError, match="content_type"):
        warc.read_warc(spark, out, extra_headers=("Content-Type",))
    with pytest.raises(ValueError, match="warc_refers_to"):
        warc.read_warc(
            spark, out, extra_headers=("WARC-Refers-To", "warc-refers-to")
        )
    # non-colliding request still works
    assert warc.read_warc(spark, out, extra_headers=("WARC-Refers-To",)).count() == 1


def test_zombie_tmp_staging_file_invisible_to_readers(spark, tmp_path):
    """r13 advice (residual-zombie window): a _tmp-<job>-* staging file
    recreated AFTER the driver reconcile (zombie/speculative attempt)
    is underscore-prefixed, and Spark's binaryFile index hides such
    names by the Hadoop convention — so readers never see it. This
    locks the documented read-side defense."""
    df = spark.createDataFrame(
        [("http://e.com/a", b"one"), ("http://e.com/b", b"two")],
        "target_uri string, payload binary",
    )
    out = str(tmp_path / "zombie")
    warc.write_warc_binary(df, out)
    base = warc.read_warc(spark, out)
    n = base.count()
    # zombie attempt finishing after the sweep: garbage staging bytes
    (tmp_path / "zombie" / "_tmp-deadjob-00001-42.warc").write_bytes(
        b"WARC/1.0\r\ngarbage that is not even framed"
    )
    after = warc.read_warc(spark, out)
    assert after.count() == n
    assert {r["source_file"].rsplit("/", 1)[-1] for r in after.collect()} == {
        r["source_file"].rsplit("/", 1)[-1] for r in base.collect()
    }


def test_read_wat_foreign_shard_mutilation_fuzz(spark, tmp_path):
    """r13 verdict item 7: real Common Crawl WAT shards (or foreign
    writers) carry shapes the subset DDL doesn't know — extra fields,
    missing branches, wrong types, truncated JSON, outright garbage.
    The null-tolerant contract: every record still produces exactly one
    row, url/warc_date fall back to the WARC record headers, fields
    whose branch survives the mutilation keep their values, and nothing
    ever task-kills. Seeded mutation model over a valid template."""
    import json
    import random

    rnd = random.Random(1414)
    template = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": None,  # filled per record
                "WARC-Date": "2020-02-02T00:00:00Z",
                "WARC-Record-ID": "<urn:uuid:t>",
                "Content-Length": 123,
            },
            "Payload-Metadata": {
                "Actual-Content-Type": "application/http; msgtype=response",
                "HTTP-Response-Metadata": {
                    "Response-Message": {"Status": 200},
                    "Headers": {"Content-Type": "text/html", "Charset": "utf-8"},
                    "HTML-Metadata": {
                        "Head": {"Title": "Tïtle", "Language": "en"},
                        "Links": [
                            {"path": "A@/href", "href": "/x", "url": "http://e.com/x"}
                        ],
                    },
                },
            },
        }
    }

    def mutate(doc, kind):
        d = json.loads(json.dumps(doc))  # deep copy
        env = d["Envelope"]
        pm = env["Payload-Metadata"]
        hrm = pm["HTTP-Response-Metadata"]
        if kind == "drop_envelope":
            return {}
        if kind == "drop_payload_meta":
            env.pop("Payload-Metadata")
        elif kind == "drop_http_meta":
            pm.pop("HTTP-Response-Metadata")
        elif kind == "drop_head":
            hrm["HTML-Metadata"].pop("Head")
        elif kind == "drop_header_meta":
            env.pop("WARC-Header-Metadata")
        elif kind == "extra_fields":
            d["Container"] = {"Offset": 7, "Gzip-Metadata": {"Deflate-Length": 9}}
            env["Extra-Branch"] = [1, 2, {"x": "y"}]
            hrm["Headers"]["X-Unknown-Header"] = "zz"
            hrm["HTML-Metadata"]["Head"]["Metas"] = [{"name": "a", "content": "b"}]
        elif kind == "wrong_types":
            hrm["Response-Message"]["Status"] = {"code": 200}
            hrm["HTML-Metadata"]["Links"] = {"not": "an array"}
        elif kind == "status_as_string":
            # CC WATs carry Status as a JSON string — must coerce to INT
            hrm["Response-Message"]["Status"] = "301"
        return d

    kinds = ["intact", "drop_envelope", "drop_payload_meta", "drop_http_meta",
             "drop_head", "drop_header_meta", "extra_fields", "wrong_types",
             "status_as_string", "truncated", "garbage", "empty"]
    recs, expect = [], {}
    for i in range(48):
        kind = kinds[i % len(kinds)] if i < len(kinds) else rnd.choice(kinds)
        uri = f"http://m{i}.com/p"
        doc = mutate(template, kind)
        if "Envelope" in doc and doc["Envelope"].get("WARC-Header-Metadata"):
            doc["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"] = uri
        payload = json.dumps(doc, ensure_ascii=False).encode("utf-8")
        if kind == "truncated":
            payload = payload[: rnd.randint(1, max(2, len(payload) - 5))]
        elif kind == "garbage":
            payload = bytes(rnd.randrange(256) for _ in range(rnd.randint(1, 40)))
        elif kind == "empty":
            payload = b""
        recs.append(_record(payload, rtype=b"metadata", uri=uri.encode()))
        expect[uri] = kind
    shard = tmp_path / "mutil"
    shard.mkdir()
    (shard / "m.warc").write_bytes(b"".join(recs))

    rows = warc.read_wat(spark, str(shard)).collect()
    assert len(rows) == len(recs)            # one row per record, no kills
    by_url = {r["url"]: r for r in rows}
    for uri, kind in expect.items():
        r = by_url[uri]                      # url always present (fallback)
        if kind in ("intact", "extra_fields"):
            assert r["title"] == "Tïtle" and r["status"] == 200, kind
            assert [(l["href"], l["url"]) for l in (r["links"] or [])] == [
                ("/x", "http://e.com/x")], kind
        elif kind == "status_as_string":
            assert r["status"] == 301, r
        elif kind == "drop_head":
            assert r["title"] is None and r["status"] == 200 and r["links"], kind
        elif kind == "drop_header_meta":
            # payload branch intact; url/warc_date fall back to the
            # WARC record headers
            assert r["status"] == 200 and r["title"] == "Tïtle", (kind, r)
            assert r["warc_date"] == "2013-01-01T00:00:00Z", r
        elif kind in ("drop_envelope", "drop_payload_meta", "drop_http_meta",
                      "truncated", "garbage", "empty"):
            assert r["status"] is None and r["title"] is None, (kind, r)
        if kind == "wrong_types":
            # mistyped branches null out without poisoning siblings
            assert r["content_type"] == "text/html", r
    # warc_date falls back to the record header when the JSON lacks it
    assert all(r["warc_date"] is not None for r in rows)
