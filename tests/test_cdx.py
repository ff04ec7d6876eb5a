"""CDX URL indexes + ranged record fetch (sources/cdx.py): SURT keys,
index build from shards, CDXJ round-trip, point lookups into
uncompressed (seek) and gzip (forward-decompress) shards — the
Common Crawl random-access surface."""

import glob
import json

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.sources import cdx, warc


def _pages(spark):
    rows = [
        (f"http://site{i % 3}.com/p/{i}", f"<html><body>page {i} body</body></html>")
        for i in range(12)
    ]
    body = [
        (
            u,
            (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
                + str(len(h))
                + "\r\n\r\n"
                + h
            ).encode(),
        )
        for u, h in rows
    ]
    return spark.createDataFrame(body, "target_uri string, payload binary")


def test_surt_key_examples(spark):
    cases = [
        ("https://www.Example.com:443/A/b?b=2&a=1", "com,example)/a/b?a=1&b=2"),
        ("http://example.com", "com,example)/"),
        ("http://sub.example.co.uk/x", "uk,co,example,sub)/x"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        ("http://example.com/p?&a=1&", "com,example)/p?a=1"),
        ("not-a-url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    from apache_cassandra_spark.analytics.web import surt

    got = [r["k"] for r in df.select(surt(F.col("url")).alias("k")).collect()]
    assert got == [want for _, want in cases]


@pytest.mark.parametrize("compress", [False, True])
def test_index_write_read_fetch_roundtrip(spark, tmp_path, compress):
    shards = str(tmp_path / ("gz" if compress else "plain"))
    warc.write_warc_binary(_pages(spark), shards, compress=compress)

    idx = cdx.index_warc(spark, shards)
    rows = idx.collect()
    assert len(rows) == 12
    assert all(r["surt"].startswith("com,site") for r in rows)
    assert all(r["timestamp"] and len(r["timestamp"]) == 14 for r in rows)
    assert all(r["digest"].startswith("sha1:") for r in rows)
    assert all(r["status"] == "200" and r["mime"] == "text/html" for r in rows)
    if not compress:
        # uncompressed shards: every length closed, offsets tile the file
        assert all(r["length"] and r["length"] > 0 for r in rows)

    # CDXJ text round trip, globally key-ordered across shard files
    cdx_dir = str(tmp_path / "cdx")
    cdx.write_cdx(idx, cdx_dir, num_shards=3)
    lines = []
    for part in sorted(glob.glob(cdx_dir + "/part-*")):
        with open(part) as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    keys = [(ln.split(" ", 2)[0], ln.split(" ", 2)[1]) for ln in lines]
    assert keys == sorted(keys)          # global order across file order
    blob = json.loads(lines[0].split(" ", 2)[2])
    assert set(blob) >= {"url", "mime", "status", "digest", "offset", "filename"}

    back = cdx.read_cdx(spark, cdx_dir)
    assert back.count() == 12
    assert sorted(r["surt"] for r in back.collect()) == sorted(r["surt"] for r in rows)

    # point fetch: pick 3 urls, fetch, byte-compare payloads vs full read
    want_urls = [f"http://site0.com/p/{i}" for i in (0, 3, 9)]
    sel = back.where(F.col("url").isin(want_urls))
    fetched = cdx.fetch_warc_records(sel)
    got = {r["target_uri"]: bytes(r["payload"]) for r in fetched.collect()}
    full = {
        r["target_uri"]: bytes(r["payload"])
        for r in warc.read_warc(spark, shards).collect()
    }
    assert set(got) == set(want_urls)
    for u in want_urls:
        assert got[u] == full[u]
    assert all(r["framing_ok"] for r in fetched.collect())


def test_fetch_from_index_df_directly(spark, tmp_path):
    """index_warc output itself feeds the fetch (no cdx text hop), and
    the fetched rows ride the reader's shared header parse."""
    shards = str(tmp_path / "direct")
    warc.write_warc_binary(_pages(spark), shards)
    idx = cdx.index_warc(spark, shards)
    one = idx.orderBy("surt", "timestamp").limit(1)
    out = cdx.fetch_warc_records(one).collect()
    assert len(out) == 1
    r = out[0]
    assert r["warc_type"] == "response" and r["content_length"] == len(r["payload"])


def test_read_cdx_null_tolerant(spark, tmp_path):
    p = tmp_path / "foreign"
    p.mkdir()
    (p / "cdx-00000").write_text(
        'com,a)/ 20200101000000 {"url": "http://a.com/", "extra-field": 1}\n'
        "junk line without json\n"
        'com,b)/ 20200101000001 {"offset": 5, "filename": "x.warc", "length": "oops"}\n'
    )
    rows = cdx.read_cdx(spark, str(p)).orderBy("surt").collect()
    assert len(rows) == 3
    assert rows[0]["surt"] == "com,a)/" and rows[0]["url"] == "http://a.com/"
    assert rows[0]["offset"] is None
    junk = [r for r in rows if r["surt"] == "junk"][0]
    assert junk["url"] is None           # junk degrades to NULL fields, no kill
    b = [r for r in rows if r["surt"] == "com,b)/"][0]
    assert b["offset"] == 5 and b["filename"] == "x.warc"


def test_fetch_multi_offset_single_gz_shard(spark, tmp_path):
    """All requested offsets inside ONE .gz shard: the fetch makes one
    forward decompression pass, emitting exactly the requested records
    (first, middle, last) with interleaved records skipped — and the
    early-exit after the last wanted offset."""
    shards = str(tmp_path / "onegz")
    warc.write_warc_binary(_pages(spark).coalesce(1), shards, compress=True)
    idx = cdx.index_warc(spark, shards).orderBy("offset").collect()
    assert len(idx) == 12 and len({r["filename"] for r in idx}) == 1
    want = [idx[0], idx[5], idx[11]]
    sel = spark.createDataFrame(
        [(r["filename"], r["offset"]) for r in want], "filename string, offset long"
    )
    out = cdx.fetch_warc_records(sel).orderBy("record_offset").collect()
    assert [r["record_offset"] for r in out] == [r["offset"] for r in want]
    full = {
        r["target_uri"]: bytes(r["payload"])
        for r in warc.read_warc(spark, shards).collect()
    }
    for r in out:
        assert bytes(r["payload"]) == full[r["target_uri"]]
