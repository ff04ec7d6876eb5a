"""CDX URL indexes + ranged WARC record fetch — the FOURTH Common
Crawl surface (WARC = raw captures, WET = text, WAT = metadata,
cdx-*.gz = the URL index), closing the RANDOM-ACCESS story: index a
shard corpus once, then answer "give me these N URLs" by fetching N
records instead of re-scanning 100 TB.

Format (public: the CDXJ layout CC's ``cc-index`` publishes and
pywb/OpenWayback read): one line per capture —

    <SURT key> <14-digit timestamp> <JSON>

where the JSON carries ``{url, mime, status, digest, length, offset,
filename}``. :func:`index_warc` builds the index FROM shards (offsets
come from the reader's framing walk — no second parse), `write_cdx` /
`read_cdx` round-trip the text form (range-partitioned by key and
sorted within shards, so the shard set is globally key-ordered — the
layout cc-index ships), and :func:`fetch_warc_records` turns index
rows back into full reader rows by opening each shard AT the record
offset.

Offset semantics (documented, honest): ``offset``/``length`` address
the UNCOMPRESSED record stream of the shard. For a plain ``.warc``
shard these are byte-exact file offsets and the fetch seeks straight
to the record (O(record) I/O — the 100 TB point-lookup path). For a
``.warc.gz`` shard the fetch must decompress forward to the offset
(gzip members are not seekable by uncompressed position without a
side index), so point lookups into compressed shards cost O(prefix)
decompression — cheap (zlib at GB/s) but not free; corpora built for
random access should write ``compress=False`` shards or keep the
uncompressed form of hot partitions. (CC's own cdx carries COMPRESSED
member offsets, which require member-boundary bookkeeping the reader's
transport does not expose; the uncompressed convention here is
self-consistent between :func:`index_warc` and
:func:`fetch_warc_records` by construction.)

Digest: ``sha1:<hex>`` of the exact record payload bytes (Spark's
``sha1``; CC spells the same digest in base32 — a presentation
difference, documented rather than re-encoded, since Spark has no
base32 builtin and the digest's job here is equality).

Scale shape: the index build is the reader's map-only walk plus ONE
per-file window (lead(offset) for lengths — partitioned by shard, no
global sort); the cdx write is one range Exchange; the fetch groups
requested offsets per shard and each task opens its shard once,
walking only the requested records. Reference parity note: the
reference fork has no crawl machinery — this extends the engine for
the LLM-pipeline mandate (the CDX(J) format and SURT are public IA /
Common Crawl conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_cassandra_spark.sources.warc import (
    _WALK_SCHEMA,
    _file_chunks,
    _local_file_path,
    _parse_walked,
    http_response_parts,
    read_warc,
    walk_warc_records,
)

#: null-tolerant subset of the CDXJ JSON blob (the WAT posture: fields
#: a foreign writer omits read as NULL, extra fields are ignored)
_CDX_DDL = (
    "url STRING, mime STRING, status STRING, digest STRING, "
    "length BIGINT, offset BIGINT, filename STRING"
)


def index_warc(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Build a CDX index frame from WARC shards: one row per well-framed
    ``response`` record — ``(surt, timestamp, url, mime, status,
    digest, length, offset, filename)``. ``timestamp`` is the CC
    14-digit form of WARC-Date; ``length`` = distance to the next
    record in the shard's (uncompressed) stream, closed for the last
    record by the file size on uncompressed shards and NULL on ``.gz``
    (where file size is compressed bytes — an honest unknown, and the
    fetch path does not need it: the framing walk knows where the
    record ends)."""
    from apache_cassandra_spark.analytics.web import surt

    parts = http_response_parts(read_warc(spark, path, **kwargs)).where(
        F.col("framing_ok")
    )
    sizes = (
        spark.read.format("binaryFile")
        .load(path)
        .select(F.col("path").alias("source_file"), F.col("length").alias("_file_len"))
    )
    w = Window.partitionBy("source_file").orderBy("record_offset")
    nxt = F.lead("record_offset").over(w)
    return (
        parts.join(sizes, "source_file", "left")
        .select(
            surt(F.col("target_uri")).alias("surt"),
            F.regexp_replace(
                F.substring(F.col("warc_date"), 1, 19), "[-:TZ]", ""
            ).alias("timestamp"),
            F.col("target_uri").alias("url"),
            F.col("http_content_type").alias("mime"),
            F.col("http_status").cast("string").alias("status"),
            F.concat(F.lit("sha1:"), F.sha1(F.col("payload"))).alias("digest"),
            F.when(
                nxt.isNotNull(), nxt - F.col("record_offset")
            ).otherwise(
                F.when(
                    ~F.col("source_file").endswith(".gz"),
                    F.col("_file_len") - F.col("record_offset"),
                )
            ).alias("length"),
            F.col("record_offset").alias("offset"),
            F.col("source_file").alias("filename"),
        )
        .where(F.col("surt").isNotNull())
    )


def write_cdx(index_df: DataFrame, path: str, num_shards: int | None = None) -> None:
    """Write an index frame as CDXJ text shards, globally key-ordered:
    range-partition on ``(surt, timestamp)`` then sort within each
    shard — the cc-index layout (readers binary-search a shard after a
    range lookup in the shard list). One narrow Exchange; no global
    single-partition sort."""
    line = F.concat_ws(
        " ",
        F.col("surt"),
        F.col("timestamp"),
        F.to_json(
            F.struct(
                "url", "mime", "status", "digest", "length", "offset", "filename"
            )
        ),
    ).alias("value")
    out = index_df.select(line, F.col("surt").alias("_k"), F.col("timestamp").alias("_t"))
    if num_shards:
        out = out.repartitionByRange(num_shards, "_k", "_t")
    else:
        out = out.repartitionByRange("_k", "_t")
    out.sortWithinPartitions("_k", "_t").select("value").write.mode("error").text(path)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ shards back into the index frame. Null-tolerant like
    :func:`..warc.read_wat`: the first two space-separated tokens are
    the key and timestamp, the rest parses under the subset DDL —
    foreign fields are ignored, missing ones read NULL, a junk line
    yields a row with NULL fields rather than a task kill."""
    raw = spark.read.text(path)
    return raw.select(
        F.regexp_extract("value", r"^(\S+)", 1).alias("surt"),
        F.regexp_extract("value", r"^\S+ (\S+)", 1).alias("timestamp"),
        F.from_json(
            F.regexp_extract("value", r"^\S+ \S+ (.*)$", 1), _CDX_DDL
        ).alias("_j"),
    ).select("surt", "timestamp", "_j.*")


def _seek_chunks(fh, chunk_bytes: int = 1 << 20):
    while True:
        b = fh.read(chunk_bytes)
        if not b:
            return
        yield b


def _fetch_one(path: str, offsets: list[int]):
    """Yield the reader-walk tuples for the records starting at each of
    ``offsets`` in one shard. Uncompressed shards seek straight to each
    offset (local ``open``+``seek`` or a pyarrow.fs random-access
    file); ``.gz`` shards make ONE forward decompression pass from the
    smallest requested offset, walking records continuously and
    emitting exactly the requested ones — interleaved records are
    parsed but never re-decompressed."""
    offsets = sorted(set(offsets))
    if not offsets:
        return
    if not path.endswith(".gz"):
        is_local = "://" not in path or path.startswith("file://")
        if is_local:
            fh = open(_local_file_path(path), "rb")
        else:
            from apache_cassandra_spark.sources.warc import _fs_from_uri

            filesystem, fs_path = _fs_from_uri(path)
            fh = filesystem.open_input_file(fs_path)
        try:
            for off in offsets:
                fh.seek(off)
                for rec in walk_warc_records(_seek_chunks(fh), source_file=path):
                    yield (rec[0], off, *rec[2:])
                    break
        finally:
            fh.close()
        return

    # .gz: offsets address the uncompressed stream — skip to the first
    # requested offset, then walk forward; scanner offsets are relative
    # to the skip point, so wanted records match on first + rec_offset
    first = offsets[0]
    wanted = set(offsets)

    def skipping():
        done = 0
        for chunk in _file_chunks(path):
            if done + len(chunk) <= first:
                done += len(chunk)
                continue
            start = max(0, first - done)
            done += len(chunk)
            yield bytes(chunk[start:])

    for rec in walk_warc_records(skipping(), source_file=path):
        absoff = first + rec[1]
        if absoff in wanted:
            yield (rec[0], absoff, *rec[2:])
            wanted.discard(absoff)
            if not wanted:
                break
        elif absoff > max(wanted, default=-1):
            break


def fetch_warc_records(
    index_rows: DataFrame,
    record_types: tuple[str, ...] = (),
    extra_headers: tuple[str, ...] = (),
) -> DataFrame:
    """Turn index rows — anything with ``filename`` + ``offset``
    columns (:func:`read_cdx` output, :func:`index_warc` output, or a
    join of either against a URL want-list) — back into full
    :func:`..warc.read_warc`-shaped rows by fetching JUST those
    records. Offsets group per shard; each task opens its shard once
    and walks only the requested records; the fetched bytes flow
    through the SAME Spark-side header parse as the full reader
    (``_parse_walked``), so the two surfaces cannot drift.
    ``record_types`` defaults to () — no type filter: the caller
    already chose exact records."""
    import pandas as pd

    sel = (
        index_rows.select("filename", "offset")
        .where(F.col("filename").isNotNull() & F.col("offset").isNotNull())
        .distinct()
        .groupBy("filename")
        .agg(F.sort_array(F.collect_list("offset")).alias("_offs"))
    )

    cols = ["source_file", "record_offset", "headers", "payload", "framing_ok", "parse_error"]

    def _fetch(batches):
        for pdf in batches:
            for fname, offs in zip(pdf["filename"], pdf["_offs"]):
                rows = list(_fetch_one(fname, [int(o) for o in offs]))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    walked = sel.mapInPandas(_fetch, schema=_WALK_SCHEMA)
    return _parse_walked(walked, record_types, extra_headers)
