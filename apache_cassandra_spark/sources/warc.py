"""WET (WARC text-conversion) record ingest — the Common Crawl corpus
interchange format a web-scale training pipeline reads first.

A WET file (ISO 28500 WARC, ``conversion`` records) is a concatenation
of::

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Target-URI: http://example.com/page\\r\\n
    WARC-Date: 2013-01-01T00:00:00Z\\r\\n
    Content-Length: 12\\r\\n
    \\r\\n
    hello corpus
    \\r\\n\\r\\n

:func:`read_wet` splits records DISTRIBUTEDLY with Spark's multi-char
``lineSep`` text reader (Hadoop ``TextInputFormat`` handles delimiters
spanning block boundaries, so a 10 GB .wet shard parallelizes across
its blocks without any whole-file read) and parses headers/payload with
codegen regexp expressions — map-only, no UDF, no shuffle.

Framing contract (documented, not silently wrong): record boundaries
are recovered by splitting on ``WARC/1.0\\r\\n`` rather than walking
``Content-Length`` byte offsets (a sequential scan Spark cannot
parallelize). Two consequences, both surfaced in the ``framing_ok``
column instead of corrupting silently:

- a payload that itself contains ``WARC/1.0\\r\\n`` splits early — the
  HEAD fragment's re-computed length disagrees with the declared
  ``Content-Length`` → ``framing_ok = false``; the TAIL fragment has no
  WARC headers at all, so it is dropped entirely by the
  ``warc_type != ''`` filter (record counts change without a flagged
  row for the tail — only the head is flagged);
- payload-trailing CRLFs are indistinguishable from the record
  separator and are trimmed — again flagged via the length check.

Real Common Crawl WET payloads are extracted text (no WARC headers
inside), so ``framing_ok`` is true in practice; filter on it to be
exact. The binary-payload WARC variant (``response`` records carrying
arbitrary bytes) genuinely requires length-walking and is out of scope
for a text pipeline — use the archived WET sidecar, which is what this
reader targets.

Reference parity note: the reference fork has no crawl-ingest
machinery — this source extends the engine for the LLM-pipeline
mandate; downstream it feeds :mod:`..analytics.html` /
:mod:`..analytics.web` / :mod:`..analytics.text`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: record-start delimiter; also what read_wet splits on
RECORD_MAGIC = "WARC/1.0\r\n"

_HEADERS_RE = r"(?s)^(.*?)\r\n\r\n"
_PAYLOAD_RE = r"(?s)^.*?\r\n\r\n(.*)$"


def _header(headers, name: str):
    """Case-insensitive ``Name: value`` lookup inside a header block.
    ``[ \\t]*``, NOT ``\\s*``: ``\\s`` would cross the CRLF after an
    empty-valued header and capture the NEXT header line as the
    value."""
    return F.trim(F.regexp_extract(headers, rf"(?im)^{name}:[ \t]*([^\r\n]*)", 1))


def read_wet(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
) -> DataFrame:
    """Read WET records into
    ``(warc_type, target_uri, warc_date, content_length, text,
    framing_ok)``.

    ``record_types`` keeps only the named WARC types (default: the text
    ``conversion`` records — the leading per-file ``warcinfo`` record
    drops); pass ``()`` to keep everything. ``content_length`` is the
    DECLARED header value; ``framing_ok`` compares it against the
    recovered payload's UTF-8 byte length (see module docstring)."""
    return parse_wet_records(
        spark.read.text(path, lineSep=RECORD_MAGIC), record_types=record_types
    )


def read_wet_stream(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """:func:`read_wet` as a Structured Streaming source — the
    continuous crawl front door: new .wet shards landing in ``path``
    are split, parsed, and emitted incrementally (file-stream source,
    so exactly-once per shard via the checkpointed file log). The
    SAME parse expressions as the batch reader (shared through
    :func:`parse_wet_records`), so stream and batch cannot drift;
    downstream compose the html/web operators and the durable
    streaming dedup ingest unchanged — they are stateless per-row
    projections. ``max_files_per_trigger`` bounds each micro-batch."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_wet_records(
        reader.text(path, lineSep=RECORD_MAGIC), record_types=record_types
    )


def parse_wet_records(
    raw: DataFrame,
    record_types: tuple[str, ...] = ("conversion",),
) -> DataFrame:
    """Shared WET parse over a ``value``-column text DataFrame (batch
    or streaming) — one codegen projection, no shuffle."""
    headers = F.regexp_extract("value", _HEADERS_RE, 1)
    payload = F.regexp_extract("value", _PAYLOAD_RE, 1)
    text = F.regexp_replace(payload, r"(\r\n)+$", "")
    out = (
        raw.select(
            _header(headers, "WARC-Type").alias("warc_type"),
            _header(headers, "WARC-Target-URI").alias("target_uri"),
            _header(headers, "WARC-Date").alias("warc_date"),
            # try_cast: a missing header extracts '' and must become
            # NULL, not an ANSI cast error that kills the scan
            F.regexp_extract(headers, r"(?im)^Content-Length:[ \t]*(\d+)", 1)
            .try_cast("long")
            .alias("content_length"),
            text.alias("text"),
        )
        # the split's leading empty chunk (file starts with the magic)
        # parses to an all-empty row — drop it by its missing type
        .where(F.col("warc_type") != "")
        # coalesce: a missing/non-numeric Content-Length is NULL after
        # the cast, and NULL == n is NULL — corruption accounting
        # (~framing_ok, groupBy) must see false, not a silent NULL
        .withColumn(
            "framing_ok",
            F.coalesce(
                F.octet_length("text") == F.col("content_length"), F.lit(False)
            ),
        )
    )
    if record_types:
        out = out.where(F.col("warc_type").isin(*record_types))
    return out


def write_wet(
    df: DataFrame,
    path: str,
    uri_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    default_date: str = "2013-01-01T00:00:00Z",
) -> None:
    """Write a corpus as WET ``conversion`` records (fixture generation
    and interchange export — the inverse of :func:`read_wet`).

    ``Content-Length`` is the payload's UTF-8 byte length. Each task
    writes an independent part file that starts with its own record
    magic, so the sharded output is itself a valid concatenated WET set
    (the format is concatenation-closed — exactly why Common Crawl
    ships it in resumable chunks). One map-only projection into the
    text sink; rows with a NULL URI or NULL text are dropped up front
    (a record without a target or payload is unframeable). A NULL
    ``date_col`` value falls back to ``default_date`` instead — a
    missing date must not silently NULL the whole concat and vanish
    the record from the text sink.

    URI and date values are sanitized of CR/LF before entering the
    header block: a bare ``\\r\\n`` inside a URI would otherwise inject
    a spoofed header line, silently truncating the read-back
    ``target_uri`` while ``framing_ok`` can remain true (the
    Content-Length still parses) — the classic header-injection shape,
    stripped rather than trusted."""
    strip_crlf = lambda c: F.regexp_replace(c, r"[\r\n]", "")  # noqa: E731
    date = (
        strip_crlf(F.coalesce(F.col(date_col), F.lit(default_date)))
        if date_col
        else F.lit(default_date)
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        strip_crlf(F.col(uri_col)),
        F.lit("\r\nWARC-Date: "),
        date,
        F.lit("\r\nContent-Length: "),
        F.octet_length(F.col(text_col)).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(text_col),
        F.lit("\r\n"),
    )
    (
        df.where(F.col(uri_col).isNotNull() & F.col(text_col).isNotNull())
        .select(record.alias("value"))
        # the writer's lineSep supplies the record's second trailing
        # CRLF, completing the \r\n\r\n separator before the next magic
        .write.option("lineSep", "\r\n")
        .mode("overwrite")
        .text(path)
    )
