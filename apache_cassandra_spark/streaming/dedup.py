"""Streaming deduplication for ingest pipelines.

A training-data ingest stream wants exactly the batch dedup semantics
(``analytics.dedup.exact_dedup``) applied incrementally: the first
arrival of a content hash passes, every later duplicate is dropped, even
across micro-batches. Structured Streaming has a native stateful
operator for precisely this — ``dropDuplicates`` (unbounded state) /
``dropDuplicatesWithinWatermark`` (state expired by the event-time
watermark) — so the implementation is a hash projection plus the
built-in operator, no custom state code.

Scale: state per distinct document is one 128-bit hash key in the state
store, not the document body; with an event-time watermark the store
holds only the lateness horizon. The same function works on a batch
DataFrame (Spark collapses ``dropDuplicates`` to a hash aggregate),
which is how the equivalence test pins streaming == batch output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: unit-separator joint hash — same content key as dedup.exact_dedup
def content_hash(cols: Sequence[str]) -> Column:
    return F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))


def dedup_stream(
    docs: DataFrame,
    content_cols: Sequence[str] = ("text",),
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup over a (possibly streaming) frame.

    With ``event_time_col`` set on a streaming frame, duplicates are only
    suppressed within the watermark horizon and state is garbage-collected
    past it (``dropDuplicatesWithinWatermark``) — the unbounded-state
    default is correct for bounded backfills, the watermarked form for
    always-on ingest.
    """
    hashed = docs.withColumn("content_hash", content_hash(content_cols))
    if event_time_col is not None and hashed.isStreaming:
        return hashed.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def dedup_ingest_foreach_batch(
    stream_docs: DataFrame,
    out_dir: str,
    ref_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Continuous-ingest dedup with a DURABLE reference: every
    micro-batch is deduped against the on-disk content-hash table of
    everything ever accepted (``dedup.dedup_against_reference``,
    ``ref_hashed=True`` probe shape), survivors append to ``out_dir``
    and their hashes append to ``ref_dir`` — so the NEXT batch (and the
    next *query*, after a restart or a rebuilt checkpoint) sees them.

    This is the other half of :func:`dedup_stream`: ``dropDuplicates``
    state lives inside one query's checkpoint — rebuild the checkpoint
    or start a second pipeline and the history is gone. Here the
    reference outlives the query (it is a plain parquet table any batch
    job can also read/extend), which is the "dedup today's crawl
    against ALL prior crawls" contract of a production corpus.

    foreachBatch = the reference's group-committed WAL segment
    (streaming/ingest.py's mapping): both appends happen inside one
    batch function; both sinks are partitioned by a deterministic
    ``_commit`` token (derived from the streaming query id persisted in
    the checkpoint, per batch) and written with
    DYNAMIC PARTITION OVERWRITE, so Spark's batch-id replay after a
    crash overwrites the same partitions instead of appending twice —
    plain parquet append is NOT an exactly-once sink, the
    idempotent-partition recipe is (round-8 review). The reference
    read excludes the replaying batch's OWN partition: otherwise a
    crash after the hash write but before the checkpoint commit would
    make the replay anti-join the batch against itself and overwrite
    its output with nothing. Within a batch the min-id
    winner rule applies (exact_dedup's rule); across batches
    first-arrival wins by construction.

    Scale: the batch side is one anti-join probe against the hash
    table (AQE-decided, no broadcast hint — the reference is
    corpus-cardinality) plus the in-batch hash aggregate; the reference
    append is hash-only (16 bytes/doc, not the body). Returns the
    started StreamingQuery.
    """
    from apache_cassandra_spark.analytics.dedup import dedup_against_reference

    hash_schema = "content_hash string, _commit string"

    def dedupe(batch: DataFrame, ref: DataFrame) -> DataFrame:
        return dedup_against_reference(
            batch, ref, text_col=text_col, id_col=id_col, ref_hashed=True
        )

    return _durable_ingest_loop(
        stream_docs,
        out_dir,
        ref_dir,
        checkpoint_dir,
        ref_schema=hash_schema,
        dedupe=dedupe,
        ref_select=lambda kept: kept.select("content_hash").distinct(),
    )


def url_dedup_ingest_foreach_batch(
    stream_docs: DataFrame,
    out_dir: str,
    ref_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] | None = None,
):
    """URL-level continuous-ingest dedup with a durable reference — the
    re-crawl front door as a stream: every micro-batch canonicalizes its
    URLs (``web.with_url_keys``), keeps the min-id winner per canonical
    URL in-batch, anti-joins against the on-disk canonical-URL table of
    everything ever accepted, and appends survivors + their canonical
    URLs under the same idempotent commit-token recipe as
    :func:`dedup_ingest_foreach_batch` (query-id-derived partition
    token, dynamic partition overwrite, self-partition-excluding
    reference read). First capture of a URL wins across batches by
    construction; within a batch the min-id convention matches
    ``web.dedup_urls``.

    NULL url / NULL id rows are DROPPED, not ingested: a NULL canonical
    URL can never anti-join (one url-less duplicate would be admitted
    per batch forever) and NULL ids invert the min-id winner order.
    This operator is the URL-identity front door — url-less documents
    (direct uploads, API-sourced) don't belong in it; route them through
    :func:`dedup_ingest_foreach_batch` (content identity) instead, or
    pre-split the stream. The drop is a documented contract, pinned by
    test, not a silent filter buried in the plan.

    Scale: the probe is one AQE-decided anti-join on the canonical URL
    (reference is corpus-cardinality — never broadcast); the reference
    append is the canonical URL string only, not the document body."""
    from apache_cassandra_spark.analytics import web

    kwargs = {} if tracking_params is None else {"tracking_params": tracking_params}
    ref_schema = "canonical_url string, _commit string"

    def dedupe(batch: DataFrame, ref: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        # NULL url / NULL id rows are dropped up front: a NULL canonical
        # URL never anti-joins (one url-less dup would be admitted per
        # batch forever, plus a dead NULL reference row per commit), and
        # NULL ids sort FIRST under the ascending winner window — both
        # conventions match dedup_against_reference (NULL-id drop) and
        # web.dedup_urls (F.min skips NULLs)
        batch = batch.where(F.col(url_col).isNotNull() & F.col(id_col).isNotNull())
        keyed = web.with_url_keys(batch, url_col, **kwargs)
        fresh = keyed.join(ref.select("canonical_url"), "canonical_url", "left_anti")
        # min-id winner per canonical URL (WindowGroupLimit pre-truncates;
        # batch-sized input, never the corpus)
        w = Window.partitionBy("canonical_url").orderBy(F.col(id_col))
        return (
            fresh.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "host", "domain")
        )

    return _durable_ingest_loop(
        stream_docs,
        out_dir,
        ref_dir,
        checkpoint_dir,
        ref_schema=ref_schema,
        dedupe=dedupe,
        # already unique per canonical_url (the winner window) — no
        # distinct re-shuffle on the per-batch hot path
        ref_select=lambda kept: kept.select("canonical_url"),
    )


def _durable_ingest_loop(
    stream_df: DataFrame,
    out_dir: str,
    ref_dir: str,
    checkpoint_dir: str,
    ref_schema: str,
    dedupe,
    ref_select,
):
    """Shared durable-reference ingest skeleton (content-hash and
    canonical-URL variants): per micro-batch, read the reference
    EXCLUDING this batch's own commit partition (null-safe — legacy
    rows with NULL _commit are history), run ``dedupe(batch, ref)``,
    then write survivors and ``ref_select(kept)`` rows under one
    deterministic commit token with dynamic partition overwrite.

    The partition token must be (a) DETERMINISTIC across restarts of
    the same query so a replayed batch overwrites the crashed
    partition, and (b) DISTINCT across queries so a new pipeline
    neither collides with nor excludes history. Hashing the checkpoint
    PATH satisfies neither edge (r8 review): a rebuilt checkpoint at
    the same path would collide with history (replay-excluding and
    OVERWRITING old partitions), and a respelled-but-equivalent path
    would break replay idempotence. The streaming query's own id —
    Spark writes it to <checkpoint>/metadata at first start, reuses
    it on every restart, and mints a new one for a rebuilt checkpoint
    — is exactly the identity wanted, read lazily since the file only
    exists once the query is running (commit() always runs after)."""
    import json

    from pyspark.errors import AnalysisException  # the BASE class — the
    # captured-submodule one misses Spark Connect's subclass (r8 review)

    spark = stream_df.sparkSession
    token_cell: list[str] = []

    def _qtoken() -> str:
        if not token_cell:
            raw = "\n".join(
                r["value"]
                for r in spark.read.text(f"{checkpoint_dir}/metadata").collect()
            )
            token_cell.append(json.loads(raw)["id"].replace("-", "")[:16])
        return token_cell[0]

    def commit(batch: DataFrame, batch_id: int) -> None:
        commit_id = f"{_qtoken()}-{batch_id:012d}"
        try:
            ref = (
                spark.read.schema(ref_schema)
                .parquet(ref_dir)
                # null-safe: legacy/external rows with a NULL _commit are
                # HISTORY, not a replayed self — plain != would silently
                # drop them from the reference (r8 review)
                .where(~F.col("_commit").eqNullSafe(F.lit(commit_id)))
            )
        except AnalysisException as e:
            # ONLY the genuine first-batch case may fall through to an
            # empty reference — any other read failure (transient FS
            # error, corrupt footer) must fail the batch, not silently
            # admit every historical duplicate (round-8 review)
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            ref = spark.createDataFrame([], ref_schema)
        kept = dedupe(batch, ref)
        # one deterministic materialization feeds both writes
        kept = kept.localCheckpoint(eager=True)
        (
            kept.withColumn("_commit", F.lit(commit_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_commit")
            .parquet(out_dir)
        )
        (
            ref_select(kept)
            .withColumn("_commit", F.lit(commit_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_commit")
            .parquet(ref_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
