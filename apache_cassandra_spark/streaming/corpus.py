"""Streaming corpus ingest → sharded corpus sink.

The streaming twin of ``sources.corpus.write_sharded``: documents arrive
continuously (crawler output, log taps), get their closed-form md5 shard
id, and land in the same ``shard=NN`` directory layout batch consumers
already read — so a corpus can be *grown* incrementally and every batch
operator in this repo (dedup, decontamination, packing) runs over the
accumulating result unchanged.

Exactly-once: the file sink is Spark's transactional one (manifest-based
commit log per micro-batch), and checkpoint replay re-emits only
uncommitted batches — the same recovery contract as the cellstore ingest
(``streaming/ingest.py``), which mirrors the reference's commitlog
``recover()``.

Scale: shard assignment is a pure projection (no shuffle in the
micro-batch plan unless ``coalesce_files`` asks for it); ``partitionBy``
splits files per shard directory. At 1000 executors each micro-batch
appends in parallel; file counts stay bounded by (batches × tasks) per
shard — run ``sources.corpus.write_sharded`` over the accumulated
directory when a final compacted layout is wanted (the same
minor-vs-major compaction split as the cell store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from apache_cassandra_spark.sources.corpus import shard_expr


def document_stream(
    spark: SparkSession, source_dir: str, schema: str, fmt: str = "json"
) -> DataFrame:
    """File-source document stream — schema-first like ``read_corpus``
    (a stream can never afford an inference pass: the data isn't all
    there yet)."""
    reader = spark.readStream.schema(schema)
    if fmt == "json":
        return reader.json(source_dir)
    if fmt == "csv":
        return reader.option("header", "true").csv(source_dir)
    raise ValueError(f"unsupported stream format {fmt!r}")


def stream_to_shards(
    docs: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    n_shards: int = 64,
    rows_per_file: int | None = 1_000_000,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously append the document stream into the sharded layout.

    Shard membership is identical to the batch writer's (``shard_expr``),
    so batch and streaming writes into the same root compose: a document
    lands in the same ``shard=NN`` whichever path wrote it."""
    if "shard" in docs.columns:
        raise ValueError(
            "stream already has a 'shard' column — drop or rename it; "
            "stream_to_shards recomputes shard membership from the key"
        )
    out = docs.withColumn("shard", shard_expr(key_col, n_shards))
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("shard")
    )
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
