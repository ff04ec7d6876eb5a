"""Corpus IO: schema-first readers for the formats training corpora
arrive in (JSONL, CSV, Parquet) and a deterministic sharded writer sink.

Reference analog: the engine's external surface for bulk data was
SSTable JSON export/import (``tools/SSTableExport.java:44,108-331``,
``tools/SSTableImport.java``) plus the binary bulk-load path
(``db/BinaryMemtable.java:45``); a Spark corpus pipeline needs the same
two directions — ingest from interchange formats, emit a layout other
systems (and later pipeline stages) can consume predictably.

Scale design:

* **Readers are schema-first.** Schema inference on JSONL/CSV is a full
  extra pass over the data — at 100 TB that is a 100 TB job before the
  first real job. ``read_corpus`` therefore *requires* a schema for
  text formats (Parquet carries its own).
* **The writer's unit of layout is the shard, not the task.** Shard
  membership is a pure md5 function of the shard key, so any engine can
  recompute which shard a document lives in (the audit property:
  "which file would contain doc X?" has a closed-form answer).
  ``partitionBy(shard)`` gives directory-per-shard; ``maxRecordsPerFile``
  bounds individual files so downstream loaders get uniform units no
  matter how skewed the upstream partitioning was.
* **Deterministic file contents**: rows are repartitioned BY the shard
  column then sorted within partitions by the shard key, so re-running
  the writer on the same input produces byte-stable shard contents
  (modulo format-level metadata), which makes corpus builds diffable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# avro is deliberately absent: Spark ships it as an external module
# (spark-avro) that is not on this classpath — listing it here would be
# a stub, not a source format
_FORMATS = ("parquet", "orc", "json", "csv")


def shard_expr(key_col: str, n_shards: int) -> F.Column:
    """Deterministic shard id in [0, n_shards): the engine's shared
    uniform hash (``functions.hashing.uniform_hash`` — one line of ANSI
    SQL, identical arithmetic to the sampling draws by construction)."""
    from apache_cassandra_spark.functions.hashing import uniform_hash

    return uniform_hash(key_col, n_shards)


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    """Load a corpus directory/file. ``schema`` (DDL string) is required
    for json/csv — inference would scan the whole input once just to
    guess types, and guessed types are not a contract."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported corpus format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if fmt in ("parquet", "orc"):
        # self-describing columnar formats: a caller-declared schema is
        # still a contract — apply it so a type drift in the files fails
        # at read time, not three jobs downstream
        reader = reader.schema(schema) if schema is not None else reader
        return getattr(reader, fmt)(path)
    if schema is None:
        raise ValueError(f"{fmt} corpus needs an explicit schema (inference = extra full pass)")
    reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    return reader.json(path)


def write_sharded(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 64,
    rows_per_file: int | None = 1_000_000,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``path/shard=NN/...`` with closed-form shard
    membership (see ``shard_expr``) and bounded file sizes.

    ``repartition(n_shards, shard)`` makes shard the physical shuffle key
    so each output directory is written by as few tasks as possible (no
    tiny-file explosion from every task writing every shard);
    ``sortWithinPartitions`` pins file-content order for reproducible
    builds. ``rows_per_file`` caps individual files via
    ``maxRecordsPerFile`` — uniform load units for downstream readers."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported corpus format {fmt!r}; one of {_FORMATS}")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column (e.g. a corpus read back from "
            "this layout) — drop or rename it; write_sharded recomputes shard "
            "membership from the key and would silently overwrite it"
        )
    out = (
        df.withColumn("shard", shard_expr(key_col, n_shards))
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", key_col)
    )
    writer = out.write.mode("overwrite").partitionBy("shard")
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)
