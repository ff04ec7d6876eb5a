"""Probabilistic existence probes (fork operators).

Reference: ``db/filter/FastRowMayExistQueryFilter.java:27-107`` (row bloom
probe, no data read) and ``db/filter/ColumnsMayExistQueryFilter.java:28-156``
(memtable + column bloom filters only). The contract is one-sided: false
positives allowed, false negatives not.

Spark-first realization: the probe is a semi-join against the *raw* cell
table — no reconcile, no tombstone resolution — so, like the reference, it
may report a deleted row/column as present (stale positive) but never
misses live data. Parquet-level bloom filters + row-group stats (written
by ``maintenance.compact`` for ``bloom_columns`` CFs) make the underlying
scan skip data pages, which is the storage-level analog of the SSTable
bloom check (``io/SSTableReader.java`` ``mayPresent``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_cassandra_spark.model import CF


def rows_may_exist(cf: CF, keys: list[str]) -> DataFrame:
    """For each probe key: may a row exist? -> (key, may_exist boolean)."""
    spark = cf.cells.sparkSession
    probes = spark.createDataFrame([(k,) for k in keys], "key string")
    present = cf.cells.select("key").where(F.col("key").isin(list(keys))).distinct()
    return (
        probes.join(present.withColumn("may_exist", F.lit(True)), "key", "left")
        .select("key", F.coalesce("may_exist", F.lit(False)).alias("may_exist"))
    )


def columns_may_exist(cf: CF, key: str, names: list[bytes]) -> DataFrame:
    """For each probe column name of one row: may the cell exist?
    -> (column, may_exist)."""
    spark = cf.cells.sparkSession
    probes = spark.createDataFrame([(bytearray(n),) for n in names], "column binary")
    present = (
        cf.cells.where(F.col("key") == key)
        .where(F.col("column").isin([bytearray(n) for n in names]))
        .select("column")
        .distinct()
        .withColumn("may_exist", F.lit(True))
    )
    return probes.join(present, "column", "left").select(
        "column", F.coalesce("may_exist", F.lit(False)).alias("may_exist")
    )
