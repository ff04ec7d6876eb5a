"""Parquet-backed column-family storage in cell layout.

Replaces the reference's storage stack — commitlog
(``db/commitlog/CommitLog.java``), memtable (``db/Memtable.java:62``), and
row-major SSTables (``io/SSTableWriter.java``) — with:

* **delta commits**: each applied MutationBatch is one atomic Parquet
  append (the commit is the WAL; recovery = the files are simply there);
* **memtable analog**: an in-session row buffer, unioned into every read
  until flushed (reads always see their own writes, like the reference's
  memtable+SSTable collation);
* **compaction** (``operators/maintenance.py``) periodically rewrites the
  reconciled view sorted by (key, sc, column) so the file count stays
  bounded and scans read one version per cell.

Layout on disk:

    {root}/{keyspace}/{cf}/cells/        multi-version cell parquet files
    {root}/{keyspace}/{cf}/ctombs/       container (row/sc) tombstones

Scale note: at 100 TB the cells directory would be written partitioned by
a token-derived bucket (see ``compact(zorder_keys=...)``); local tests keep
the flat layout. All reads go through ``CF`` and prune on (key, sc,
column) *before* the reconcile shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_cassandra_spark.catalog import Catalog, CFDef
from apache_cassandra_spark.functions.tokens import Partitioner, RandomPartitioner
from apache_cassandra_spark.model import CF
from apache_cassandra_spark.operators.write import MutationBatch

CELL_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("sc", T.BinaryType(), True),
        T.StructField("column", T.BinaryType(), False),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("ts", T.LongType(), False),
        T.StructField("tombstone", T.BooleanType(), False),
        T.StructField("ldt", T.IntegerType(), True),
    ]
)

CONTAINER_TOMBSTONE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("sc", T.BinaryType(), True),
        T.StructField("ts", T.LongType(), False),
        T.StructField("ldt", T.IntegerType(), False),
    ]
)


class CellStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        catalog: Catalog,
        partitioner: Partitioner | None = None,
        memtable_threshold: int = 100_000,
    ) -> None:
        self.spark = spark
        self.root = root
        self.catalog = catalog
        self.partitioner = partitioner or RandomPartitioner()
        self.memtable_threshold = memtable_threshold
        # memtable analog: pending rows per (ks, cf)
        self._pending: dict[tuple[str, str], MutationBatch] = {}

    # -- paths --------------------------------------------------------------
    def _cells_dir(self, ks: str, cf: str) -> str:
        return os.path.join(self.root, ks, cf, "cells")

    def _ctombs_dir(self, ks: str, cf: str) -> str:
        return os.path.join(self.root, ks, cf, "ctombs")

    # -- write path ----------------------------------------------------------
    def apply(self, ks: str, cf: str, batch: MutationBatch, durable: bool = True) -> None:
        """Apply one mutation batch (≈ ``Table.apply``,
        ``db/Table.java:568-660``). ``durable=True`` commits immediately
        (batch commitlog mode); ``False`` buffers in the memtable analog
        until ``flush`` or the threshold (periodic mode)."""
        if durable:
            self._commit(ks, cf, batch)
            return
        pend = self._pending.setdefault((ks, cf), MutationBatch())
        pend.extend(batch)
        if len(pend.cells) + len(pend.container_tombstones) >= self.memtable_threshold:
            self.flush(ks, cf)

    def flush(self, ks: str | None = None, cf: str | None = None) -> None:
        """Flush memtable analog to Parquet (≈ ``Memtable.flushAndSignal``)."""
        keys = [k for k in self._pending if (ks is None or k[0] == ks) and (cf is None or k[1] == cf)]
        for k in keys:
            self._commit(k[0], k[1], self._pending.pop(k))

    def _domain_split(self, ks: str, cf: str) -> bool:
        return self.catalog.keyspace(ks).cf(cf).domain_split

    def _write_cells(self, ks: str, cf: str, df: DataFrame, single_file: bool = False) -> None:
        if self._domain_split(ks, cf):
            # fork domain-split CFs (CFMetaData.java:49-53): physically
            # partition by the key's domain so point reads prune to 1/256
            from apache_cassandra_spark.functions.tokens import OdklDomainPartitioner

            dom = OdklDomainPartitioner().domain(F.col("key"))
            df.withColumn("_dom", dom).write.mode("append").partitionBy("_dom").parquet(
                self._cells_dir(ks, cf)
            )
            return
        if single_file:
            df = df.coalesce(1)
        df.write.mode("append").parquet(self._cells_dir(ks, cf))

    def _commit(self, ks: str, cf: str, batch: MutationBatch) -> None:
        if batch.cells:
            df = self.spark.createDataFrame(batch.cells, CELL_SCHEMA)
            self._write_cells(ks, cf, df, single_file=True)
        if batch.container_tombstones:
            df = self.spark.createDataFrame(batch.container_tombstones, CONTAINER_TOMBSTONE_SCHEMA)
            df.coalesce(1).write.mode("append").parquet(self._ctombs_dir(ks, cf))

    def bulk_load(self, ks: str, cf: str, cells: DataFrame) -> None:
        """W5 binary/bulk load (``db/BinaryMemtable.java:45``): pre-shaped
        cell DataFrame straight to storage, bypassing the memtable path."""
        shaped = cells.select([F.col(f.name).cast(f.dataType) for f in CELL_SCHEMA.fields])
        self._write_cells(ks, cf, shaped)

    # -- read path -----------------------------------------------------------
    def _read_dir(self, path: str, schema: T.StructType, partitioned: bool = False) -> DataFrame:
        if os.path.isdir(path) and (
            partitioned or any(f.endswith(".parquet") for f in os.listdir(path))
        ):
            if partitioned and not os.listdir(path):
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    def cf(self, ks: str, cf_name: str) -> CF:
        """Bind a CF handle: disk cells ∪ pending memtable rows."""
        cfdef: CFDef = self.catalog.keyspace(ks).cf(cf_name)
        domain = self._domain_split(ks, cf_name)
        cell_schema = CELL_SCHEMA
        if domain:
            cell_schema = T.StructType(list(CELL_SCHEMA.fields) + [T.StructField("_dom", T.StringType(), True)])
        cells = self._read_dir(self._cells_dir(ks, cf_name), cell_schema, partitioned=domain)
        tombs = self._read_dir(self._ctombs_dir(ks, cf_name), CONTAINER_TOMBSTONE_SCHEMA)
        pend = self._pending.get((ks, cf_name))
        if pend is not None:
            if pend.cells:
                pend_cells = self.spark.createDataFrame(pend.cells, CELL_SCHEMA)
                if domain:
                    from apache_cassandra_spark.functions.tokens import OdklDomainPartitioner

                    pend_cells = pend_cells.withColumn("_dom", OdklDomainPartitioner().domain(F.col("key")))
                cells = cells.unionByName(pend_cells)
            if pend.container_tombstones:
                tombs = tombs.unionByName(
                    self.spark.createDataFrame(pend.container_tombstones, CONTAINER_TOMBSTONE_SCHEMA)
                )
        return CF(
            cfdef=cfdef,
            cells=cells,
            container_tombstones=tombs,
            partitioner=self.partitioner,
            keyspace=ks,
            domain_col="_dom" if domain else None,
        )
