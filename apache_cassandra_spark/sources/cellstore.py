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

import hashlib
import json
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
        # warm row caches primed from saved-caches files:
        # (ks, cf) -> (hot key set, persisted reconciled live view)
        self._row_caches: dict[tuple[str, str], tuple[frozenset, DataFrame]] = {}

    # -- paths --------------------------------------------------------------
    def _cells_dir(self, ks: str, cf: str) -> str:
        return os.path.join(self.root, ks, cf, "cells")

    def _ctombs_dir(self, ks: str, cf: str) -> str:
        return os.path.join(self.root, ks, cf, "ctombs")

    def _saved_cache_path(self, ks: str, cf: str) -> str:
        return os.path.join(self.root, ks, cf, "SAVED_CACHES.json")

    # -- saved caches (warm start) -------------------------------------------
    #
    # ``db/ColumnFamilyStore.java:213-311``: the reference persists the row
    # cache's hot KEY LIST (not the data) and on startup initRowCache()
    # re-reads it and re-caches each key against the freshly loaded
    # SSTables. Same contract here: the JSON file carries only keys; a
    # fresh store binding re-reconciles those keys from current storage and
    # pins the result, so the warm cache is never stale data — staleness of
    # the KEY LIST just means warming a slightly old hot set.

    def save_row_cache(self, ks: str, cf_name: str, keys=None) -> None:
        """Persist the hot-key list (``submitRowCacheWrite`` /
        ``readSavedCache`` analog — sorted on write, the price the
        reference pays on read) and prime the in-session cache. With
        ``keys=None``, re-saves the currently primed set (the
        periodic-save-task analog used by snapshot/compact)."""
        if keys is None:
            ent = self._row_caches.get((ks, cf_name))
            if ent is None:
                return
            keys = ent[0]
        keys = sorted(set(keys))
        path = self._saved_cache_path(ks, cf_name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(keys, fh)
        os.replace(tmp, path)
        # an explicit NEW key set replaces any primed cache; a keys=None
        # re-save leaves the primed (still-valid) cache alone
        if keys != sorted(self._row_caches.get((ks, cf_name), ((),))[0]):
            self.invalidate_row_cache(ks, cf_name)

    def invalidate_row_cache(self, ks: str, cf_name: str) -> None:
        """Drop the primed cache (reference: invalidate on mutation /
        compaction). The saved key list stays — the next ``cf()`` bind
        re-reconciles those keys from current storage."""
        ent = self._row_caches.pop((ks, cf_name), None)
        if ent is not None:
            ent[1].unpersist()

    def _primed_row_cache(self, ks: str, cf_name: str, handle: CF):
        ent = self._row_caches.get((ks, cf_name))
        if ent is not None:
            return ent
        path = self._saved_cache_path(ks, cf_name)
        if not os.path.isfile(path):
            return None
        with open(path) as fh:
            keys = json.load(fh)
        if not keys:
            return None
        from pyspark import StorageLevel

        from apache_cassandra_spark.functions.reconcile import live_view

        if len(keys) <= 1000:
            key_pred = F.col("key").isin(keys)
            cells = handle.cells.where(key_pred)
            tombs = handle.container_tombstones
            if tombs is not None:
                tombs = tombs.where(key_pred)
        else:
            # large hot sets: a literal In() of 10^5 keys bloats the plan —
            # semi-join against a broadcast key frame instead (the list is
            # driver-bounded by construction: these keys WERE cached rows)
            key_df = F.broadcast(self.spark.createDataFrame([(k,) for k in keys], "key string"))
            cells = handle.cells.join(key_df, "key", "semi")
            tombs = handle.container_tombstones
            if tombs is not None:
                tombs = tombs.join(key_df, "key", "semi")
        lv = live_view(
            cells, tombs, with_sc_level=handle.is_super, pre_reconciled=handle.pre_reconciled
        ).persist(StorageLevel.MEMORY_AND_DISK)
        ent = (frozenset(keys), lv)
        self._row_caches[(ks, cf_name)] = ent
        return ent

    # -- compacted bucketed table (the intended 100 TB read layout) ----------
    #
    # Major compaction persists its output as a *bucketed catalog table*
    # (bucketBy(key) + sortBy(key, sc, column)) instead of plain files, so
    # the scan reports HashPartitioning(key) and post-compaction reads run
    # with no shuffle exchange: the reconcile aggregate is skipped outright
    # (one version per coordinate — see CF.pre_reconciled) and the slice
    # windows' ClusteredDistribution(key) is satisfied by the scan itself.
    # A JSON pointer file records (gen, table, path, buckets); a fresh
    # session re-registers the table from it via DDL.

    def _compacted_meta_path(self, ks: str, cf: str) -> str:
        return os.path.join(self.root, ks, cf, "COMPACTED.json")

    def compacted_meta(self, ks: str, cf: str) -> dict | None:
        p = self._compacted_meta_path(ks, cf)
        if not os.path.isfile(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def write_compacted_meta(self, ks: str, cf: str, meta: dict) -> None:
        p = self._compacted_meta_path(ks, cf)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, p)  # atomic pointer flip

    def compacted_table_name(self, ks: str, cf: str, gen: int) -> str:
        h = hashlib.md5(f"{os.path.abspath(self.root)}/{ks}/{cf}".encode()).hexdigest()[:10]
        return f"cass_compacted_{h}_g{gen}"

    def _compacted_df(self, meta: dict) -> DataFrame:
        """spark.table over the compacted generation, re-registering the
        bucketed table from the pointer if this session hasn't seen it."""
        name = meta["table"]
        if not self.spark.catalog.tableExists(name):
            cols = (
                "key STRING, sc BINARY, `column` BINARY, value BINARY, "
                "ts BIGINT, tombstone BOOLEAN, ldt INT"
            )
            self.spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET "
                f"CLUSTERED BY (key) SORTED BY (key, sc, `column`) "
                f"INTO {meta['buckets']} BUCKETS LOCATION '{meta['path']}'"
            )
        return self.spark.table(name)

    # -- write path ----------------------------------------------------------
    def apply(self, ks: str, cf: str, batch: MutationBatch, durable: bool = True) -> None:
        """Apply one mutation batch (≈ ``Table.apply``,
        ``db/Table.java:568-660``). ``durable=True`` commits immediately
        (batch commitlog mode); ``False`` buffers in the memtable analog
        until ``flush`` or the threshold (periodic mode)."""
        self.invalidate_row_cache(ks, cf)  # reference: invalidate on mutation
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
        # a cf() bind between apply(durable=False) and flush can re-prime
        # the warm cache from RAW pending cells; the commit (which may drop
        # cells via the flush chain) must invalidate it again
        self.invalidate_row_cache(ks, cf)
        cells = batch.cells
        if cells:
            cells = self._apply_flush_processors(ks, cf, cells)
        if cells:
            df = self.spark.createDataFrame(cells, CELL_SCHEMA)
            self._write_cells(ks, cf, df, single_file=True)
        if batch.container_tombstones:
            df = self.spark.createDataFrame(batch.container_tombstones, CONTAINER_TOMBSTONE_SCHEMA)
            df.coalesce(1).write.mode("append").parquet(self._ctombs_dir(ks, cf))

    def _apply_flush_processors(self, ks: str, cf: str, cells: list) -> list:
        """Run the CF's flush-capable row-processor chain over the cells
        being flushed (``db/Memtable.java:165-187``: the chain is applied
        per row between the memtable and the SSTable, so a dropping
        processor's cells never become visible to raw-cell probes or
        range-ghost candidacy — previously they survived until the next
        compaction, a real divergence window vs the reference).

        The memtable analog is driver-resident (a MutationBatch of python
        rows, bounded by ``memtable_threshold``), so this is a driver-side
        pandas pass over exactly the rows the reference's single-threaded
        ``writeSortedContents`` walks — no Spark job. Only processors
        registered ``process_incomplete=True`` participate (see
        ``maintenance.flush_chain``); chain order is CFDef declaration
        order with non-participants skipped in place. Container
        tombstones are row-deletion metadata, not cells — the reference
        chain sees them only as the CF's deletion info, and they commit
        unprocessed here too."""
        from apache_cassandra_spark.operators import maintenance

        cfdef = self.catalog.keyspace(ks).cf(cf)
        if not cfdef.row_processors:
            return cells
        chain = maintenance.flush_chain(cfdef)
        if chain is None:
            return cells
        import pandas as pd

        pdf = pd.DataFrame(cells, columns=CELL_SCHEMA.fieldNames())

        def clean(row: tuple) -> tuple:
            # undo pandas' nullable-int → float64/NaN coercion (ldt) so the
            # tuples re-enter createDataFrame(CELL_SCHEMA) unchanged
            key, sc, column, value, ts, tombstone, ldt = row
            return (
                key,
                None if sc is None or sc is pd.NA else sc,
                column,
                None if value is None or value is pd.NA else value,
                int(ts),
                bool(tombstone),
                None if pd.isna(ldt) else int(ldt),
            )

        cols = CELL_SCHEMA.fieldNames()
        out = []
        for _, group in pdf.groupby("key", sort=False):
            res = chain(group)
            if res is not None and len(res):
                # processors may reorder/add columns; the contract (same as
                # the compaction path's applyInPandas schema) is CELL_SCHEMA
                out.extend(clean(t) for t in res[cols].itertuples(index=False, name=None))
        return out

    def bulk_load(self, ks: str, cf: str, cells: DataFrame) -> None:
        """W5 binary/bulk load (``db/BinaryMemtable.java:45``): pre-shaped
        cell DataFrame straight to storage, bypassing the memtable path."""
        self.invalidate_row_cache(ks, cf)
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

    def _has_parquet(self, path: str) -> bool:
        return os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))

    def cf(self, ks: str, cf_name: str) -> CF:
        """Bind a CF handle: compacted table ∪ delta cells ∪ pending memtable.

        When the compacted bucketed table is the *only* source (no delta
        files since compaction, nothing pending), the CF is marked
        ``pre_reconciled``: reads skip the LWW aggregate and run
        exchange-free off the bucketed scan."""
        cfdef: CFDef = self.catalog.keyspace(ks).cf(cf_name)
        domain = self._domain_split(ks, cf_name)
        cell_schema = CELL_SCHEMA
        if domain:
            cell_schema = T.StructType(list(CELL_SCHEMA.fields) + [T.StructField("_dom", T.StringType(), True)])
        meta = None if domain else self.compacted_meta(ks, cf_name)
        parts: list[DataFrame] = []
        if meta is not None:
            parts.append(self._compacted_df(meta))
        cells_dir = self._cells_dir(ks, cf_name)
        has_delta = (
            os.path.isdir(cells_dir) and bool(os.listdir(cells_dir))
            if domain
            else self._has_parquet(cells_dir)
        )
        if has_delta:
            parts.append(self._read_dir(cells_dir, cell_schema, partitioned=domain))
        # container tombstones: bind None (not an empty frame) when no row/sc
        # deletes exist, so the read path skips the watermark joins entirely —
        # a CF with no container deletes pays nothing for the feature
        tombs: DataFrame | None = None
        if self._has_parquet(self._ctombs_dir(ks, cf_name)):
            tombs = self._read_dir(self._ctombs_dir(ks, cf_name), CONTAINER_TOMBSTONE_SCHEMA)
        pend = self._pending.get((ks, cf_name))
        if pend is not None:
            if pend.cells:
                pend_cells = self.spark.createDataFrame(pend.cells, CELL_SCHEMA)
                if domain:
                    from apache_cassandra_spark.functions.tokens import OdklDomainPartitioner

                    pend_cells = pend_cells.withColumn("_dom", OdklDomainPartitioner().domain(F.col("key")))
                parts.append(pend_cells)
            if pend.container_tombstones:
                pend_tombs = self.spark.createDataFrame(
                    pend.container_tombstones, CONTAINER_TOMBSTONE_SCHEMA
                )
                tombs = pend_tombs if tombs is None else tombs.unionByName(pend_tombs)
        if not parts:
            cells = self.spark.createDataFrame([], cell_schema)
        else:
            cells = parts[0]
            for p in parts[1:]:
                cells = cells.unionByName(p)
        handle = CF(
            cfdef=cfdef,
            cells=cells,
            container_tombstones=tombs,
            partitioner=self.partitioner,
            keyspace=ks,
            domain_col="_dom" if domain else None,
            pre_reconciled=meta is not None and len(parts) == 1,
        )
        warm = self._primed_row_cache(ks, cf_name, handle)
        if warm is not None:
            handle.row_cache_keys, handle.row_cache = warm[0], warm[1]
        return handle
