"""Maintenance operators: compaction, tombstone GC, row processors,
cleanup, snapshot/export (SURVEY.md §2.5).

The reference's size-tiered compaction (``db/CompactionManager.java:87-131,
282-375``) k-way-merges SSTables, reconciles rows, and purges GC-able
tombstones. Ours is one declarative rewrite: reconciled ``gc_view`` ->
sorted, bucketed Parquet. There is no bucketing *scheduler* to port —
bounded file count is the invariant, and a single rewrite restores it.

``IRowProcessor`` (fork UDF hook, ``db/proc/IRowProcessor.java:36-76``,
invoked at flush/compaction ``db/Memtable.java:165-187``,
``io/CompactionIterator.java:140-156``) maps to ``applyInPandas`` over
whole-row groups — the one place Python-side code belongs, Arrow-batched.
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_cassandra_spark.functions.reconcile import gc_view
from apache_cassandra_spark.sources.cellstore import CELL_SCHEMA, CONTAINER_TOMBSTONE_SCHEMA, CellStore

#: IRowProcessor analog: pandas frame of one row's cells -> transformed
#: frame (empty frame == drop the row, mirroring "return null")
RowProcessor = Callable[[pd.DataFrame], pd.DataFrame]


def _swap_dir(tmp: str, final: str) -> None:
    """Local-FS atomic-ish swap. On an object store this would be a
    manifest/metadata commit (Delta/Iceberg-style); the operator contract
    is the same: readers see the old or the new fileset, never a mix."""
    old = final + ".old"
    if os.path.isdir(final):
        os.rename(final, old)
    os.rename(tmp, final)
    if os.path.isdir(old):
        shutil.rmtree(old)


def compact(
    store: CellStore,
    ks: str,
    cf_name: str,
    gc_grace_seconds: int | None = None,
    now: int | None = None,
    row_processor: RowProcessor | None = None,
    key_pred=None,
    buckets: int | None = None,
) -> None:
    """Major compaction (``CompactionManager.submitMajor:192-225``): rewrite
    the CF as its reconciled view with tombstone GC applied.

    * tombstones older than ``now - gcGraceSeconds`` are purged; younger
      ones kept (late writes must still lose to them) — exactly
      ``removeDeleted`` + ``CompactionManager.java:676``.
    * ``key_pred`` turns this into anti-compaction/cleanup
      (``doAntiCompaction:413-452``): only matching rows are kept.
    * output is hash-bucketed by key and sorted by (key, sc, column) inside
      each bucket — scans get clustered rows, point reads prune buckets.
    """
    store.flush(ks, cf_name)
    cf = store.cf(ks, cf_name)
    cfdef = cf.cfdef
    if gc_grace_seconds is None:
        gc_grace_seconds = cfdef.gc_grace_seconds
    if now is None:
        now = int(time.time())
    gc_before = now - gc_grace_seconds

    cells = cf.cells if key_pred is None else cf.cells.where(key_pred)
    tombs = cf.container_tombstones
    out = gc_view(cells, tombs, gc_before)

    if row_processor is None and cfdef.row_processors:
        procs = [get_row_processor(n) for n in cfdef.row_processors]

        def chained(pdf: pd.DataFrame) -> pd.DataFrame:
            # RowProcessorChain semantics (db/proc/RowProcessorChain.java):
            # each processor sees the previous one's output; null drops the row
            for p in procs:
                if pdf is None or len(pdf) == 0:
                    break
                pdf = p(pdf)
            return pdf

        row_processor = chained

    if row_processor is not None:
        proc = row_processor

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            res = proc(pdf)
            return pdf.iloc[0:0] if res is None else res

        out = out.groupBy("key").applyInPandas(run, CELL_SCHEMA)

    n_buckets = buckets or max(1, out.sparkSession.sparkContext.defaultParallelism)

    cells_dir = store._cells_dir(ks, cf_name)
    if cfdef.domain_split:
        # preserve the fork's per-domain physical layout through compaction
        # (domain pruning is the read optimization for these CFs; they keep
        # the directory layout instead of the bucketed catalog table)
        from apache_cassandra_spark.functions.tokens import OdklDomainPartitioner

        out = out.repartition(n_buckets, "key").sortWithinPartitions("key", "sc", "column")
        out = out.withColumn("_dom", OdklDomainPartitioner().domain(F.col("key")))
        writer = out.write.mode("overwrite").partitionBy("_dom")
        if cfdef.bloom_columns:
            writer = (
                writer.option("parquet.bloom.filter.enabled#key", "true")
                .option("parquet.bloom.filter.enabled#column", "true")
            )
        tmp = cells_dir + ".compact_tmp"
        writer.parquet(tmp)
        _swap_dir(tmp, cells_dir)
    else:
        # bucketed catalog table: scan reports HashPartitioning(key), so
        # every post-compaction read runs without a shuffle exchange (the
        # reconcile aggregate is skipped outright — CF.pre_reconciled) and
        # point reads prune to one bucket. repartition on the bucket key
        # aligns tasks with buckets -> exactly one file per bucket.
        meta_old = store.compacted_meta(ks, cf_name)
        input_files = (
            [
                os.path.join(cells_dir, f)
                for f in os.listdir(cells_dir)
                if f.endswith(".parquet")
            ]
            if os.path.isdir(cells_dir)
            else []
        )
        gen = (meta_old["gen"] + 1) if meta_old else 1
        table = store.compacted_table_name(ks, cf_name, gen)
        path = os.path.join(store.root, ks, cf_name, f"compacted_g{gen}")
        shutil.rmtree(path, ignore_errors=True)  # orphan from a crashed run
        writer = (
            out.repartition(n_buckets, "key")
            .write.mode("overwrite")
            .bucketBy(n_buckets, "key")
            .sortBy("key", "sc", "column")
            .option("path", path)
        )
        if cfdef.bloom_columns:
            # fork column-bloom analog: Parquet bloom filters on the name/key
            # columns (probe served by io skipping instead of explicit BFs)
            writer = (
                writer.option("parquet.bloom.filter.enabled#key", "true")
                .option("parquet.bloom.filter.enabled#column", "true")
            )
        writer.saveAsTable(table)
        # pointer flip is the commit; until then readers see old gen + deltas.
        # Crash after the flip but before cleanup leaves duplicate versions
        # on disk — harmless, LWW reconcile is idempotent over them and the
        # next compaction sweeps the leftovers.
        store.write_compacted_meta(
            ks, cf_name, {"gen": gen, "table": table, "path": path, "buckets": n_buckets}
        )
        for p in input_files:
            os.remove(p)
        if meta_old is not None:
            store.spark.sql(f"DROP TABLE IF EXISTS {meta_old['table']}")
            shutil.rmtree(meta_old["path"], ignore_errors=True)

    # container tombstones: purge those past grace (all shadowed cells are
    # gone from the rewrite above), keep younger watermarks. When nothing
    # survives, remove the directory outright so reads bind tombs=None and
    # skip the watermark joins.
    if tombs is not None:
        kept = tombs.where(F.col("ldt") >= F.lit(gc_before))
        ctombs_dir = store._ctombs_dir(ks, cf_name)
        if kept.isEmpty():
            shutil.rmtree(ctombs_dir, ignore_errors=True)
        else:
            tmp_t = ctombs_dir + ".compact_tmp"
            kept.write.mode("overwrite").parquet(tmp_t)
            _swap_dir(tmp_t, ctombs_dir)

    # saved-caches maintenance (ColumnFamilyStore.java:213-311): persist
    # the current hot-key list, then drop the primed cache — its lineage
    # points at the pre-compaction files; the next bind re-reconciles the
    # saved keys from the new generation.
    store.save_row_cache(ks, cf_name)
    store.invalidate_row_cache(ks, cf_name)


def submit_minor_if_needed(
    store: CellStore,
    ks: str,
    cf_name: str,
    min_threshold: int = 4,
    max_threshold: int = 32,
    bucket_ratio: float = 2.0,
) -> bool:
    """Size-tiered minor compaction (``CompactionManager.java:87-131``,
    bucketing ``:620-640``): group delta files into similar-size buckets
    (each file within ``bucket_ratio`` of the bucket average); merge any
    bucket with >= ``min_threshold`` files into one reconciled file.

    LWW reconcile is associative, so merging a *subset* of files is always
    correct — but tombstones are NOT purged here (a purge is only safe when
    no older version can exist elsewhere, i.e. major compaction; the
    reference guards this with ``isKeyInRemainingSSTables``,
    ``db/ColumnFamilyStore.java:727``). Returns True if a merge ran.
    """
    cells_dir = store._cells_dir(ks, cf_name)
    if not os.path.isdir(cells_dir):
        return False
    ran = False
    try:
        if store.catalog.keyspace(ks).cf(cf_name).domain_split:
            # domain-split CFs keep files under _dom=XX/ partition dirs;
            # each domain is an independent size-tiered pool
            for d in sorted(os.listdir(cells_dir)):
                sub = os.path.join(cells_dir, d)
                if d.startswith("_dom=") and os.path.isdir(sub):
                    ran = _minor_in_dir(store, sub, min_threshold, max_threshold, bucket_ratio) or ran
        else:
            ran = _minor_in_dir(store, cells_dir, min_threshold, max_threshold, bucket_ratio)
    except BaseException:
        # crash MID-merge: some pool may already have rewritten and
        # deleted its inputs — the primed (lazy) row cache must drop so
        # its lineage can't materialize over missing files. Best-effort:
        # the invalidate itself failing (e.g. dead SparkContext, the same
        # condition that killed the merge) must not mask the root cause.
        # NOTE: not sys.exc_info()-in-finally — that also reports a
        # CALLER'S in-flight handled exception and would spuriously
        # invalidate on every no-op call made from an except block.
        try:
            store.invalidate_row_cache(ks, cf_name)
        except Exception:
            pass
        raise
    if ran:
        # the merge deleted its input delta files; content is unchanged,
        # so the next bind re-primes identically. Only on a real merge:
        # the common no-op call keeps the warm cache.
        store.invalidate_row_cache(ks, cf_name)
    return ran


def _minor_in_dir(
    store: CellStore, cells_dir: str, min_threshold: int, max_threshold: int, bucket_ratio: float
) -> bool:
    files = sorted(
        (os.path.getsize(os.path.join(cells_dir, f)), f)
        for f in os.listdir(cells_dir)
        if f.endswith(".parquet")
    )
    # greedy size-tiered bucketing over the sorted file list
    buckets: list[list[tuple[int, str]]] = []
    for size, name in files:
        if buckets and size <= bucket_ratio * (sum(s for s, _ in buckets[-1]) / len(buckets[-1])):
            buckets[-1].append((size, name))
        else:
            buckets.append([(size, name)])
    target = next((b for b in buckets if len(b) >= min_threshold), None)
    if target is None:
        return False
    target = target[:max_threshold]
    paths = [os.path.join(cells_dir, name) for _, name in target]
    merged = store.spark.read.schema(CELL_SCHEMA).parquet(*paths)
    from apache_cassandra_spark.functions.reconcile import reconcile

    out = reconcile(merged).sortWithinPartitions("key", "sc", "column")
    # tmp dir must live OUTSIDE the cells root: for domain-split CFs
    # cells_dir is ".../cells/_dom=XX", and a tmp dir named "..._dom=XX.minor_tmp"
    # inside cells/ would be picked up by partition discovery as a bogus
    # _dom value after a crash. A dot-prefixed sibling of the CF dir is
    # invisible to Spark's file listing wherever it lands.
    base = os.path.basename(cells_dir)
    if base.startswith("_dom="):
        tmp = os.path.join(os.path.dirname(os.path.dirname(cells_dir)), f".minor_tmp_{base[5:]}")
    else:
        tmp = os.path.join(os.path.dirname(cells_dir), ".minor_tmp")
    out.coalesce(max(1, len(target) // 4)).write.mode("overwrite").parquet(tmp)
    # swap order: link the merged output IN first, then remove the inputs.
    # A crash in between leaves duplicates (merged ∪ inputs), which LWW
    # reconcile collapses back to the same winners — never lost rows.
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(os.path.join(tmp, f), os.path.join(cells_dir, "minor_" + f))
    for p in paths:
        os.remove(p)
    shutil.rmtree(tmp, ignore_errors=True)
    return True


def cleanup(store: CellStore, ks: str, cf_name: str, key_pred) -> None:
    """``doCleanupCompaction`` (``CompactionManager.java:534-548``): drop
    rows no longer owned — compaction restricted to the keep-predicate."""
    compact(store, ks, cf_name, key_pred=key_pred)


# -- row processor registry (fork: config/storage-conf.xml:140-149) ---------

_ROW_PROCESSORS: dict[str, tuple[RowProcessor, bool]] = {}


def register_row_processor(
    name: str, proc: RowProcessor, process_incomplete: bool = False
) -> None:
    """Register a named processor for CFDef.row_processors chains.

    ``process_incomplete`` mirrors ``IRowProcessor.shouldProcessIncomplete``
    (``db/proc/IRowProcessor.java:70``): only processors registered True
    run at memtable flush, where a row's cells are NOT guaranteed complete
    (older generations may hold more cells for the same key). The default
    False is the safe choice — e.g. RemoveDeleted must NOT drop a young
    tombstone at flush or it would resurrect the older shadowed cells
    (the reference's RemoveDeletedRowProcessor returns false for exactly
    this reason)."""
    _ROW_PROCESSORS[name] = (proc, process_incomplete)


def get_row_processor(name: str) -> RowProcessor:
    return _ROW_PROCESSORS[name][0]


def processes_incomplete(name: str) -> bool:
    return _ROW_PROCESSORS[name][1]


def flush_chain(cfdef) -> RowProcessor | None:
    """The CF's processor chain as applied at MEMTABLE FLUSH
    (``db/Memtable.java:165-187`` + ``RowProcessorChain.java:132-136``):
    members with ``process_incomplete=False`` are skipped in-chain; if no
    member processes incomplete rows the flush runs no chain at all
    (``shouldProcessIncomplete`` ORs over the chain). Returns a pandas
    row-group callable or None."""
    procs = [
        get_row_processor(n) for n in cfdef.row_processors if processes_incomplete(n)
    ]
    if not procs:
        return None

    def chained(pdf: pd.DataFrame) -> pd.DataFrame:
        for p in procs:
            if pdf is None or len(pdf) == 0:
                break
            pdf = p(pdf)
        return pdf

    return chained


def _remove_deleted(pdf: pd.DataFrame) -> pd.DataFrame:
    """Built-in analog of ``db/proc/RemoveDeletedRowProcessor.java``
    (shouldProcessIncomplete = false: compaction-only)."""
    return pdf[~pdf["tombstone"]]


register_row_processor("RemoveDeleted", _remove_deleted, process_incomplete=False)


# -- data validation (AntiEntropy analog) ------------------------------------


def validate(cf, buckets: int = 16) -> DataFrame:
    """Checksum-based data validation — the single-copy analog of the
    reference's Merkle-tree AntiEntropy validator
    (``service/AntiEntropyService.java:58-120``, ``utils/MerkleTree.java``):
    one deterministic content hash per token-range bucket of the reconciled
    live view. Two stores (e.g. a snapshot vs the live table, or pre/post
    migration) agree iff every bucket hash matches.

    Returns (bucket, n_cells, content_hash).
    """
    token = cf.partitioner.token(F.col("key"))
    live = cf.live()
    cell_hash = F.md5(
        F.concat_ws(
            "\x00",
            F.col("key"),
            F.coalesce(F.hex("sc"), F.lit("-")),
            F.hex("column"),
            F.coalesce(F.hex("value"), F.lit("-")),
            F.col("ts").cast("string"),
        )
    )
    bucketed = live.select(
        F.abs(F.hash(token) % buckets).alias("bucket"), cell_hash.alias("h")
    )
    # order-insensitive combine in CONSTANT memory per bucket: two
    # independent 64-bit projections of each cell hash, reduced by the
    # commutative pair (wrap-proof decimal sum, bit_xor) + count, then one
    # md5 over the five scalars. A collect_list of per-cell hashes would
    # buffer the whole bucket in one aggregation buffer — billions of
    # strings per bucket at 100 TB; the reference's MerkleTree
    # (utils/MerkleTree.java) is constant-memory per range for the same
    # reason. Partial aggregation (map-side combine) applies, and the
    # digest is independent of row order and partitioning.
    x1 = F.xxhash64(F.col("h"))
    x2 = F.xxhash64(F.reverse(F.col("h")))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_cells"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sum(x1.cast("decimal(38,0)")).cast("string"),
                    F.expr("bit_xor(xxhash64(h))").cast("string"),
                    F.sum(x2.cast("decimal(38,0)")).cast("string"),
                    F.expr("bit_xor(xxhash64(reverse(h)))").cast("string"),
                    F.count("*").cast("string"),
                )
            ).alias("content_hash"),
        )
    )


# -- snapshot / export / import (tools/SSTableExport.java:44,108-331) --------


def export_json(cf_cells: DataFrame, path: str) -> None:
    """SSTable->JSON export analog: cells as JSON lines, binary fields hex."""
    (
        cf_cells.select(
            "key",
            F.hex("sc").alias("sc"),
            F.hex("column").alias("column"),
            F.hex("value").alias("value"),
            "ts",
            "tombstone",
            "ldt",
        ).write.mode("overwrite").json(path)
    )


def import_json(spark, path: str) -> DataFrame:
    """JSON->cells import analog (``tools/SSTableImport.java``)."""
    # explicit schema: JSON omits all-null fields (e.g. sc/ldt), inference
    # would drop those columns
    raw = spark.read.schema(
        "key string, sc string, column string, value string, ts long, tombstone boolean, ldt int"
    ).json(path)
    return raw.select(
        F.col("key").cast("string"),
        F.unhex("sc").alias("sc"),
        F.unhex("column").alias("column"),
        F.unhex("value").alias("value"),
        F.col("ts").cast("long"),
        F.col("tombstone").cast("boolean"),
        F.col("ldt").cast("int"),
    )


def snapshot(store: CellStore, ks: str, cf_name: str, tag: str) -> str:
    """Hardlink snapshot (``db/ColumnFamilyStore.java:1283``). Walks
    partition subdirectories so domain-split CFs (files under ``_dom=XX/``)
    snapshot correctly, preserving the partition layout; the compacted
    bucketed generation (if any) is linked under ``compacted/``."""
    dst = os.path.join(store.root, ks, cf_name, "snapshots", tag)
    os.makedirs(dst, exist_ok=True)
    # persist the hot-key list with the snapshot (saved-caches analog) —
    # data is unchanged, so the primed cache stays valid
    store.save_row_cache(ks, cf_name)
    srcs = [(store._cells_dir(ks, cf_name), dst)]
    meta = store.compacted_meta(ks, cf_name)
    if meta is not None:
        srcs.append((meta["path"], os.path.join(dst, "compacted")))
    for src, out_root in srcs:
        for dirpath, _dirnames, filenames in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            for f in filenames:
                if f.endswith(".parquet"):
                    out_dir = out_root if rel == "." else os.path.join(out_root, rel)
                    os.makedirs(out_dir, exist_ok=True)
                    os.link(os.path.join(dirpath, f), os.path.join(out_dir, f))
    return dst
