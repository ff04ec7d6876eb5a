"""CellStore write path, compaction, row processors, export/import,
existence probes — mirrors db/CompactionsPurgeTest.java,
db/CompactionRowProcTest.java:39, db/ColumnFamilyStoreTest.java:147,172."""

import pytest

from apache_cassandra_spark.catalog import Catalog
from apache_cassandra_spark.model import ColumnPath, Deletion, Mutation, SlicePredicate, SliceRange
from apache_cassandra_spark.operators import exists, maintenance, read, write
from apache_cassandra_spark.sources.cellstore import CellStore


@pytest.fixture()
def store(spark, tmp_path):
    catalog = Catalog.from_dict(
        {
            "Keyspace1": {
                "Standard1": {"compare_with": "BytesType"},
                "Proc1": {"compare_with": "BytesType", "row_processors": ["RemoveDeleted"]},
                "FlushProc1": {"compare_with": "BytesType", "row_processors": ["DropMarked", "RemoveDeleted"]},
            }
        }
    )
    return CellStore(spark, str(tmp_path), catalog)


def test_insert_then_get(store):
    store.apply("Keyspace1", "Standard1", write.insert("k1", ColumnPath("Standard1", column=b"c1"), b"v1", 1))
    cf = store.cf("Keyspace1", "Standard1")
    rows = read.get(cf, "k1", ColumnPath("Standard1", column=b"c1")).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"v1"


def test_memtable_buffer_visible_to_reads(store):
    store.apply(
        "Keyspace1", "Standard1", write.insert("k1", ColumnPath("Standard1", column=b"c1"), b"v1", 1), durable=False
    )
    cf = store.cf("Keyspace1", "Standard1")
    assert read.get(cf, "k1", ColumnPath("Standard1", column=b"c1")).count() == 1
    store.flush()
    assert read.get(store.cf("Keyspace1", "Standard1"), "k1", ColumnPath("Standard1", column=b"c1")).count() == 1


def test_remove_column_then_row(store):
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c2"), b"v2", 1))
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn, column=b"c1"), 2))
    cf = store.cf(ks, cfn)
    assert read.get_count(cf, "k1").collect()[0]["count"] == 1
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn), 3))
    cf = store.cf(ks, cfn)
    assert read.get_count(cf, "k1").collect()[0]["count"] == 0


def test_batch_mutate_roundtrip(store):
    ks, cfn = "Keyspace1", "Standard1"
    batches = write.batch_mutate(
        {
            "k1": {
                cfn: [
                    Mutation(column_name=b"c1", value=b"v1", timestamp=1),
                    Mutation(column_name=b"c2", value=b"v2", timestamp=1),
                ]
            },
            "k2": {cfn: [Mutation(deletion=Deletion(timestamp=5))]},
        }
    )
    for name, b in batches.items():
        store.apply(ks, name, b)
    cf = store.cf(ks, cfn)
    pred = SlicePredicate(slice_range=SliceRange(count=100))
    assert read.get_slice(cf, "k1", pred).count() == 2
    assert read.get_slice(cf, "k2", pred).count() == 0


def test_batch_insert_w2(store):
    ks = "Keyspace1"
    batches = write.batch_insert(
        "k9",
        {
            "Standard1": [Mutation(column_name=b"c1", value=b"v1", timestamp=1)],
            "Proc1": [Mutation(column_name=b"c2", value=b"v2", timestamp=1)],
        },
    )
    for cf_name, b in batches.items():
        store.apply(ks, cf_name, b)
    assert read.get_count(store.cf(ks, "Standard1"), "k9").collect()[0]["count"] == 1
    assert read.get_count(store.cf(ks, "Proc1"), "k9").collect()[0]["count"] == 1


def test_compaction_purges_old_tombstones(store):
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn, column=b"c1"), 2, local_deletion_time=100))
    store.apply(ks, cfn, write.insert("k2", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    maintenance.compact(store, ks, cfn, gc_grace_seconds=0)
    cf = store.cf(ks, cfn)
    # tombstone + shadowed cell physically gone, live cell kept
    assert cf.cells.count() == 1
    assert read.get_count(cf, "k2").collect()[0]["count"] == 1


def test_compaction_keeps_young_tombstones(store):
    import time

    ks, cfn = "Keyspace1", "Standard1"
    now = int(time.time())
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn, column=b"c1"), 2, local_deletion_time=now))
    maintenance.compact(store, ks, cfn, gc_grace_seconds=3600)
    cf = store.cf(ks, cfn)
    assert cf.cells.count() == 1  # the young tombstone survives
    assert cf.cells.collect()[0]["tombstone"] is True


def test_row_processor_chain_from_catalog(store):
    ks, cfn = "Keyspace1", "Proc1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn, column=b"c2"), 2, local_deletion_time=2**31 - 10))
    maintenance.compact(store, ks, cfn, gc_grace_seconds=10**9)
    cf = store.cf(ks, cfn)
    # RemoveDeleted row processor dropped the young tombstone anyway
    assert [bytes(r["column"]) for r in cf.cells.collect()] == [b"c1"]


@pytest.fixture()
def drop_marked_processor():
    """Flush-capable dropping processor (shouldProcessIncomplete=true —
    IRowProcessor.java:26-29 case 3, the only way to get control when the
    memtable is flushing)."""

    def drop_marked(pdf):
        # tombstone cells carry value=None — never "marked"
        return pdf[[v is None or bytes(v) != b"DROPME" for v in pdf["value"]]]

    maintenance.register_row_processor("DropMarked", drop_marked, process_incomplete=True)
    yield
    maintenance._ROW_PROCESSORS.pop("DropMarked", None)


def test_flush_time_processor_drops_cells_at_first_flush(store, drop_marked_processor):
    """db/Memtable.java:165-187: a dropping processor's cells must never
    reach storage — gone from raw-cell probes at FIRST FLUSH, not first
    compaction (the round-9 divergence window)."""
    ks, cfn = "Keyspace1", "FlushProc1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"keepme", 1), durable=False)
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c2"), b"DROPME", 1), durable=False)
    store.apply(ks, cfn, write.insert("k2", ColumnPath(cfn, column=b"c1"), b"DROPME", 1), durable=False)
    store.flush()
    cf = store.cf(ks, cfn)
    raw = [(r["key"], bytes(r["column"])) for r in cf.cells.collect()]
    assert raw == [("k1", b"c1")]  # k2's whole row vanished pre-storage
    # raw-cell existence probes never see the dropped cells
    flags = {r["key"]: r["may_exist"] for r in exists.rows_may_exist(cf, ["k1", "k2"]).collect()}
    assert flags == {"k1": True, "k2": False}


def test_flush_time_processor_applies_on_durable_commit_too(store, drop_marked_processor):
    """durable=True commits are the same memtable→storage write, just
    batch-sized — the flush chain guards every cell write path."""
    ks, cfn = "Keyspace1", "FlushProc1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"DROPME", 1))
    cf = store.cf(ks, cfn)
    assert cf.cells.count() == 0


def test_flush_skips_processors_that_refuse_incomplete_rows(store, drop_marked_processor):
    """RemoveDeleted registers shouldProcessIncomplete=false
    (RemoveDeletedRowProcessor.java:52-55): running it at flush would
    resurrect older shadowed cells. The chain must skip it in place at
    flush (RowProcessorChain.java:132-136) and still run it at major
    compaction."""
    ks, cfn = "Keyspace1", "FlushProc1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"keepme", 1), durable=False)
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn, column=b"c1"), 2, local_deletion_time=2**31 - 10), durable=False)
    store.flush()
    cf = store.cf(ks, cfn)
    # the young tombstone SURVIVES flush (DropMarked doesn't match it,
    # RemoveDeleted was skipped) — it must keep shadowing older cells
    flags = sorted(r["tombstone"] for r in cf.cells.collect())
    assert flags == [False, True]  # both generations on disk
    maintenance.compact(store, ks, cfn, gc_grace_seconds=10**9)
    cf = store.cf(ks, cfn)
    # compaction runs the full chain: RemoveDeleted drops the tombstone
    assert cf.cells.count() == 0


def test_custom_row_processor_drops_rows(store):
    ks, cfn = "Keyspace1", "Standard1"
    for k in ("keep", "drop"):
        store.apply(ks, cfn, write.insert(k, ColumnPath(cfn, column=b"c1"), b"v1", 1))

    def only_keep(pdf):
        return pdf if (pdf["key"] == "keep").all() else None

    maintenance.compact(store, ks, cfn, row_processor=only_keep)
    cf = store.cf(ks, cfn)
    assert [r["key"] for r in cf.cells.collect()] == ["keep"]


def test_cleanup_restricted_rewrite(store, spark):
    from pyspark.sql import functions as F

    ks, cfn = "Keyspace1", "Standard1"
    for k in ("a1", "b2"):
        store.apply(ks, cfn, write.insert(k, ColumnPath(cfn, column=b"c1"), b"v1", 1))
    maintenance.cleanup(store, ks, cfn, key_pred=F.col("key").startswith("a"))
    assert [r["key"] for r in store.cf(ks, cfn).cells.collect()] == ["a1"]


def test_export_import_roundtrip(store, spark, tmp_path):
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    cf = store.cf(ks, cfn)
    path = str(tmp_path / "export")
    maintenance.export_json(cf.cells, path)
    back = maintenance.import_json(spark, path)
    rows = back.collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"v1" and rows[0]["ts"] == 1


def test_snapshot_hardlinks(store):
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    import os

    dst = maintenance.snapshot(store, ks, cfn, "tag1")
    assert any(f.endswith(".parquet") for f in os.listdir(dst))


def test_rows_may_exist_probe(store):
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    cf = store.cf(ks, cfn)
    got = {r["key"]: r["may_exist"] for r in exists.rows_may_exist(cf, ["k1", "nope"]).collect()}
    assert got == {"k1": True, "nope": False}


def test_columns_may_exist_stale_positive_ok(store):
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("k1", ColumnPath(cfn, column=b"c1"), b"v1", 1))
    store.apply(ks, cfn, write.remove("k1", ColumnPath(cfn, column=b"c1"), 2))
    cf = store.cf(ks, cfn)
    got = {bytes(r["column"]): r["may_exist"] for r in exists.columns_may_exist(cf, "k1", [b"c1", b"c9"]).collect()}
    # deleted column may still probe true (one-sided contract); absent is false
    assert got[b"c1"] is True and got[b"c9"] is False


def test_validate_checksums_detect_divergence(store):
    ks, cfn = "Keyspace1", "Standard1"
    for i in range(10):
        store.apply(ks, cfn, write.insert(f"k{i}", ColumnPath(cfn, column=b"c"), b"v", 1))
    before = {r["bucket"]: r["content_hash"] for r in maintenance.validate(store.cf(ks, cfn)).collect()}
    # compaction must NOT change the logical content
    maintenance.compact(store, ks, cfn, gc_grace_seconds=0)
    after = {r["bucket"]: r["content_hash"] for r in maintenance.validate(store.cf(ks, cfn)).collect()}
    assert before == after
    # a mutation must change exactly the affected bucket
    store.apply(ks, cfn, write.insert("k3", ColumnPath(cfn, column=b"c"), b"CHANGED", 2))
    diverged = {r["bucket"]: r["content_hash"] for r in maintenance.validate(store.cf(ks, cfn)).collect()}
    assert diverged != after
    assert sum(1 for b in after if diverged.get(b) != after[b]) == 1


def test_bulk_load(store, spark):
    from apache_cassandra_spark.sources.ingest import cells_from_table

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    store.bulk_load("Keyspace1", "Standard1", cells_from_table(df, "id"))
    cf = store.cf("Keyspace1", "Standard1")
    assert read.get_count(cf, "1").collect()[0]["count"] == 1


def test_saved_caches_warm_start_on_reopen(store, spark, tmp_path):
    """Saved-caches analog (db/ColumnFamilyStore.java:213-311): the hot-key
    list persists; a FRESH store over the same root re-primes the row cache
    at bind time, so the first point read hits InMemoryTableScan without
    any manual cached_rows() call. Only the KEY LIST is persisted — the
    warm cache re-reconciles those keys from current storage, like
    initRowCache() re-caching against freshly loaded SSTables."""
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("hot", ColumnPath(cfn, column=b"c"), b"v1", 1))
    store.apply(ks, cfn, write.insert("cold", ColumnPath(cfn, column=b"c"), b"v2", 1))
    store.save_row_cache(ks, cfn, ["hot"])

    reopened = CellStore(spark, store.root, store.catalog)  # fresh process analog
    cf = reopened.cf(ks, cfn)
    try:
        point = read.get_slice(cf, "hot", SlicePredicate(slice_range=SliceRange(count=10)))
        plan = point._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        rows = point.collect()
        assert len(rows) == 1 and bytes(rows[0]["value"]) == b"v1"
        # a key outside the saved hot set takes the normal reconcile path
        cold = read.get_slice(cf, "cold", SlicePredicate(slice_range=SliceRange(count=10)))
        assert "InMemoryTableScan" not in cold._jdf.queryExecution().executedPlan().toString()
        assert cold.count() == 1
    finally:
        reopened.invalidate_row_cache(ks, cfn)


def test_saved_caches_invalidated_by_writes_and_refreshed(store, spark):
    """Reference invalidates the row cache on mutation; the saved key list
    survives and the next bind re-reconciles CURRENT data — a warm cache
    must never serve stale values."""
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("hot", ColumnPath(cfn, column=b"c"), b"old", 1))
    store.save_row_cache(ks, cfn, ["hot"])
    cf = store.cf(ks, cfn)
    assert cf.row_cache is not None  # primed
    store.apply(ks, cfn, write.insert("hot", ColumnPath(cfn, column=b"c"), b"new", 2))
    cf = store.cf(ks, cfn)  # re-primed from the saved list over new data
    try:
        rows = read.get_slice(cf, "hot", SlicePredicate(slice_range=SliceRange(count=10))).collect()
        assert [bytes(r["value"]) for r in rows] == [b"new"]
        assert "InMemoryTableScan" in (
            read.get_slice(cf, "hot", SlicePredicate(slice_range=SliceRange(count=10)))
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        store.invalidate_row_cache(ks, cfn)


def test_saved_caches_survive_compaction(store, spark):
    """compact() persists the hot list and drops the primed cache (its
    lineage points at rewritten files); the next bind re-primes off the
    compacted generation."""
    ks, cfn = "Keyspace1", "Standard1"
    store.apply(ks, cfn, write.insert("hot", ColumnPath(cfn, column=b"c"), b"v", 1))
    store.save_row_cache(ks, cfn, ["hot"])
    store.cf(ks, cfn)  # prime
    maintenance.compact(store, ks, cfn)
    cf = store.cf(ks, cfn)
    try:
        point = read.get_slice(cf, "hot", SlicePredicate(slice_range=SliceRange(count=10)))
        assert "InMemoryTableScan" in point._jdf.queryExecution().executedPlan().toString()
        assert point.count() == 1
    finally:
        store.invalidate_row_cache(ks, cfn)


def test_row_cache_serves_from_memory(store):
    """Row-cache analog (db/ColumnFamilyStore.java:975-986): after
    materialization, reads come from InMemoryRelation, not the store."""
    store.apply(
        "Keyspace1", "Standard1", write.insert("rc", ColumnPath("Standard1", column=b"c"), b"v", 1)
    )
    cf = store.cf("Keyspace1", "Standard1")
    cached = cf.cached_rows()
    try:
        assert cached.count() == 1  # materializes the cache
        point = cached.where(cached.key == "rc")
        plan = point._jdf.queryExecution().executedPlan().toString()
        # served from the cache: the scan node is InMemoryTableScan (its
        # string embeds the origin plan, so only assert the node type)
        assert "InMemoryTableScan" in plan
        assert point.count() == 1
    finally:
        cached.unpersist()
