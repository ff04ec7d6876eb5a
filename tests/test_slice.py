"""get / get_slice / multiget_slice / get_count semantics — mirrors the
reference system tests test_server.py:822 (slice ranges), :957 (by names),
:989 (multiget), :206 (count), :241 (super subcolumn limit)."""

import struct

from apache_cassandra_spark.model import ColumnPath, SlicePredicate, SliceRange
from apache_cassandra_spark.operators import read

from tests.util import cell, col_names, make_cf


def simple_cf(spark):
    return make_cf(
        spark,
        [cell("key1", f"c{i}".encode(), f"value{i}".encode(), 0) for i in range(1, 6)],
    )


def test_get_point_lookup(spark):
    cf = simple_cf(spark)
    rows = read.get(cf, "key1", ColumnPath("t", column=b"c3")).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"value3"


def test_get_missing_is_empty(spark):
    cf = simple_cf(spark)
    assert read.get(cf, "key1", ColumnPath("t", column=b"zz")).count() == 0


def test_slice_subrange(spark):
    cf = simple_cf(spark)
    pred = SlicePredicate(slice_range=SliceRange(start=b"c2", finish=b"c4"))
    assert col_names(read.get_slice(cf, "key1", pred)) == [b"c2", b"c3", b"c4"]


def test_slice_unbounded_count(spark):
    cf = simple_cf(spark)
    pred = SlicePredicate(slice_range=SliceRange(count=3))
    assert col_names(read.get_slice(cf, "key1", pred)) == [b"c1", b"c2", b"c3"]


def test_slice_reversed(spark):
    cf = simple_cf(spark)
    pred = SlicePredicate(slice_range=SliceRange(start=b"c4", finish=b"c2", reversed=True, count=2))
    assert col_names(read.get_slice(cf, "key1", pred)) == [b"c4", b"c3"]


def test_slice_by_names(spark):
    cf = simple_cf(spark)
    pred = SlicePredicate(column_names=(b"c1", b"c5", b"nope"))
    assert col_names(read.get_slice(cf, "key1", pred)) == [b"c1", b"c5"]


def test_count_excludes_tombstones(spark):
    cf = make_cf(
        spark,
        [
            cell("key1", b"c1", b"v", 0),
            cell("key1", b"c2", b"v", 0),
            cell("key1", b"c2", None, 1, tombstone=True, ldt=0),
        ],
    )
    assert read.get_count(cf, "key1").collect()[0]["count"] == 1


def test_multiget_slice_per_key_count(spark):
    cells = []
    for k in ("ka", "kb"):
        for i in range(1, 5):
            cells.append(cell(k, f"c{i}".encode(), b"v", 0))
    cf = make_cf(spark, cells)
    pred = SlicePredicate(slice_range=SliceRange(count=2))
    rows = read.multiget_slice(cf, ["ka", "kb"], pred).collect()
    got = sorted((r["key"], bytes(r["column"])) for r in rows)
    assert got == [("ka", b"c1"), ("ka", b"c2"), ("kb", b"c1"), ("kb", b"c2")]


def test_live_count_limit_applied_after_reconcile(spark):
    # c1 is deleted: the count=2 slice must return c2, c3 (live ones),
    # not stop at the tombstoned c1 — SliceQueryFilter counts *live* columns
    cf = make_cf(
        spark,
        [
            cell("key1", b"c1", b"v", 0),
            cell("key1", b"c1", None, 1, tombstone=True, ldt=0),
            cell("key1", b"c2", b"v", 0),
            cell("key1", b"c3", b"v", 0),
            cell("key1", b"c4", b"v", 0),
        ],
    )
    pred = SlicePredicate(slice_range=SliceRange(count=2))
    assert col_names(read.get_slice(cf, "key1", pred)) == [b"c2", b"c3"]


# -- super CF ---------------------------------------------------------------


def super_cf(spark):
    def lc(i):
        return struct.pack(">q", i)

    return make_cf(
        spark,
        [
            cell("key1", lc(4), b"value4", 0, sc=b"sc1"),
            cell("key1", lc(5), b"value5", 0, sc=b"sc2"),
            cell("key1", lc(6), b"value6", 0, sc=b"sc2"),
        ],
        column_type="Super",
        compare_with="BytesType",
        compare_subcolumns_with="LongType",
    )


def test_super_get_whole_supercolumn(spark):
    cf = super_cf(spark)
    rows = read.get(cf, "key1", ColumnPath("t", super_column=b"sc2")).collect()
    assert sorted(bytes(r["value"]) for r in rows) == [b"value5", b"value6"]


def test_super_subcolumn_slice(spark):
    cf = super_cf(spark)
    pred = SlicePredicate(slice_range=SliceRange(count=1))
    rows = read.get_slice(cf, "key1", pred, super_column=b"sc2").collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"value5"


def test_super_parent_slice_counts_supercolumns(spark):
    cf = super_cf(spark)
    pred = SlicePredicate(slice_range=SliceRange(count=1))
    rows = read.get_slice(cf, "key1", pred).collect()
    # count=1 keeps the first supercolumn (sc1) with all its subcolumns
    assert sorted(bytes(r["sc"]) for r in rows) == [b"sc1"]


def test_super_get_count_counts_supercolumns(spark):
    cf = super_cf(spark)
    assert read.get_count(cf, "key1").collect()[0]["count"] == 2


def test_super_subcolumn_numeric_order(spark):
    cf = super_cf(spark)
    pred = SlicePredicate(slice_range=SliceRange(reversed=True, count=10))
    rows = read.get_slice(cf, "key1", pred, super_column=b"sc2").collect()
    assert [bytes(r["value"]) for r in rows] == [b"value6", b"value5"]


def test_multiget_entry_per_key_null_for_misses(spark):
    """R3 multiget's own contract (CassandraServer.java:276-319): every
    requested key comes back, absent keys with NULL column/value — the
    left-join-against-the-key-list behavior the multiget_slice path
    doesn't have."""
    cf = simple_cf(spark)
    rows = {
        r["key"]: r
        for r in read.multiget(
            cf, ["key1", "ghost"], ColumnPath("t", column=b"c2")
        ).collect()
    }
    assert set(rows) == {"key1", "ghost"}
    assert bytes(rows["key1"]["value"]) == b"value2"
    assert rows["ghost"]["value"] is None and rows["ghost"]["column"] is None


def test_multiget_whole_row_form(spark):
    cf = simple_cf(spark)
    rows = read.multiget(cf, ["key1"], ColumnPath("t")).collect()
    assert len(rows) == 5  # all live columns of the row
