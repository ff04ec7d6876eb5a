"""LWW reconciliation semantics — parity with db/Column.java:196-210
(comparePriority), container shadowing (db/ColumnFamilyStore.java:1036-1045)
and the resurrect rules exercised by the reference system tests
(test_server.py:653-820)."""

from pyspark.sql import functions as F

from apache_cassandra_spark.functions.reconcile import gc_view, live_view, reconcile

from tests.util import cell, make_cf


def live(spark, cells, ctombs=None):
    cf = make_cf(spark, cells, ctombs)
    return live_view(cf.cells, cf.container_tombstones)


def test_higher_timestamp_wins(spark):
    rows = live(
        spark,
        [cell("k", b"c", b"old", 1), cell("k", b"c", b"new", 2)],
    ).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"new"


def test_tombstone_wins_timestamp_tie(spark):
    rows = live(
        spark,
        [cell("k", b"c", b"v", 5), cell("k", b"c", None, 5, tombstone=True, ldt=0)],
    ).collect()
    assert rows == []  # tombstone won, then filtered from live view


def test_larger_value_wins_live_tie(spark):
    rows = live(
        spark,
        [cell("k", b"c", b"aa", 5), cell("k", b"c", b"ab", 5)],
    ).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"ab"


def test_write_after_delete_resurrects(spark):
    rows = live(
        spark,
        [cell("k", b"c", None, 5, tombstone=True, ldt=0), cell("k", b"c", b"v2", 6)],
    ).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"v2"


def test_row_tombstone_shadows_older_cells_only(spark):
    rows = live(
        spark,
        [cell("k", b"a", b"old", 3), cell("k", b"b", b"newer", 8)],
        ctombs=[("k", None, 5, 0)],
    ).collect()
    assert len(rows) == 1 and bytes(rows[0]["column"]) == b"b"


def test_row_tombstone_boundary_is_inclusive(spark):
    # ts == markedForDeleteAt is shadowed (isRelevant requires ts > del_ts)
    rows = live(spark, [cell("k", b"a", b"v", 5)], ctombs=[("k", None, 5, 0)]).collect()
    assert rows == []


def test_supercolumn_tombstone_scoped_to_sc(spark):
    rows = live(
        spark,
        [
            cell("k", b"c1", b"v1", 3, sc=b"sc1"),
            cell("k", b"c2", b"v2", 3, sc=b"sc2"),
        ],
        ctombs=[("k", b"sc1", 5, 0)],
    ).collect()
    assert len(rows) == 1 and bytes(rows[0]["sc"]) == b"sc2"


def test_super_resurrect_subcolumn(spark):
    # test_server.py:757 test_super_cf_resurrect_subcolumn
    rows = live(
        spark,
        [
            cell("k", b"c1", b"v1", 3, sc=b"sc1"),
            cell("k", b"c1", b"v2", 10, sc=b"sc1"),  # re-insert after delete
        ],
        ctombs=[("k", b"sc1", 5, 0)],
    ).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"v2"


def test_reconcile_keeps_winner_per_coordinate(spark):
    cf = make_cf(
        spark,
        [
            cell("k1", b"c", b"x", 1),
            cell("k1", b"c", b"y", 2),
            cell("k2", b"c", b"z", 1),
        ],
    )
    rec = reconcile(cf.cells)
    assert rec.count() == 2


def test_gc_view_purges_old_keeps_young_tombstones(spark):
    cf = make_cf(
        spark,
        [
            cell("k", b"old", None, 1, tombstone=True, ldt=100),
            cell("k", b"young", None, 2, tombstone=True, ldt=10_000),
            cell("k", b"live", b"v", 3),
        ],
    )
    out = gc_view(cf.cells, cf.container_tombstones, gc_before=5_000)
    names = sorted(bytes(r["column"]) for r in out.collect())
    assert names == [b"live", b"young"]


def test_value_tiebreak_tombstone_null_value_safe(spark):
    # two tombstones with equal ts: stable result, no null-ordering surprise
    rows = (
        live_view(
            make_cf(
                spark,
                [
                    cell("k", b"c", None, 5, tombstone=True, ldt=1),
                    cell("k", b"c", None, 5, tombstone=True, ldt=2),
                ],
            ).cells,
            None,
        )
    ).collect()
    assert rows == []
