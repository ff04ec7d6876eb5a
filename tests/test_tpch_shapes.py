"""The Q21 aggregate reformulation must be LOSSLESS vs the textbook
EXISTS / NOT-EXISTS triple-join semantics: a supplier waits on an order
iff (a) it shipped a late line on it, (b) another supplier has a line on
the same order, and (c) no OTHER supplier shipped late on it. The gate
runs the two-aggregate form (queries._waiting_suppliers); here a brute
per-order Python model replays the quantified form over randomized
multi-supplier data — including the edge rows the reformulation has to
get right (single-supplier orders with a late line, all-late orders,
orders where the same supplier has both a late and an on-time line)."""

import datetime as dt
import random
from collections import defaultdict

from pyspark.sql import functions as F

from apache_cassandra_spark.queries import _waiting_suppliers

BASE = dt.datetime(1995, 1, 1)


def _brute_numwait(lines, f_orders):
    """Textbook quantified semantics, per order in Python."""
    by_order = defaultdict(list)
    for okey, skey, ship in lines:
        if okey in f_orders:
            by_order[okey].append((skey, ship))
    waits = defaultdict(int)
    for okey, rows in by_order.items():
        odate = f_orders[okey]
        late = {s for s, ship in rows if ship > odate + dt.timedelta(days=90)}
        supps = {s for s, _ in rows}
        for s in late:
            if len(supps) >= 2 and not (late - {s}):
                waits[s] += 1
    return dict(waits)


def test_q21_reformulation_matches_quantified_form_fuzz(spark):
    rng = random.Random(421)
    for trial in range(4):
        n_orders, n_supp = 60, 7
        f_orders = {}
        orders_rows = []
        for okey in range(n_orders):
            odate = BASE + dt.timedelta(days=rng.randrange(300))
            status = rng.choice(["F", "O", "P"])
            orders_rows.append((okey, status, odate))
            if status == "F":
                f_orders[okey] = odate
        lines = []
        for okey, status, odate in orders_rows:
            for _ in range(rng.randrange(1, 5)):
                skey = rng.randrange(n_supp)
                # half on-time, half late relative to THIS order's date
                ship = odate + dt.timedelta(days=rng.choice([10, 80, 91, 200]))
                lines.append((okey, skey, ship))
        li = spark.createDataFrame(
            lines, "l_orderkey long, l_suppkey long, l_shipdate timestamp"
        )
        o = spark.createDataFrame(
            orders_rows, "o_orderkey long, o_orderstatus string, o_orderdate timestamp"
        ).where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
        s = spark.createDataFrame(
            [(i, f"S{i:03d}") for i in range(n_supp)], "s_suppkey long, s_name string"
        )
        got = {
            r["s_suppkey"]: r["numwait"]
            for r in _waiting_suppliers(li, o, s).collect()
        }
        want = _brute_numwait(lines, f_orders)
        # the operator truncates to top-25; with 7 suppliers nothing truncates
        assert got == {k: v for k, v in want.items() if v > 0}, f"trial {trial}"


def test_q21_sole_late_supplier_edges(spark):
    """Pinned edge rows: single-supplier late order (no wait — no other
    supplier), two-supplier order with both late (no wait — another late
    exists), two-supplier order with one late (wait), same supplier late
    AND on-time on one order (still the sole late supplier)."""
    odate = BASE
    orders = [(1, odate), (2, odate), (3, odate), (4, odate)]
    late, ok = odate + dt.timedelta(days=120), odate + dt.timedelta(days=5)
    lines = [
        (1, 10, late),                    # sole supplier: no wait
        (2, 10, late), (2, 20, late),     # both late: no wait
        (3, 10, late), (3, 20, ok),       # 10 waits
        (4, 10, late), (4, 10, ok), (4, 20, ok),  # mixed same-supp: 10 waits
    ]
    li = spark.createDataFrame(lines, "l_orderkey long, l_suppkey long, l_shipdate timestamp")
    o = spark.createDataFrame(orders, "o_orderkey long, o_orderdate timestamp")
    s = spark.createDataFrame([(10, "A"), (20, "B")], "s_suppkey long, s_name string")
    got = {r["s_suppkey"]: r["numwait"] for r in _waiting_suppliers(li, o, s).collect()}
    assert got == {10: 2}


def test_q21_null_shipdate_scores_on_time(spark):
    """A NULL ship date must behave like the oracle's CASE (score 0 =
    on time), not NULL-propagate through the max/sum stack: the NULL
    supplier still counts toward n_supp, never toward n_late."""
    odate = BASE
    late = odate + dt.timedelta(days=120)
    ok = odate + dt.timedelta(days=5)
    lines = [(1, 10, late), (1, 20, None), (2, 10, late), (2, 20, ok)]
    li = spark.createDataFrame(lines, "l_orderkey long, l_suppkey long, l_shipdate timestamp")
    o = spark.createDataFrame([(1, odate), (2, odate)], "o_orderkey long, o_orderdate timestamp")
    s = spark.createDataFrame([(10, "A"), (20, "B")], "s_suppkey long, s_name string")
    got = {r["s_suppkey"]: r["numwait"] for r in _waiting_suppliers(li, o, s).collect()}
    assert got == {10: 2}


def test_q15_returns_all_tied_winners(spark):
    """Q15's contract is every supplier tied at the max — construct an
    exact two-way decimal tie and assert both rows come back."""
    from apache_cassandra_spark.queries import ORACLES, QUERIES
    import duckdb

    rows = [
        (1, 10, dt.datetime(1996, 2, 1), 100.0, 0.0),
        (2, 20, dt.datetime(1996, 2, 2), 60.0, 0.0),
        (3, 20, dt.datetime(1996, 2, 3), 40.0, 0.0),
        (4, 30, dt.datetime(1996, 2, 4), 99.99, 0.0),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_shipdate timestamp, "
        "l_extendedprice double, l_discount double",
    )
    s = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "s_suppkey long, s_name string"
    )
    from pyspark.sql import functions as F2

    rev = li.groupBy("l_suppkey").agg(
        F2.sum(
            F2.round(F2.col("l_extendedprice") * (1 - F2.col("l_discount")), 4).cast(
                "decimal(18,4)"
            )
        ).alias("_r")
    )
    mx = rev.agg(F2.max("_r").alias("_m"))
    out = (
        rev.crossJoin(mx)
        .where(F2.col("_r") == F2.col("_m"))
        .join(s, F2.col("l_suppkey") == F2.col("s_suppkey"))
        .select("s_suppkey", "s_name", F2.col("_r").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
        .collect()
    )
    assert [(r["s_suppkey"], r["total_rev"]) for r in out] == [(10, 100.0), (20, 100.0)]
