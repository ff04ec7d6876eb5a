"""text.collocations — PMI collocation mining: hand-checked PMI values,
min-count floor, tie order, cache lifecycle, plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.analytics.text import collocations


def _df(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_hand_checked_pmi(spark):
    # corpus: "a b" x3, "a c" x1  -> tokens: a:4 b:3 c:1, N=8; pairs:
    # (a,b):3 (a,c):1, M=4
    df = _df(spark, ["a b"] * 3 + ["a c"])
    out = {(r["w1"], r["w2"]): r for r in collocations(df, k=10, min_count=1).collect()}
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert ab["n_pair"] == 3
    assert ab["pmi_micro"] == round(math.log((3 * 8 * 8) / (4 * 4 * 3)) * 1_000_000)
    ac = out[("a", "c")]
    assert ac["pmi_micro"] == round(math.log((1 * 8 * 8) / (4 * 4 * 1)) * 1_000_000)


def test_min_count_floor_prunes_hapax_pairs(spark):
    df = _df(spark, ["x y"] * 5 + ["p q"])
    got = {(r["w1"], r["w2"]) for r in collocations(df, k=10, min_count=2).collect()}
    assert got == {("x", "y")}
    # M (total pairs) still counts the floored-out pair: PMI of (x,y)
    # uses M=6, not 5
    r = collocations(df, k=10, min_count=2).collect()[0]
    assert r["pmi_micro"] == round(math.log((5 * 12 * 12) / (6 * 5 * 5)) * 1_000_000)


def test_case_folding_and_multiword_docs(spark):
    df = _df(spark, ["Hong Kong visit", "hong kong trip"])
    out = {(r["w1"], r["w2"]): r["n_pair"] for r in collocations(df, k=10, min_count=2).collect()}
    assert out == {("hong", "kong"): 2}


def test_k_truncates_with_total_tie_order(spark):
    df = _df(spark, ["a b", "c d", "e f"] * 3)
    allr = collocations(df, k=10, min_count=1).collect()
    top2 = collocations(df, k=2, min_count=1).collect()
    key = lambda r: (-r["pmi_micro"], r["w1"], r["w2"])
    assert [key(r) for r in top2] == sorted(key(r) for r in allr)[:2]


def test_validation(spark):
    df = _df(spark, ["a b"])
    with pytest.raises(ValueError, match="min_count"):
        collocations(df, k=0)
    with pytest.raises(ValueError, match="min_count"):
        collocations(df, min_count=0)


def test_no_cache_manager_entries(spark):
    """r14: the count tables are eager localCheckpoints, not caches —
    the operator must leave the session CacheManager untouched at every
    point of its lifecycle (the leak-proof property the old
    cache-released-on-GC test pinned, now unconditional)."""
    out = collocations(_df(spark, ["a b c"] * 4), k=5, min_count=1)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    out.collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_plan_take_ordered_no_hint_no_cartesian_blowup(spark):
    out = collocations(_df(spark, ["a b c d e"] * 10), k=5, min_count=1)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, "collocations forces a join hint"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "top-k fell back to a global sort"
