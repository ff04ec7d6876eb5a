"""Property fuzz of integer-exact PageRank (analytics.graph.pagerank)
against a straight-line Python model: identical micro-unit fixpoint on
random multigraphs (parallel edges fold into weights, self-loops and
dangling/source-only nodes included) across iteration counts and damping
rationals."""

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.analytics.graph import MICRO, pagerank

NODES = ["a", "b", "c", "d"]
edge_st = st.tuples(st.sampled_from(NODES), st.sampled_from(NODES))
graph_st = st.lists(edge_st, min_size=1, max_size=10)


def python_model(edges, iters, num, den):
    w = defaultdict(int)
    for s, d in edges:
        w[(s, d)] += 1
    wout = defaultdict(int)
    for (s, _), c in w.items():
        wout[s] += c
    nodes = {n for e in w for n in e}
    base = (MICRO * (den - num)) // den
    r = {n: MICRO for n in nodes}
    for _ in range(iters):
        acc = defaultdict(int)
        for (a, b), c in w.items():
            acc[b] += (r[a] * c) // wout[a]
        r = {n: base + (num * acc[n]) // den for n in nodes}
    return r


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=graph_st, iters=st.integers(1, 4), num_den=st.sampled_from([(85, 100), (1, 2), (9, 10)]))
def test_pagerank_matches_python_model(spark, edges, iters, num_den):
    num, den = num_den
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(df, iters=iters, damping_num=num, damping_den=den).collect()
    }
    assert got == python_model(edges, iters, num, den)


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_num=100, damping_den=100)
