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


def hits_model(edges, iters=2):
    from apache_cassandra_spark.analytics.graph import MICRO

    w = defaultdict(int)
    for s, d in edges:
        w[(s, d)] += 1
    nodes = {n for e in w for n in e}

    def norm(raw):
        mx = max(raw.values())
        return {n: (v * MICRO) // mx if mx > 0 else 0 for n, v in raw.items()}

    h = {n: MICRO for n in nodes}
    a = None
    for _ in range(iters):
        a_raw = {n: 0 for n in nodes}
        for (s, d), c in w.items():
            a_raw[d] += h[s] * c
        a = norm(a_raw)
        h_raw = {n: 0 for n in nodes}
        for (s, d), c in w.items():
            h_raw[s] += a[d] * c
        h = norm(h_raw)
    return {n: (h[n], a[n]) for n in nodes}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=graph_st, iters=st.integers(1, 3))
def test_hits_matches_python_model(spark, edges, iters):
    from apache_cassandra_spark.analytics.graph import hits

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(df, iters=iters).collect()
    }
    assert got == hits_model(edges, iters)


def test_hits_hub_vs_authority_roles(spark):
    """Star-out node is the top hub with zero authority; its targets are
    authorities with zero hub score; top score pinned at MICRO."""
    from apache_cassandra_spark.analytics.graph import MICRO, hits

    df = spark.createDataFrame(
        [("hub", "p1"), ("hub", "p2"), ("hub", "p2")], "src string, dst string"
    )
    got = {r["node"]: r for r in hits(df, iters=2).collect()}
    assert got["hub"]["hub_micro"] == MICRO and got["hub"]["auth_micro"] == 0
    assert got["p2"]["auth_micro"] == MICRO  # heavier in-edge: top authority
    assert 0 < got["p1"]["auth_micro"] < MICRO
    assert got["p1"]["hub_micro"] == got["p2"]["hub_micro"] == 0


def test_connected_components_wrapper(spark):
    from apache_cassandra_spark.analytics.graph import connected_components

    df = spark.createDataFrame([(2, 1), (3, 2), (8, 9)], "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_hits_overflow_guard_raises(spark):
    """A raw score past the int64-safe normalization ceiling must fail
    loudly, not wrap silently into garbage scores."""
    from apache_cassandra_spark.analytics.graph import hits

    df = spark.createDataFrame([("a", "b", 10_000_000_000)], "src string, dst string, w long")
    with pytest.raises(Exception, match="ceiling|USER_RAISED"):
        hits(df, weight_col="w", iters=1)


def test_dedup_spans_packing_bounds_raise(spark):
    from apache_cassandra_spark.analytics.dedup import dedup_spans

    df = spark.createDataFrame(
        [(-1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packing bounds|USER_RAISED"):
        dedup_spans(df, k=4).collect()


def lpa_model(edges, iters=2):
    und = defaultdict(int)
    for s, d in edges:
        und[(s, d)] += 1
        und[(d, s)] += 1
    nodes = {n for e in und for n in e}
    lab = {n: n for n in nodes}
    for _ in range(iters):
        votes = defaultdict(lambda: defaultdict(int))
        for (u, v), w in und.items():
            votes[u][lab[v]] += w
        lab = {
            u: min(l for l, ws in vs.items() if ws == max(vs.values()))
            for u, vs in votes.items()
        }
    return lab


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=graph_st, iters=st.integers(1, 3))
def test_label_propagation_matches_python_model(spark, edges, iters):
    from apache_cassandra_spark.analytics.graph import label_propagation

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == lpa_model(edges, iters)


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: each triangle converges to
    its own min-label community."""
    from apache_cassandra_spark.analytics.graph import label_propagation

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(tri1 + tri2 + [("c", "x")], "src string, dst string")
    got = {r["node"]: r["community"] for r in label_propagation(df, iters=3).collect()}
    # converged fixpoint: each triangle one community, labels distinct
    # (tri2's label is "c" — propagated through the bridge — not "x";
    # what matters is the two-community structure)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "c"
    assert got == lpa_model(tri1 + tri2 + [("c", "x")], 3)
