"""k-core decomposition (analytics.graph.k_core): cascade correctness on
structured graphs (paths peel from the ends inward, stars die leaf-first,
cliques survive), bounded-vs-converged equivalence, and a hypothesis fuzz
against a straight-line Python peel model."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.analytics.graph import k_core


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"]) if edges else spark.createDataFrame(
        [], "src int, dst int"
    )
    return {r["node"]: r["degree"] for r in k_core(df, **kw).collect()}


def python_peel(edges, k, rounds=None):
    E = set()
    for a, b in edges:
        if a is not None and b is not None and a != b:
            E.add((min(a, b), max(a, b)))
    r = 0
    while rounds is None or r < rounds:
        deg = Counter()
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        E2 = {(a, b) for a, b in E if a in keep and b in keep}
        if E2 == E:
            break
        E = E2
        r += 1
    deg = Counter()
    for a, b in E:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


def test_clique_survives_path_dies(spark):
    # K4 on 1-4 plus a path 4-5-6-7 hanging off it
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    path = [(4, 5), (5, 6), (6, 7)]
    out = _run(spark, clique + path, k=2)
    # path peels from the free end inward: 7 then 6 then 5; K4 remains,
    # node 4's degree drops back to its in-clique 3
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_path_cascade_needs_many_rounds(spark):
    # a 9-node path at k=2 dies end-inward — ceil(n/2) cascade rounds,
    # the structure a single degree filter cannot produce
    path = [(i, i + 1) for i in range(1, 9)]
    assert _run(spark, path, k=2) == {}
    # bounded replay stops mid-cascade: after 2 rounds the outer 2 nodes
    # of each end are gone, 5 survive as a shorter path
    assert _run(spark, path, k=2, rounds=2) == python_peel(path, 2, rounds=2)


def test_star_dies_at_k2(spark):
    star = [(0, i) for i in range(1, 8)]
    assert _run(spark, star, k=2) == {}
    # one bounded round removes only the leaves; the hub (now isolated)
    # still falls in the same round's edge restriction
    assert _run(spark, star, k=2, rounds=1) == {}


def test_k_zero_and_rounds_zero_return_simple_graph_degrees(spark):
    edges = [(1, 2), (2, 1), (2, 2), (2, 3), (None, 1)]
    expected = {1: 1, 2: 2, 3: 1}  # dedup + self-loop/null drop
    assert _run(spark, edges, k=0) == expected
    assert _run(spark, edges, k=5, rounds=0) == expected


def test_empty_and_fully_peeled_inputs(spark):
    assert _run(spark, [], k=2) == {}
    assert _run(spark, [(1, 2)], k=2) == {}


def test_unconverged_raises(spark):
    path = [(i, i + 1) for i in range(1, 9)]
    with pytest.raises(Exception, match="did not converge"):
        k_core(
            spark.createDataFrame(path, ["src", "dst"]), k=2, max_iters=2
        ).collect()


def test_emptying_on_final_round_is_converged(spark):
    # a 9-node path at k=2 loses its 2 endpoints per round: 8→6→4→2→0
    # edges, emptying EXACTLY at round 4 — a fixpoint, not a
    # non-convergence (regression: the empty check used to live at the
    # top of the next iteration, so max_iters==4 spuriously raised)
    path = [(i, i + 1) for i in range(1, 9)]
    assert _run(spark, path, k=2, max_iters=4) == {}
    with pytest.raises(Exception, match="did not converge"):
        k_core(
            spark.createDataFrame(path, ["src", "dst"]), k=2, max_iters=3
        ).collect()


NODES = list(range(8))
edge_st = st.tuples(st.sampled_from(NODES), st.sampled_from(NODES))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(edge_st, min_size=1, max_size=20),
    k=st.integers(1, 4),
    rounds=st.sampled_from([None, 1, 2, 6]),
)
def test_fuzz_matches_python_model(spark, edges, k, rounds):
    assert _run(spark, edges, k=k, rounds=rounds) == python_peel(
        edges, k, rounds=rounds
    )


def test_kcore_no_forced_hint_and_aqe_broadcast(spark):
    """The peel's survivor semi-joins carry no forced join hint (the
    survivor set starts corpus-sized — same rule as the reconcile
    watermark fix); at tiny scale AQE still picks BroadcastHashJoin on
    its own for the final round's joins."""
    edges = [(i, i + 1) for i in range(1, 9)] + [
        (a, b) for a in range(20, 24) for b in range(a + 1, 24)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = k_core(df, k=2, rounds=1)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, "k_core forces a join hint"
    out.collect()
    final = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # the round's two survivor LeftSemi joins both resolve to broadcast
    # at this scale; the checkpointed edge scan hides earlier rounds
    assert "SortMergeJoin" not in final


# ---------------------------------------------------------------------------
# coreness (full decomposition, h-index refinement)
# ---------------------------------------------------------------------------

from apache_cassandra_spark.analytics.graph import coreness  # noqa: E402


def python_coreness(edges):
    """Textbook min-degree peel (Batagelj–Zaveršnik order)."""
    adj = {}
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    deg = {n: len(ns) for n, ns in adj.items()}
    live = dict(adj)
    while live:
        n = min(live, key=lambda x: (deg[x], x))
        core[n] = max(core.get(n, 0), deg[n])
        # peel n at its current degree: neighbors keep max(core so far)
        k = core[n]
        for m in live[n]:
            if m in live and m != n:
                live[m].discard(n)
                deg[m] = len(live[m])
                core[m] = max(core.get(m, 0), k)  # coreness is monotone in peel order
        del live[n]
    # standard formulation: coreness of n = k at the moment n is removed
    # in min-degree order, where k is the running maximum of the removal
    # degree. The loop above implements exactly that via core[n].
    return core


def _core_run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["coreness"] for r in coreness(df, **kw).collect()}


def test_coreness_structured(spark):
    # K4 (coreness 3 each) + path tail 4-5-6 (coreness 1) + triangle
    # 7-8-9 (coreness 2), bridge 4-7
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tail = [(4, 5), (5, 6)]
    tri = [(7, 8), (8, 9), (7, 9), (4, 7)]
    out = _core_run(spark, k4 + tail + tri)
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1, 7: 2, 8: 2, 9: 2}


def test_coreness_consistent_with_kcore(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [
        (4, 5),
        (5, 6),
        (6, 4),
        (6, 7),
    ]
    cores = _core_run(spark, edges)
    for k in (1, 2, 3):
        survivors = set(_run(spark, edges, k=k))
        assert survivors == {n for n, c in cores.items() if c >= k}


NODES2 = list(range(7))
edge_st2 = st.tuples(st.sampled_from(NODES2), st.sampled_from(NODES2))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(edge_st2, min_size=1, max_size=16))
def test_coreness_fuzz_matches_python_model(spark, edges):
    # raw edges go straight to the operator — its own self-loop /
    # duplicate / reversed-edge collapse is part of what's under test
    # (the python model cleans independently)
    if not any(a != b for a, b in edges):
        return
    assert _core_run(spark, edges) == python_coreness(edges)


def test_coreness_no_forced_hint(spark):
    """The estimate table is |V|-row (corpus-sized) — no forced join
    hint anywhere in a refinement round; same rule as the k_core
    survivor joins and the reconcile watermark fix. (Round 8 merged the
    original smaller-graph variant of this test into this one — same
    name, so the two silently shadowed.)"""
    edges = [(i, i + 1) for i in range(1, 9)] + [
        (a, b) for a in range(20, 24) for b in range(a + 1, 24)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = coreness(df, rounds=2)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, "coreness forces a join hint"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_coreness_bounded_rounds_match_sql_unroll_shape(spark):
    """rounds=N must equal a literal N-round h-index refinement — the
    contract the docs_coreness oracle unroll relies on. Replayed here
    against the python model refined the same bounded number of
    rounds."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 3), (2, 4)]
    # python model: est0 = degree; est_r = h-index of neighbors' est_{r-1}
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    est = {n: len(v) for n, v in adj.items()}
    for _ in range(2):
        new = {}
        for n, nbrs in adj.items():
            vals = sorted((est[m] for m in nbrs), reverse=True)
            new[n] = max(min(i + 1, v) for i, v in enumerate(vals))
        est = new
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["coreness"] for r in coreness(df, rounds=2).collect()}
    assert got == est
