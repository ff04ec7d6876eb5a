"""Property fuzz of the round-7 operators against straight-line Python
models: degree-ordered triangle counting vs a brute-force triple scan,
gap fill vs a dict model, heavy hitters vs a sort, char entropy vs a
Counter — random inputs, exact agreement."""

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NODES = list(range(8))
edge_st = st.tuples(st.sampled_from(NODES), st.sampled_from(NODES))


def round6(x: float) -> float:
    """Spark F.round semantics: half away from zero (Python round() is
    banker's — the verified cross-engine pitfall)."""
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1_000_000 + 0.5) / 1_000_000


def brute_triangles(edges):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in und for n in e})
    per = defaultdict(int)
    ns = nodes
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            if (a, b) not in und:
                continue
            for c in ns:
                if c <= b:
                    continue
                if (a, c) in und and (b, c) in und:
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
    return {n: per[n] for n in nodes}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(edge_st, min_size=1, max_size=20))
def test_triangle_counts_match_brute_force(spark, edges):
    from apache_cassandra_spark.analytics.graph import triangle_counts

    want = brute_triangles(edges)
    if not want:  # all self-loops -> empty simple graph
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 20)), min_size=1, max_size=30
    )
)
def test_gap_fill_matches_model(spark, rows):
    from apache_cassandra_spark.analytics.temporal import gap_fill

    df = spark.createDataFrame(rows, "k long, d long")
    got = sorted(map(tuple, gap_fill(df, "k", "d").collect()))
    counts = Counter(rows)
    want = []
    for k in {r[0] for r in rows}:
        ds = [d for kk, d in rows if kk == k]
        for d in range(min(ds), max(ds) + 1):
            want.append((k, d, counts[(k, d)]))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 6)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 4),
)
def test_heavy_hitters_match_model(spark, rows, k):
    from apache_cassandra_spark.analytics.sketches import heavy_hitters

    df = spark.createDataFrame(rows, "g string, u long")
    got = sorted(map(tuple, heavy_hitters(df, ["g"], "u", k=k).collect()))
    want = []
    counts = Counter(rows)
    for g in {r[0] for r in rows}:
        items = sorted(
            ((c, u) for (gg, u), c in counts.items() if gg == g),
            key=lambda t: (-t[0], t[1]),
        )
        for rk, (c, u) in enumerate(items[:k], 1):
            want.append((g, u, c, rk))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="abcX ?\r\n ", max_size=30), min_size=1, max_size=8
    )
)
def test_char_entropy_matches_model(spark, texts):
    from apache_cassandra_spark.analytics.text import char_entropy

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    terminators = set("\n\r  ")
    for i, t in rows:
        counts = Counter(c for c in t if c not in terminators)
        n = sum(counts.values())
        if n == 0:
            assert i not in got
            continue
        # Spark round() is half-away-from-zero; c*ln(c) >= 0 so +0.5 floor works
        sum_micro = sum(math.floor(c * math.log(c) * 1_000_000 + 0.5) for c in counts.values())
        assert got[i]["n_chars_counted"] == n
        assert got[i]["sum_clnc_micro"] == sum_micro
        want_entropy = round6(math.log(n) - sum_micro / n / 1_000_000)
        assert abs(got[i]["entropy"] - want_entropy) < 1e-9


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 40), st.integers(-9, 9), st.integers(-9, 9)),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    thresh=st.sampled_from([0.0, 0.5, 0.9]),
)
def test_range_search_matches_model(spark, vals, thresh):
    from apache_cassandra_spark.analytics.similarity import range_search

    rows = [(i, [float(x), float(y)]) for i, x, y in vals if (x, y) != (0, 0)]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = {rows[0][0]}
    q = df.where(df.vec_id.isin(*qids))
    got = sorted(
        (r["query_id"], r["corpus_id"], r["cos"]) for r in range_search(df, q, threshold=thresh).collect()
    )
    want = []
    by_id = dict(rows)
    for qi in qids:
        qa, qb = by_id[qi]
        for ci, (ca, cb) in by_id.items():
            if ci == qi:
                continue
            # mirror similarity.cosine exactly: sqrt of the self-dot, not hypot
            cos = round6(
                (qa * ca + qb * cb)
                / (math.sqrt(qa * qa + qb * qb) * math.sqrt(ca * ca + cb * cb))
            )
            if cos >= thresh:
                want.append((qi, ci, cos))
    assert got == sorted(want)
