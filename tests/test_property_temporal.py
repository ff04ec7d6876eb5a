"""Property fuzz of asof_join against a straight-line Python model:
newest right row at-or-before each left row per key, deterministic
max-payload winner on (key, time) ties, tolerance expiry."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.analytics.temporal import asof_join

KEYS = [1, 2]
TIMES = st.integers(min_value=0, max_value=6)
left_st = st.lists(st.tuples(st.sampled_from(KEYS), TIMES), min_size=1, max_size=6)
right_st = st.lists(
    st.tuples(st.sampled_from(KEYS), TIMES, st.sampled_from(["a", "b", "z"])),
    min_size=0,
    max_size=6,
)


def python_model(left, right, tolerance):
    # reduce right: per (key, time) the max payload tuple wins
    reduced = {}
    for k, t, tag in right:
        cur = reduced.get((k, t))
        if cur is None or (tag,) > cur:
            reduced[(k, t)] = (tag,)
    out = []
    for i, (k, lt) in enumerate(left):
        cands = [t for (rk, t) in reduced if rk == k and t <= lt]
        mt = max(cands) if cands else None
        if mt is not None and tolerance is not None and mt < lt - tolerance:
            mt = None
        out.append((k, lt, i, mt, reduced[(k, mt)][0] if mt is not None else None))
    return sorted(out)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(left=left_st, right=right_st, tolerance=st.sampled_from([None, 0, 2]))
def test_asof_join_matches_python_model(spark, left, right, tolerance):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, lt long, lid long"
    )
    rdf = spark.createDataFrame(right, "k long, rt long, tag string")
    got = sorted(
        (r["k"], r["lt"], r["lid"], r["rt_right"], r["tag_right"])
        for r in asof_join(ldf, rdf, "k", "lt", "rt", tolerance=tolerance).collect()
    )
    assert got == python_model(left, right, tolerance)
