"""clustering_coefficient: exact cc over hand-built graphs, simple-graph
canonicalization (NULLs / self-loops / duplicate+reversed edges), and the
integer micro-division contract cc_micro = (2T·10⁶) div (d(d−1))."""

from apache_cassandra_spark.analytics.graph import clustering_coefficient


def _rows(df):
    return {r["node"]: (r["deg"], r["n_triangles"], r["cc_micro"]) for r in df.collect()}


def test_triangle_plus_pendant(spark):
    # triangle {1,2,3} with a pendant 3—4: node 3 has deg 3, one of its
    # three neighbor pairs closed -> 2*1e6 div (3*2) = 333333 (truncated)
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    out = _rows(clustering_coefficient(e))
    assert out[1] == (2, 1, 1_000_000)
    assert out[2] == (2, 1, 1_000_000)
    assert out[3] == (3, 1, 333_333)
    assert out[4] == (1, 0, 0)


def test_nulls_self_loops_duplicates_collapse(spark):
    # reversed, repeated, self-loop, and NULL-endpoint edges all reduce
    # to the simple triangle — same canonicalization as triangle_counts
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (None, 2), (2, 3), (1, 3), (1, 3)],
        "src long, dst long",
    )
    out = _rows(clustering_coefficient(e))
    assert out == {
        1: (2, 1, 1_000_000),
        2: (2, 1, 1_000_000),
        3: (2, 1, 1_000_000),
    }


def test_square_has_no_triangles(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    out = _rows(clustering_coefficient(e))
    assert set(out) == {1, 2, 3, 4}
    assert all(v == (2, 0, 0) for v in out.values())


def test_complete_k4_scores_one(spark):
    e = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], "src long, dst long"
    )
    out = _rows(clustering_coefficient(e))
    assert all(v == (3, 3, 1_000_000) for v in out.values())
