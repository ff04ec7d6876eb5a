"""pipeline.sample_weighted — Efraimidis-Spirakis A-ES weighted
without-replacement sampling: exact-k membership, weight-proportional
inclusion, determinism, weight-edge policy, and the WindowGroupLimit
plan shape."""

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.analytics.pipeline import sample_weighted


def _docs(spark, n=2000):
    return spark.createDataFrame(
        [(i, "s", 10 if i % 2 == 0 else 1) for i in range(n)],
        "doc_id long, source string, w long",
    )


def test_exact_k_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", 1 + i % 7) for i in range(300)],
        "doc_id long, source string, w long",
    )
    out = sample_weighted(df, k=10, weight_col="w", strata_col="source")
    sizes = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"src0": 10, "src1": 10, "src2": 10}


def test_inclusion_tracks_weight(spark):
    """10x-weighted rows (evens) should dominate the sample. With 1000
    evens at w=10 and 1000 odds at w=1, the expected even share of a
    k=200 A-ES draw is ~95%; assert a loose 75% floor (the draw is
    deterministic, so this never flakes — it pins that the key math
    actually weights, e.g. a dropped /w would make this ~50%)."""
    out = sample_weighted(_docs(spark), k=200, weight_col="w")
    evens = sum(1 for r in out.collect() if r["doc_id"] % 2 == 0)
    assert evens > 150, f"only {evens}/200 high-weight rows sampled"


def test_deterministic_under_repartition(spark):
    d = _docs(spark, 500)
    a = sorted(r["doc_id"] for r in sample_weighted(d, 50, "w").collect())
    b = sorted(r["doc_id"] for r in sample_weighted(d.repartition(7), 50, "w").collect())
    assert a == b


def test_null_and_nonpositive_weights_dropped(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 1)],
        "doc_id long, w long",
    )
    out = sample_weighted(df, k=10, weight_col="w")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        sample_weighted(_docs(spark, 10), k=0, weight_col="w")


def test_plan_window_group_limit_no_hint(spark):
    out = sample_weighted(_docs(spark, 100), k=5, weight_col="w", strata_col="source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "rank did not compile to pre-truncating top-k"
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()


def test_nan_and_tiny_weights_do_not_crash(spark):
    """Review r8: NaN passes `> 0` in Spark's ordering and a positive
    weight below ~4.6e-9 overflows the nano-key long cast — both
    previously aborted the job under ANSI mode. NaN drops with the
    other never-sampleable weights; sub-nano weights floor at -2^62."""
    df = spark.createDataFrame(
        [(1, 5.0), (2, float("nan")), (3, 100.0), (4, float("nan")), (5, 1e-12)],
        "doc_id long, w double",
    )
    out = {r["doc_id"]: r["aes_key_nano"] for r in
           sample_weighted(df, k=10, weight_col="w").collect()}
    assert set(out) == {1, 3, 5}
    assert out[5] == -(2**62)


def test_quantized_ties_break_by_draw_not_id(spark):
    """Review r8: heavy weights collapse many rows onto key 0, and an
    id tie-break there would always pick the smallest ids. With a huge
    equal weight (every key quantizes to 0 or -1), the winners must be
    the rows with the LARGEST hash draws, not the smallest ids."""
    from apache_cassandra_spark.functions.hashing import uniform_hash

    n, k = 400, 25
    df = spark.createDataFrame(
        [(i, 10**15) for i in range(n)], "doc_id long, w long"
    )
    out = sample_weighted(df, k=k, weight_col="w")
    rows = out.collect()
    assert len(rows) == k
    assert all(r["aes_key_nano"] in (0, -1) for r in rows), "expected full key collapse"
    # replicate: among key ties, top draws win
    draws = {
        r["doc_id"]: (r["aes_key_nano"], r["d"])
        for r in df.select(
            "doc_id",
            uniform_hash("doc_id", 1 << 60).alias("d"),
        ).join(
            sample_weighted(df, k=n, weight_col="w").select("doc_id", "aes_key_nano"),
            "doc_id",
        ).collect()
    }
    expect = sorted(draws, key=lambda i: (-draws[i][0], -draws[i][1], i))[:k]
    assert sorted(r["doc_id"] for r in rows) == sorted(expect)
    # and it must NOT be the smallest-id prefix
    assert sorted(r["doc_id"] for r in rows) != list(range(k))
