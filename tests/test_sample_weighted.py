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
