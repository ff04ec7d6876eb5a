"""Count-min sketch (sketches.cm_sketch / cm_estimate): the classical
guarantees — never an underestimate, exact at collision-free width,
mergeable by addition — plus plan hygiene (no forced broadcast)."""

from collections import Counter

from pyspark.sql import functions as F

from apache_cassandra_spark.analytics.sketches import cm_estimate, cm_sketch

ROWS = [(("a" if i % 7 else "b"), i % 11) for i in range(200)]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, ["grp", "item"])


def _est(spark, depth=4, width=256, rows=ROWS):
    df = _df(spark, rows)
    sk = cm_sketch(df, "item", ["grp"], depth=depth, width=width)
    items = df.select("grp", "item").distinct()
    out = cm_estimate(sk, items, "item", ["grp"], depth=depth, width=width)
    return {(r["grp"], r["item"]): r["est"] for r in out.collect()}


def test_never_underestimates_and_exact_at_wide_width(spark):
    truth = Counter((g, i) for g, i in ROWS)
    # width 2 forces heavy collisions: still an overestimate everywhere
    narrow = _est(spark, depth=2, width=2)
    assert set(narrow) == set(truth)
    assert all(narrow[k] >= c for k, c in truth.items())
    # width far above distinct items: collision-free, exact
    wide = _est(spark, depth=4, width=4096)
    assert wide == dict(truth)


def test_sketches_merge_by_addition(spark):
    half_a, half_b = ROWS[:100], ROWS[100:]
    sk_a = cm_sketch(_df(spark, half_a), "item", ["grp"])
    sk_b = cm_sketch(_df(spark, half_b), "item", ["grp"])
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("grp", "d", "w", "width")
        .agg(F.sum("c").cast("long").alias("c"))
        .select("grp", "d", "w", "c", "width")
    )
    whole = cm_sketch(_df(spark), "item", ["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_absent_item_reads_zero_when_buckets_empty(spark):
    rows = [("g", 1)]
    df = _df(spark, rows)
    sk = cm_sketch(df, "item", ["grp"], depth=4, width=4096)
    probe = spark.createDataFrame([("g", 999)], ["grp", "item"])
    out = cm_estimate(sk, probe, "item", ["grp"], depth=4, width=4096).collect()
    assert out[0]["est"] == 0


def test_width_mismatch_raises_both_directions(spark):
    """ADVICE r7: a sketch NARROWER than the probe's width used to slip
    through a max(w)-based check (every bucket id fits) and silently
    return 0 for present items; the recorded width column catches both
    directions now."""
    import pytest

    df = _df(spark)
    narrow = cm_sketch(df, "item", ["grp"], depth=4, width=64)
    items = df.select("grp", "item").distinct()
    with pytest.raises(ValueError, match="width mismatch"):
        cm_estimate(narrow, items, "item", ["grp"], depth=4, width=256)
    wide = cm_sketch(df, "item", ["grp"], depth=4, width=512)
    with pytest.raises(ValueError, match="width mismatch"):
        cm_estimate(wide, items, "item", ["grp"], depth=4, width=256)
    mixed = narrow.unionByName(wide)
    with pytest.raises(ValueError, match="mixed-width"):
        cm_estimate(mixed, items, "item", ["grp"], depth=4, width=64)


def test_no_forced_hint(spark):
    df = _df(spark)
    sk = cm_sketch(df, "item", ["grp"])
    out = cm_estimate(sk, df.select("grp", "item").distinct(), "item", ["grp"])
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()
