"""temporal.resample_ohlc: bucket assignment, deterministic open/close by
the (ts, tie) total order, and the no-float-sum exactness contract."""

from apache_cassandra_spark.analytics.temporal import resample_ohlc


def _run(spark, rows, bucket=10):
    df = spark.createDataFrame(rows, "k string, ts long, eid long, value double")
    out = resample_ohlc(df, ["k"], "ts", "value", bucket, "eid")
    return {(r["k"], r["bucket"]): r.asDict() for r in out.collect()}


def test_buckets_and_ohlc_fields(spark):
    out = _run(
        spark,
        [
            ("a", 1, 1, 5.0),
            ("a", 3, 2, 9.0),
            ("a", 9, 3, 2.0),
            ("a", 12, 4, 7.0),
            ("b", 5, 5, 1.0),
        ],
    )
    r = out[("a", 0)]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_rows"]) == (
        5.0,
        9.0,
        2.0,
        2.0,
        3,
    )
    r1 = out[("a", 1)]
    assert (r1["open"], r1["close"], r1["n_rows"]) == (7.0, 7.0, 1)
    assert out[("b", 0)]["n_rows"] == 1


def test_equal_ts_tie_broken_by_tie_col(spark):
    # same timestamp: eid 1 is first (open), eid 2 is last (close)
    out = _run(spark, [("a", 5, 2, 10.0), ("a", 5, 1, 20.0)])
    r = out[("a", 0)]
    assert r["open"] == 20.0
    assert r["close"] == 10.0
    assert r["high"] == 20.0 and r["low"] == 10.0


def test_single_row_open_equals_close(spark):
    out = _run(spark, [("a", 42, 1, 3.5)], bucket=100)
    r = out[("a", 0)]
    assert r["open"] == r["close"] == r["high"] == r["low"] == 3.5
    assert r["n_rows"] == 1


def test_open_close_are_row_values_not_extremes(spark):
    # the open/close need not be the min/max values — they are the
    # first/last ROW's value in (ts, eid) order
    out = _run(spark, [("a", 1, 1, 5.0), ("a", 2, 2, 99.0), ("a", 3, 3, 6.0)])
    r = out[("a", 0)]
    assert (r["open"], r["close"]) == (5.0, 6.0)
    assert (r["high"], r["low"]) == (99.0, 5.0)


def test_negative_tie_raises_loudly(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 5, -1, 1.0)], "k string, ts long, eid long, value double"
    )
    with pytest.raises(Exception, match="resample_ohlc"):
        resample_ohlc(df, ["k"], "ts", "value", 10, "eid").collect()


def test_negative_ts_bucket_and_order(spark):
    # the decimal pack stays lexicographic for negative timestamps as
    # long as the tie is non-negative
    out = _run(spark, [("a", -15, 1, 3.0), ("a", -12, 2, 8.0), ("a", 5, 3, 1.0)])
    # Spark `div` truncates toward zero: -15 div 10 == -12 div 10 == -1
    r = out[("a", -1)]
    assert (r["open"], r["close"], r["n_rows"]) == (3.0, 8.0, 2)
    assert out[("a", 0)]["n_rows"] == 1


def test_null_tie_error_names_null_not_negative(spark):
    """A NULL tie row must fail with the NULL-specific message (drop or
    fill), not the negative-value remedy that cannot fix a NULL
    (round-8 review)."""
    import pytest
    from pyspark.sql import functions as F, utils as _u
    from apache_cassandra_spark.analytics.temporal import resample_ohlc

    df = spark.createDataFrame(
        [("k", 10, 1.0, 1), ("k", 20, 2.0, None)],
        "key string, ts long, value double, eid int",
    )
    with pytest.raises(Exception, match="NULL eid.*drop or fill"):
        resample_ohlc(df, ["key"], "ts", "value", 100, "eid").collect()
