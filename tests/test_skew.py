"""Salted aggregation / replicate-salt join: result-equivalence with the
unsalted plan on a zipf-skewed frame, multiplicity preservation, and
input validation."""

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.functions.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # 900 rows of the hot key, 10 keys x 10 rows tail
    rows = [(i, "hot", float(i % 7)) for i in range(900)]
    rows += [(1000 + k * 10 + j, f"k{k}", float(j)) for k in range(10) for j in range(10)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_salted_agg_equals_plain_agg(spark, skewed):
    got = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed, ["k"],
            {"n": ("count", "id"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            n_salts=8, salt_on="id",
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")}, salt_on="id")
    with pytest.raises(ValueError, match="salt_on"):
        salted_agg(skewed, ["k"], {"n": ("count", "id")})


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k0", 3), ("missing", 4)], "dk string, tag int"
    )
    got = sorted(
        (r["id"], r["tag"])
        for r in salted_join(skewed, dim, on=[("k", "dk")], n_salts=4, salt_on="id").collect()
    )
    want = sorted(
        (r["id"], r["tag"])
        for r in skewed.join(dim, skewed["k"] == dim["dk"]).collect()
    )
    assert got == want and len(got) == 900 + 2 * 10  # dup dim rows preserved


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "dk string, tag int")
    out = salted_join(skewed, dim, on=[("k", "dk")], n_salts=4, salt_on="id", how="left")
    assert out.count() == skewed.count()  # exactly one replica matches per row
    assert out.where(F.col("tag").isNull()).count() == 100


def test_salted_join_rejects_right_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "dk string, tag int")
    with pytest.raises(ValueError, match="unsupported how"):
        salted_join(skewed, dim, on=[("k", "dk")], how="right", salt_on="id")


def test_salted_join_null_salt_and_key_rows_preserved(spark):
    """NULL in the salt column must not drop rows: hash(NULL) would be
    NULL and the salt equality would never match (review finding)."""
    big = spark.createDataFrame(
        [(None, 10, "null-salt"), (1, 10, "x"), (2, 99, "no-match")],
        "id long, k long, payload string",
    )
    dim = spark.createDataFrame([(10, "d")], "sk long, tag string")
    got = sorted(r["payload"] for r in
                 salted_join(big, dim, on=[("k", "sk")], n_salts=4, salt_on="id").collect())
    want = sorted(r["payload"] for r in big.join(dim, big["k"] == dim["sk"]).collect())
    assert got == want == ["null-salt", "x"]


def test_user_salt_column_survives(spark):
    """A user column literally named `_salt` must pass through both
    transforms untouched (review finding: the working column used to
    clobber it)."""
    big = spark.createDataFrame(
        [(1, "k", "keep-me"), (2, "k", "me-too")], "id long, k string, _salt string"
    )
    dim = spark.createDataFrame([("k", "d")], "dk string, tag string")
    out = salted_join(big, dim, on=[("k", "dk")], n_salts=4, salt_on="id")
    assert sorted(r["_salt"] for r in out.collect()) == ["keep-me", "me-too"]
    agg = salted_agg(big, ["_salt"], {"n": ("count", "id")}, n_salts=4, salt_on="id")
    assert {(r["_salt"], r["n"]) for r in agg.collect()} == {("keep-me", 1), ("me-too", 1)}


def test_salted_agg_null_salt_rows_counted(spark):
    df = spark.createDataFrame([(None, "k", 1.0), (1, "k", 2.0)], "id long, k string, v double")
    got = salted_agg(df, ["k"], {"n": ("count", "id"), "s": ("sum", "v")},
                     n_salts=4, salt_on="id").collect()[0]
    assert (got["n"], got["s"]) == (2, 3.0)
