"""Op-stat pipeline analog (fork §2.7#8, reference stat/create.sql:1-40):
every Engine op call aggregates into (op, keyspace) rows with calls /
duration min-avg-max / failures, materializable as a DataFrame."""

import pytest

from apache_cassandra_spark.catalog import Catalog
from apache_cassandra_spark.engine import Engine
from apache_cassandra_spark.model import ColumnPath, SlicePredicate, SliceRange


@pytest.fixture()
def engine(spark, tmp_path):
    cat = Catalog.from_dict({"KS": {"CF": {"compare_with": "UTF8Type"}}})
    return Engine(spark, str(tmp_path), cat)


def test_op_stats_aggregate_and_materialize(spark, engine):
    engine.insert("KS", "k1", ColumnPath("CF", column=b"c"), b"v", 1)
    engine.insert("KS", "k2", ColumnPath("CF", column=b"c"), b"v", 1)
    pred = SlicePredicate(slice_range=SliceRange(count=10))
    engine.get_slice("KS", "k1", "CF", pred).collect()

    rows = {(r[3], r[6]): r for r in engine.stats.snapshot()}
    ins = rows[("insert", "KS")]
    assert ins[7] == 2  # calls
    assert ins[11] == 0  # failures
    assert ins[9] <= ins[8] <= ins[10]  # min <= avg <= max
    assert ("get_slice", "KS") in rows

    df = engine.stats.to_df(spark)
    assert df.where(df.group1 == "insert").collect()[0]["calls"] == 2
    assert df.columns[:5] == ["registered", "host_name", "group0", "group1", "group2"]


def test_op_stats_count_failures(engine):
    with pytest.raises(Exception):
        engine.insert("NoSuchKS", "k", ColumnPath("CF", column=b"c"), b"v", 1)
    row = {(r[3], r[6]): r for r in engine.stats.snapshot()}[("insert", "NoSuchKS")]
    assert row[7] == 1 and row[11] == 1  # one call, one failure


def test_op_stats_reset(engine):
    engine.insert("KS", "k1", ColumnPath("CF", column=b"c"), b"v", 1)
    engine.stats.reset()
    assert engine.stats.snapshot() == []
