"""The local gate replica (tools/check_oracle.py) must PREDICT the driver,
not stringify past it: the driver canonicalizes results with pandas
``sort_values``, which crashes on array/struct/map cells (round-5's
``embedding_pq_encode`` red row), so the replica must hard-fail any
non-scalar output column on either side — and every DECLARED gate query
must emit only scalar columns."""

import sys

import pyarrow as pa
import pytest

sys.path.insert(0, "tools")

from check_oracle import nonscalar_arrow_cols, nonscalar_spark_cols  # noqa: E402


def test_spark_array_output_rejected(spark):
    df = spark.createDataFrame([(1, [1, 2])], "id int, codes array<int>")
    assert nonscalar_spark_cols(df.schema) == ["codes"]


def test_spark_struct_and_map_output_rejected(spark):
    df = spark.createDataFrame(
        [(1, (1, 2), {"a": 1})], "id int, s struct<x:int,y:int>, m map<string,int>"
    )
    assert nonscalar_spark_cols(df.schema) == ["s", "m"]


def test_spark_scalar_output_accepted(spark):
    df = spark.createDataFrame([(1, "a", 2.0, b"x")], "id int, s string, d double, b binary")
    assert nonscalar_spark_cols(df.schema) == []


def test_arrow_list_output_rejected():
    tbl = pa.table({"id": [1], "codes": [[1, 2]]})
    assert nonscalar_arrow_cols(tbl.schema) == ["codes"]


def test_arrow_struct_output_rejected():
    tbl = pa.table({"id": [1], "s": [{"x": 1}]})
    assert nonscalar_arrow_cols(tbl.schema) == ["s"]


def test_arrow_scalar_output_accepted():
    tbl = pa.table({"id": [1], "v": [1.5], "s": ["a"]})
    assert nonscalar_arrow_cols(tbl.schema) == []


def test_declared_gate_queries_have_scalar_schemas(spark, tmp_path):
    """Every declared queries() entry must produce a scalar-only schema —
    schema inference only, no execution (the full value gate is
    tools/check_oracle.py)."""
    from __spark_entry__ import queries

    sf_dir = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception:
            continue  # execution problems are the oracle gate's job
        cols = nonscalar_spark_cols(df.schema)
        if cols:
            bad[name] = cols
    assert not bad, f"gate queries with non-scalar output columns: {bad}"
