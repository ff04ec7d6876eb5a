"""Test helpers: build cell frames and CF handles from python literals."""

from __future__ import annotations

from apache_cassandra_spark.catalog import CFDef
from apache_cassandra_spark.functions.tokens import OrderPreservingPartitioner, RandomPartitioner
from apache_cassandra_spark.model import CF
from apache_cassandra_spark.sources.cellstore import CELL_SCHEMA, CONTAINER_TOMBSTONE_SCHEMA


def cell(key, column, value, ts, sc=None, tombstone=False, ldt=None):
    return (key, sc, column, value, ts, tombstone, ldt)


def make_cf(
    spark,
    cells,
    ctombs=None,
    column_type="Standard",
    compare_with="BytesType",
    compare_subcolumns_with="BytesType",
    order_preserving=False,
):
    cfdef = CFDef(
        name="t",
        column_type=column_type,
        compare_with=compare_with,
        compare_subcolumns_with=compare_subcolumns_with,
    )
    cells_df = spark.createDataFrame(cells, CELL_SCHEMA)
    tombs_df = spark.createDataFrame(ctombs or [], CONTAINER_TOMBSTONE_SCHEMA)
    part = OrderPreservingPartitioner() if order_preserving else RandomPartitioner()
    return CF(cfdef=cfdef, cells=cells_df, container_tombstones=tombs_df, partitioner=part)


def col_names(df):
    """Collect result column names (bytes) in result order."""
    return [bytes(r["column"]) for r in df.collect()]


def cell_pairs(df):
    return sorted((r["key"], bytes(r["column"]), bytes(r["value"])) for r in df.collect())
