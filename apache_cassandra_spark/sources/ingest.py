"""Relational table -> cell-layout ingestion.

The FIXTURES.md mapping of the driver's TPC-H-ish parquet tables onto
column families: one row per (key, column), column names = UTF-8 field
names, values = UTF-8 canonical string encodings. Deterministic (the driver
oracle re-derives the same mapping in ANSI SQL), fully JVM-side
(``unpivot`` + ``encode``; no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(c, dt: str):
    """Engine-canonical string encoding for a value, chosen so DuckDB can
    reproduce it exactly in SQL (see __spark_entry__.oracle_sql):

    * floats -> decimal(18,4) string (deterministic, no float-format drift)
    * timestamps -> 'yyyy-MM-dd HH:mm:ss'
    * everything else -> plain cast to string
    """
    if dt in ("double", "float"):
        return c.cast("decimal(18,4)").cast("string")
    if dt.startswith("timestamp"):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def cells_from_table(
    df: DataFrame,
    key_col: str,
    value_cols: list[str] | None = None,
    ts: int = 0,
    sc_col: str | None = None,
) -> DataFrame:
    """Unpivot a relational DataFrame into cell layout.

    ``sc_col`` maps to the supercolumn name (Super CF ingestion, e.g.
    lineitem keyed by l_orderkey with sc = l_linenumber).
    """
    dtypes = dict(df.dtypes)
    if value_cols is None:
        value_cols = [c for c in df.columns if c != key_col and c != sc_col]

    ids = [F.col(key_col).cast("string").alias("key")]
    if sc_col is not None:
        ids.append(F.encode(F.col(sc_col).cast("string"), "UTF-8").alias("sc"))
    else:
        ids.append(F.lit(None).cast("binary").alias("sc"))

    canon = df.select(*ids, *[_canon(F.col(c), dtypes[c]).alias(c) for c in value_cols])
    cells = canon.unpivot(["key", "sc"], value_cols, "column", "value")
    return cells.select(
        "key",
        "sc",
        F.encode("column", "UTF-8").alias("column"),
        F.encode("value", "UTF-8").alias("value"),
        F.lit(ts).cast("long").alias("ts"),
        F.lit(False).alias("tombstone"),
        F.lit(None).cast("int").alias("ldt"),
    )


def cf_from_table(
    df: DataFrame,
    key_col: str,
    cfdef=None,
    value_cols: list[str] | None = None,
    ts: int = 0,
    sc_col: str | None = None,
    partitioner=None,
):
    """In-memory CF over a relational table (no storage round-trip) — the
    fast path for running the operator surface directly on parquet inputs."""
    from apache_cassandra_spark.catalog import CFDef
    from apache_cassandra_spark.functions.tokens import RandomPartitioner
    from apache_cassandra_spark.model import CF

    if cfdef is None:
        ctype = "Super" if sc_col is not None else "Standard"
        cfdef = CFDef(name="ingested", column_type=ctype, compare_with="UTF8Type", compare_subcolumns_with="UTF8Type")
    return CF(
        cfdef=cfdef,
        cells=cells_from_table(df, key_col, value_cols, ts, sc_col),
        container_tombstones=None,
        partitioner=partitioner or RandomPartitioner(),
    )
