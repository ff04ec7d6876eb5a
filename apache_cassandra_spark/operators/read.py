"""Client-facing read operators (SURVEY.md §2.1) as DataFrame expressions.

Every operator follows the same scale-aware shape:

1. **Push predicates below the reconcile.** Filters on (key, sc, column)
   select whole reconcile groups, so they commute with the LWW merge — we
   filter the raw multi-version cells first, which Catalyst pushes into the
   Parquet scan (partition pruning + row-group stats + bloom). At 100 TB a
   point read touches one partition, not the table.
2. Reconcile only the surviving cells (``functions/reconcile.py``).
3. Apply order/limit semantics that do NOT commute with the merge (live
   count limits, reversed slices) *after* reconciling, exactly like the
   reference applies ``SliceQueryFilter.collectReducedColumns``
   (``db/filter/SliceQueryFilter.java:104-141``) after the collated merge.

Result frames use the live-cell schema ``(key, sc, column, value, ts)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apache_cassandra_spark.functions.comparators import AbstractComparator, and_all
from apache_cassandra_spark.functions.reconcile import live_view
from apache_cassandra_spark.model import CF, ColumnPath, KeyRange, SlicePredicate, SliceRange

RESULT_COLS = ["key", "sc", "column", "value", "ts"]


# ---------------------------------------------------------------------------
# shared slice machinery
# ---------------------------------------------------------------------------


def _level(cf: CF, super_column: bytes | None) -> tuple[str, AbstractComparator]:
    """Which name column the predicate addresses, and its comparator.

    Standard CF -> ("column", comparator). Super CF with a super_column
    coordinate -> subcolumns of that sc ("column", subcomparator). Super CF
    addressed at the parent -> supercolumn names ("sc", comparator), the
    semantics of ``SliceQueryFilter.filterSuperColumn``
    (``db/filter/SliceQueryFilter.java:66-96``).
    """
    if cf.is_super and super_column is None:
        return "sc", cf.cfdef.comparator
    if cf.is_super:
        return "column", cf.cfdef.subcomparator
    return "column", cf.cfdef.comparator


def _slice_cell_preds(
    target: Column,
    comparator: AbstractComparator,
    predicate: SlicePredicate,
) -> list[Column]:
    """Cell-level predicates implied by the slice — safe to apply *below*
    the reconcile (they select whole (key, sc, column) groups)."""
    preds: list[Column] = []
    if predicate.column_names is not None:
        preds.append(target.isin([bytearray(n) for n in predicate.column_names]))
    else:
        sr = predicate.slice_range
        lo, hi = (sr.finish, sr.start) if sr.reversed else (sr.start, sr.finish)
        if lo != b"":
            preds.append(comparator.ge(target, F.lit(lo)))
        if hi != b"":
            preds.append(comparator.le(target, F.lit(hi)))
    return preds


def _apply_count(
    live: DataFrame,
    cf: CF,
    super_column: bytes | None,
    sr: SliceRange,
    per_key: bool,
) -> DataFrame:
    """Keep the first ``count`` *live* entries per row in comparator order
    (reversed -> descending), mirroring ``collectReducedColumns``.

    At the supercolumn level the unit counted is the supercolumn (all its
    subcolumns flow through) — hence dense_rank on the sc sort key.
    """
    target, comparator = _level(cf, super_column)
    order = comparator.order_exprs(F.col(target), reverse=sr.reversed)
    if cf.is_super and super_column is None:
        # rank whole supercolumns: order by sc only, so every subcolumn of
        # the same sc shares one dense rank
        w = Window.partitionBy("key").orderBy(*order)
        ranked = live.withColumn("_rk", F.dense_rank().over(w))
    else:
        part = ["key", "sc"] if (cf.is_super and per_key) else ["key"]
        w = Window.partitionBy(*part).orderBy(*order)
        ranked = live.withColumn("_rk", F.row_number().over(w))
    return ranked.where(F.col("_rk") <= sr.count).drop("_rk")


def _filtered_live(cf: CF, key_pred: Column | None, extra_preds: list[Column]) -> DataFrame:
    cells = cf.cells
    tombs = cf.container_tombstones
    if key_pred is not None:
        cells = cells.where(key_pred)
        if tombs is not None:
            tombs = tombs.where(key_pred)
    if extra_preds:
        cells = cells.where(and_all(extra_preds))
    return live_view(cells, tombs, with_sc_level=cf.is_super)


def _sliced(
    cf: CF,
    key_pred: Column | None,
    predicate: SlicePredicate,
    super_column: bytes | None,
    per_key_count: bool = True,
) -> DataFrame:
    target, comparator = _level(cf, super_column)
    preds = _slice_cell_preds(F.col(target), comparator, predicate)
    if cf.is_super and super_column is not None:
        preds.append(F.col("sc") == F.lit(bytearray(super_column)))
    live = _filtered_live(cf, key_pred, preds)
    if predicate.slice_range is not None:
        live = _apply_count(live, cf, super_column, predicate.slice_range, per_key_count)
    return live.select(*RESULT_COLS)


# ---------------------------------------------------------------------------
# Thrift surface
# ---------------------------------------------------------------------------


def get(cf: CF, key: str, path: ColumnPath) -> DataFrame:
    """R1 ``get`` — point lookup of one column / supercolumn
    (``thrift/CassandraServer.java:259-273``). Empty result == the
    reference's NotFoundException."""
    if path.column is not None:
        pred = SlicePredicate(column_names=(path.column,))
        return _sliced(cf, F.col("key") == key, pred, path.super_column)
    if path.super_column is not None:
        # whole supercolumn: all live subcolumns under it
        live = _filtered_live(
            cf, F.col("key") == key, [F.col("sc") == F.lit(bytearray(path.super_column))]
        )
        return live.select(*RESULT_COLS)
    raise ValueError("get() needs a column or super_column coordinate")


def get_slice(
    cf: CF, key: str, predicate: SlicePredicate, super_column: bytes | None = None
) -> DataFrame:
    """R2 ``get_slice`` (``thrift/CassandraServer.java:209-218``)."""
    return _sliced(cf, F.col("key") == key, predicate, super_column)


def multiget_slice(
    cf: CF, keys: list[str], predicate: SlicePredicate, super_column: bytes | None = None
) -> DataFrame:
    """R4 ``multiget_slice`` — R2 fanned over N keys, count applied per key
    (``thrift/CassandraServer.java:220-257``)."""
    return _sliced(cf, F.col("key").isin(list(keys)), predicate, super_column)


def multiget(cf: CF, keys: list[str], path: ColumnPath) -> DataFrame:
    """R3 ``multiget`` (deprecated in the reference) — R1 fanned over N
    keys; the reference always returns an entry per key
    (``CassandraServer.java:276-319``), so absent keys appear with NULL
    column/value (left join against the key list)."""
    spark = cf.cells.sparkSession
    want = spark.createDataFrame([(k,) for k in keys], "key string")
    if path.column is not None:
        pred = SlicePredicate(column_names=(path.column,))
        hits = _sliced(cf, F.col("key").isin(list(keys)), pred, path.super_column)
    else:
        hits = _filtered_live(
            cf,
            F.col("key").isin(list(keys)),
            [F.col("sc") == F.lit(bytearray(path.super_column))] if path.super_column else [],
        ).select(*RESULT_COLS)
    return want.join(hits, "key", "left")


class ReadLimitExceeded(Exception):
    """Fork read-width circuit breaker tripped
    (``db/filter/SliceQueryFilter.java:116-118``)."""


def check_read_limit(df: DataFrame, hard_limit: int) -> DataFrame:
    """Enforce the fork's per-read column hard limit: raises when the slice
    would return more than ``hard_limit`` cells. The reference kills the
    read server-side; here the guard is an explicit bounded probe (reads
    limit+1 rows, never the full result)."""
    if len(df.take(hard_limit + 1)) > hard_limit:
        raise ReadLimitExceeded(f"read would exceed {hard_limit} columns")
    return df


def get_count(cf: CF, key: str, super_column: bytes | None = None) -> DataFrame:
    """R5 ``get_count`` — live entries of one row; literally
    ``get_slice(unbounded).size()`` in the reference
    (``thrift/CassandraServer.java:321-332``). Counts supercolumns when a
    Super CF is addressed at the parent."""
    live = _sliced(
        cf,
        F.col("key") == key,
        SlicePredicate(slice_range=SliceRange(count=2**31 - 1)),
        super_column,
    )
    unit = "sc" if (cf.is_super and super_column is None) else "column"
    return live.agg(F.count_distinct(F.col(unit)).alias("count"))


def get_range_slices(
    cf: CF,
    predicate: SlicePredicate,
    key_range: KeyRange,
    super_column: bytes | None = None,
) -> DataFrame:
    """R7 ``get_range_slices`` — paged scan in token order
    (``thrift/CassandraServer.java:552-607``, ``StorageProxy.java:805-864``).

    Key-addressed bounds are inclusive; token-addressed are start-exclusive
    (``cassandra.thrift:233-239``); wrap-around token ranges become the OR
    of two ranges (``dht/Range.java`` wrap logic). The ``count`` cap is on
    *rows*: the distinct-key top-N runs as TakeOrderedAndProject (parallel
    partial top-N, no single-reducer sort), then a broadcast semi-join
    selects those rows' cells.
    """
    token = cf.partitioner.token(F.col("key"))
    key_pred: Column | None = None
    preds: list[Column] = []
    if key_range.start_key is not None or key_range.end_key is not None:
        # key-addressed Bounds: inclusive both ends, compared in token space
        if key_range.start_key:
            preds.append(token >= cf.partitioner.token_of(key_range.start_key))
        if key_range.end_key:
            preds.append(token <= cf.partitioner.token_of(key_range.end_key))
    else:
        start_t = key_range.start_token or ""
        end_t = key_range.end_token or ""
        if start_t and end_t and start_t >= end_t:
            # wrap-around ring range (start, min] ∪ (min, end]
            preds.append((token > start_t) | (token <= end_t))
        else:
            if start_t:
                preds.append(token > start_t)
            if end_t:
                preds.append(token <= end_t)
    if preds:
        key_pred = and_all(preds)

    target, comparator = _level(cf, super_column)
    cell_preds = _slice_cell_preds(F.col(target), comparator, predicate)
    if cf.is_super and super_column is not None:
        cell_preds.append(F.col("sc") == F.lit(bytearray(super_column)))
    live = _filtered_live(cf, key_pred, cell_preds)

    # row cap: top `count` keys in token order (parallel top-N)
    keys = (
        live.select(F.col("key"), token.alias("_t"))
        .groupBy("key")
        .agg(F.min("_t").alias("_t"))
        .orderBy("_t", "key")
        .limit(key_range.count)
        .select("key")
    )
    live = live.join(F.broadcast(keys), "key", "inner")
    if predicate.slice_range is not None:
        live = _apply_count(live, cf, super_column, predicate.slice_range, per_key=True)
    return live.select(*RESULT_COLS)


def describe_splits(cf: CF, keys_per_split: int, key_pred: Column | None = None) -> list[str]:
    """R8 ``describe_splits`` — ~equal token sub-ranges for parallel scans
    (``CassandraServer.java:644-654``, index-summary sampling
    ``StorageService.java:1726``). In Spark the native analog is simply the
    source's partitioning; this surfaces explicit boundaries for paging
    clients. Planning-scale op: samples distinct keys, so cost is bounded
    by the key cardinality of the addressed range."""
    token = cf.partitioner.token(F.col("key"))
    cells = cf.cells if key_pred is None else cf.cells.where(key_pred)
    toks = cells.select(token.alias("t")).distinct()
    n = toks.count()
    if n == 0:
        return []
    splits = max(1, n // max(1, keys_per_split))
    w = Window.orderBy("t")
    bounds = (
        toks.withColumn("_tile", F.ntile(splits).over(w))
        .groupBy("_tile")
        .agg(F.max("t").alias("t"))
        .orderBy("_tile")
        .select("t")
        .collect()
    )
    return [r["t"] for r in bounds]
