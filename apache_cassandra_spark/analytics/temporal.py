"""Temporal join operators Spark's DataFrame API lacks as primitives,
built as exact compositions of native ops (no UDFs, no state).

* ``asof_join`` — each left row matched to the newest right row at or
  before it (per key): the time-series enrichment join (trades→quotes,
  purchases→latest-preceding-click). Implemented with the interleave
  trick: union both sides tagged, a per-key ordered window pass takes
  ``last(right_time, ignorenulls=True)`` over the preceding rows, then
  the right payload comes back via an equi-join on the matched
  timestamp. There is no inequality join anywhere, so no
  range-explosion and no BroadcastNestedLoop fallback.
* ``range_join`` — rows matched to intervals containing them, as an
  equality join on bucketized time (interval spans explode to the
  buckets they cover), turning a theta-join into an equi-join the
  planner hash-partitions. Exact: the true bounds ride in the join
  condition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row: the newest right row with
    ``right_time <= left_time`` for the same key (ties on equal time
    match — the "at or before" convention). Right rows sharing
    (key, right_time) reduce to one deterministic winner: the
    lexicographically-largest payload tuple (pre-aggregate for a
    different rule).
    ``tolerance``: matches older than ``left_time - tolerance`` are
    discarded (null columns), like pandas ``merge_asof``.

    Scale — the honest plan shape is three exchanges, all hash/equi:
    the interleaved union shuffles on ``key_col`` for the window, the
    right side is scanned again and shuffled on (key, time) for the
    deterministic payload reduction, and the payload equi-join on
    (key, matched_time) adds one more. Every sort is per-key; nothing
    is quadratic and nothing falls back to a nested-loop join."""
    lt, rt = F.col(left_time), F.col(right_time)
    l_tag = left.select(
        F.col(key_col).alias("_k"), lt.alias("_t"), F.lit(1).alias("_is_left"), F.struct(*left.columns).alias("_lrow")
    )
    r_tag = right.select(
        F.col(key_col).alias("_k"), rt.alias("_t"), F.lit(0).alias("_is_left"), F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow")
    )
    # right rows order BEFORE left rows at the same _t (asc _is_left), so
    # last(...) at a left row includes an equal-time right match
    w = Window.partitionBy("_k").orderBy("_t", "_is_left").rowsBetween(Window.unboundedPreceding, 0)
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_rt", F.when(F.col("_is_left") == 0, F.col("_t")))
        .withColumn("_match_t", F.last("_rt", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "_match_t",
            F.when(F.col("_match_t") >= F.col("_t") - F.lit(tolerance), F.col("_match_t")),
        )
    payload_cols = [c for c in right.columns if c not in (key_col, right_time)]
    # deterministic reduction of right rows sharing (key, time): the
    # lexicographically-largest payload tuple wins (dropDuplicates would
    # pick an arbitrary row and break replayability)
    r_payload = (
        right.groupBy(F.col(key_col).alias("_k"), F.col(right_time).alias("_match_t"))
        .agg(F.max(F.struct(*payload_cols)).alias("_p"))
        .select("_k", "_match_t", *[F.col(f"_p.{c}").alias(f"{c}{suffix}") for c in payload_cols])
    )
    out = matched.join(r_payload, ["_k", "_match_t"], "left")
    return out.select(
        "_lrow.*",
        F.col("_match_t").alias(f"{right_time}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in right.columns if c not in (key_col, right_time)],
    )


def range_join(
    rows: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Rows joined to the intervals containing them
    (``start <= t < end``) via bucketized equality: each interval
    explodes to every ``bucket``-sized time slot it overlaps, rows hash
    to their slot, and the true bounds ride IN the join condition (so
    outer semantics survive — a post-join filter would silently turn a
    left join back into an inner one). Choose ``bucket`` near the median
    interval length — each interval then lands in O(1) slots and the
    join is a plain shuffled hash join on the slot (no
    BroadcastNestedLoopJoin theta-join fallback).

    ``how``: inner / left / left_semi / left_anti — shapes where each
    probe row meets an interval in exactly its own slot, so no
    duplicates arise. right/full would emit one row per exploded slot
    for unmatched intervals and are rejected.

    Time and bound columns must be integral (the slot arithmetic
    truncates; fractional times would silently miss their final partial
    bucket). Degenerate intervals (``end <= start``) contain nothing and
    are dropped before exploding — an inverted pair would otherwise
    fan out to every slot between the bounds in reverse."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"range_join supports inner/left/left_semi/left_anti, not {how!r}")
    if "_slot" in rows.columns or "_slot" in intervals.columns:
        raise ValueError("range_join reserves the column name '_slot'")
    types = dict(rows.dtypes) | dict(intervals.dtypes)
    for c in (time_col, start_col, end_col):
        if types[c] not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(f"range_join needs integral time columns; {c} is {types[c]}")
    slot_seq = F.sequence(
        (F.col(start_col) / bucket).cast("long"),
        ((F.col(end_col) - 1) / bucket).cast("long"),
    )
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_slot", F.explode(slot_seq)
    )
    rw = rows.withColumn("_slot", (F.col(time_col) / bucket).cast("long"))
    cond = (
        (rw["_slot"] == iv["_slot"])
        & (rw[time_col] >= iv[start_col])
        & (rw[time_col] < iv[end_col])
    )
    joined = rw.join(iv, cond, how)
    if how in ("left_semi", "left_anti"):
        return joined.drop("_slot")
    return joined.drop(iv["_slot"]).drop(rw["_slot"])


def gap_fill(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    count_col: str = "n_events",
) -> DataFrame:
    """Dense per-key time grid with zero-filled gaps — the resampling
    step every time-series feature pipeline runs before windowed models
    (a missing hour is a 0, not an absent row). Input rows carry an
    INTEGER period index (``idx_col``: hour/day bucket — integer so the
    grid arithmetic is bit-identical in any engine); output is one row
    per key per index in that key's observed ``[min, max]`` span:
    ``(key, idx, count)``.

    Scale shape: one hash aggregate for the per-(key, idx) counts, one
    for the per-key span, then the span explodes via ``sequence()`` —
    per-key output is bounded by that key's own span, never the global
    calendar — and the counts come back with a co-partitioned left join
    on (key, idx). No window over an unbounded partition, no driver
    calendar literal, no Python. A key whose span is pathologically long
    (sensor dead a year) costs exactly its own span rows — the dense
    grid IS the requested semantic; cap spans upstream if that's not.

    Reference analog: none — the reference could only materialize gaps
    client-side by iterating ``get_slice`` pages per key
    (service/StorageProxy.java:795-868).
    """
    per_cell = df.groupBy(key_col, idx_col).agg(F.count(F.lit(1)).cast("long").alias(count_col))
    # span from the already-reduced cell frame, NOT the raw input: min/max
    # over distinct (key, idx) equals min/max over events, reads the much
    # smaller aggregate, and reuses its exchange instead of scanning the
    # input twice
    span = per_cell.groupBy(key_col).agg(
        F.min(idx_col).alias("_lo"), F.max(idx_col).alias("_hi")
    )
    grid = span.select(
        key_col, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(idx_col)
    )
    return (
        grid.join(per_cell, [key_col, idx_col], "left")
        .select(
            key_col,
            idx_col,
            F.coalesce(count_col, F.lit(0).cast("long")).alias(count_col),
        )
    )


def resample_ohlc(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket_size: int,
    tie_col: str,
) -> DataFrame:
    """Per-key time-bucket OHLC resample — the canonical downsampling
    step for metric/price/sensor streams: for every ``(keys, bucket)``
    cell, the first value (open), max (high), min (low), last value
    (close), and row count. ``bucket = ts div bucket_size`` (integer
    division of the integer timestamp — bit-identical in any engine;
    for non-negative timestamps Spark ``div`` and DuckDB ``//``
    agree by truncation == floor).

    First/last are defined by the total order ``(ts, tie)`` —
    ``tie_col`` must make that pair unique per cell (an event id /
    sequence number), so open/close are a DETERMINISTIC single row's
    value, not a scan-order accident. min/max/count and the two
    arg-picks are all order-insensitive aggregates: no float is ever
    summed, so the output is engine-exact with no quantization needed.

    The ordering key is packed into ONE decimal(38,0):
    ``ts·10¹⁹ + tie``. A ``struct(ts, tie)`` key would be semantically
    identical but forces SortAggregate (struct-typed aggregation
    buffers aren't mutable in UnsafeRow — measured on this exact
    query), while a fixed-width decimal buffer keeps the whole thing a
    HashAggregate. The pack equals the lexicographic (ts, tie) order
    for ANY-sign ts provided ``0 <= tie < 10¹⁹``; int64 can't exceed
    the upper bound, and a negative tie raises loudly rather than
    silently reordering cells (the ``zscore_outliers`` envelope
    discipline).

    Scale shape: ONE map-side-combinable hash aggregate — ``min_by`` /
    ``max_by`` carry a (value, key) pair through partial aggregation,
    so the exchange moves one row per (keys, bucket) cell per upstream
    task, never the raw stream. No window, no sort, no Python, no
    second scan. Hot cells (a celebrity key's busy day) partial-combine
    before the shuffle like any count would.

    Reference analog: none — the reference exposes slice reads only;
    rollups were delegated to Hadoop jobs (SURVEY.md §2.6).
    """
    from decimal import Decimal

    pack = F.col(ts_col).cast("decimal(19,0)").cast("decimal(38,0)") * F.lit(
        Decimal(10**19)
    ) + F.col(tie_col).cast("decimal(38,0)")
    okey = F.when(F.col(tie_col) >= 0, pack).otherwise(
        F.raise_error(
            # NULL ties fall into this branch too (NULL >= 0 is not
            # true) — name the actual defect, the remedies differ
            F.when(
                F.col(tie_col).isNull(),
                F.format_string(
                    "resample_ohlc: NULL %s breaks the packed (ts, tie) "
                    "ordering; drop or fill NULL tie rows first",
                    F.lit(tie_col),
                ),
            ).otherwise(
                F.format_string(
                    "resample_ohlc: negative %s (%s) breaks the packed "
                    "(ts, tie) ordering; offset the tie column to >= 0",
                    F.lit(tie_col),
                    F.col(tie_col).cast("string"),
                )
            )
        )
    )
    v = F.col(value_col)
    return (
        df.groupBy(
            *key_cols,
            F.expr(f"`{ts_col}` div {bucket_size}").cast("long").alias("bucket"),
        )
        .agg(
            F.min_by(v, okey).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, okey).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
