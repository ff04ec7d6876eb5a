"""Temporal join operators Spark's DataFrame API lacks as primitives,
built as exact compositions of native ops (no UDFs, no state).

* ``asof_join`` — each left row matched to the newest right row at or
  before it (per key): the time-series enrichment join (trades→quotes,
  purchases→latest-preceding-click). Implemented with the interleave
  trick: union both sides tagged, ONE per-key ordered window pass takes
  ``last(right_time, ignorenulls=True)`` over the preceding rows, then
  the right payload comes back via an equi-join on the matched
  timestamp. Cost = one shuffle on the key (both sides) + one window —
  there is no inequality join anywhere, so no range-explosion and no
  BroadcastNestedLoop fallback.
* ``range_join`` — rows matched to intervals containing them, as an
  equality join on bucketized time (interval spans explode to the
  buckets they cover), turning a theta-join into an equi-join the
  planner hash-partitions. Exact: candidates are filtered by the true
  bounds after the bucket match.
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

    Scale: both sides shuffle once on ``key_col``; the window sort is
    per-key; the payload retrieval is an equi-join on
    (key, matched_time) — hash joins end to end."""
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
    to their slot, and the true-bounds filter runs after the equi-join.
    Choose ``bucket`` near the median interval length — each interval
    then lands in O(1) slots and the join is a plain shuffled hash join
    (no BroadcastNestedLoopJoin theta-join fallback)."""
    t = F.col(time_col)
    slot_seq = F.sequence(
        (F.col(start_col) / bucket).cast("long"),
        ((F.col(end_col) - 1) / bucket).cast("long"),
    )
    iv = intervals.withColumn("_slot", F.explode(slot_seq))
    rw = rows.withColumn("_slot", (t / bucket).cast("long"))
    joined = rw.join(iv, "_slot", how).where(
        (t >= F.col(start_col)) & (t < F.col(end_col))
    )
    return joined.drop("_slot")
