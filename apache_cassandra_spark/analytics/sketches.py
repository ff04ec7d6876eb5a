"""Cardinality estimation: exact distinct counts and their HyperLogLog++
scale twins.

The reference has no server-side distinct-count at all — counting unique
row keys meant a full `get_range_slices` client walk
(service/StorageProxy.java:795-868) or the Hadoop/Pig bulk path
(contrib/pig/.../CassandraStorage.java). Here both shapes are
first-class aggregates:

* ``distinct_counts`` (exact) — Spark plans COUNT(DISTINCT x) as a
  two-phase Expand + partial/final hash aggregate: the dedup happens
  map-side per group before the shuffle, so the exchange carries one row
  per (group, distinct value), not per input row.
* ``distinct_counts(approx=True)`` — HyperLogLog++ (`approx_count_distinct`),
  the 100 TB path: constant ~1.5 KB of sketch per (group, column)
  regardless of cardinality, merged associatively map-side. At ~10⁹
  distinct user ids the exact Expand shuffle moves the full distinct
  set; the HLL shuffle moves kilobytes per group. ``rsd`` trades sketch
  width for error (default 5%, like Spark's).

Gate strategy: the exact form is the oracle-anchored driver entry
(`events_distinct_exact` hash-matches DuckDB at any sf); the HLL form is
rows-only by design — its value is engine-specific (Spark's dense/sparse
HLL++ registers vs DuckDB's) even though it is deterministic for a given
input, so the unit tests pin it within rsd of the exact twin instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_counts(
    df: DataFrame,
    group_cols: list[str],
    distinct_cols: list[str],
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct cardinality of each ``distinct_cols`` column,
    plus the group's total row count.

    Output columns: ``group_cols…, n_<col> (one per distinct col),
    n_rows``. ``approx=True`` swaps every COUNT(DISTINCT) for
    HyperLogLog++ with relative standard deviation ``rsd``.
    """
    if not distinct_cols:
        raise ValueError("distinct_cols must be non-empty")
    agg = [
        (
            F.approx_count_distinct(c, rsd) if approx else F.countDistinct(c)
        ).alias(f"n_{c}")
        for c in distinct_cols
    ]
    agg.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*group_cols).agg(*agg)


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact per-group top-``k`` most frequent items → one row per
    ``(group…, item)`` with ``cnt`` and ``rk`` (1-based; ties broken by
    item value ascending, so the ranking is total and engine-exact).
    NULL items are DROPPED before counting — matching
    :func:`cm_sketch`'s policy, and sidestepping the one hole in the
    engine-exactness claim: Spark orders ascending NULLS FIRST while
    most SQL engines (DuckDB included) default NULLS LAST, so a NULL
    "item" would rank differently per engine.

    Scale shape: the frequency table is ONE map-side-combinable hash
    aggregate on (group, item) — the exchange carries distinct
    (group, item) rows, not events — and the per-group top-k is a
    rank window that Spark executes as WindowGroupLimit: each map task
    pre-truncates its partition to k rows per group BEFORE the window
    shuffle, so a group with 10⁹ distinct items ships ~k rows per task,
    not the whole tail. No global sort, no collect.

    This is the exact twin of a count-min/Misra-Gries sketch pipeline;
    at 100 TB the exact form is usually still fine BECAUSE the exchange
    is bounded by distinct-item cardinality — reach for sketches only
    when (group × item) itself explodes past storage.
    """
    from pyspark.sql import Window

    freq = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(*group_cols, item_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("cnt").desc(), F.col(item_col))
    return (
        freq.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(*group_cols, item_col, "cnt", F.col("rk").cast("int").alias("rk"))
    )


def cm_sketch(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
    per group → one row per ``(group…, d, w, width, c)`` counter: ``c``
    = how many input rows hashed to bucket ``w`` under hash row ``d``.
    ``width`` is a constant metadata column recording the modulus the
    buckets were computed with — :func:`cm_estimate` validates against
    it, because a width mismatch is NOT otherwise detectable from the
    counters (a too-narrow sketch's ``max(w)`` always fits under a wider
    probe, which would silently probe wrong buckets and break the
    never-underestimate guarantee). Sketches merge by addition grouped
    on ``(group…, d, w, width)``.

    The 100 TB shape when even the distinct (group, item) table explodes
    (``heavy_hitters``'s docstring boundary): the sketch is a FIXED
    ``depth × width`` counter grid per group — one map-side-combinable
    hash aggregate whose exchange carries at most ``depth·width`` rows
    per group no matter how many distinct items exist. Counters merge by
    addition, so sketches from different days/shards combine with a
    plain sum — the mergeability HLL has, but for frequencies.

    Unlike HLL's engine-internal registers, every counter here is a
    deterministic md5 function of the data (the ``_hash64`` discipline
    dedup's minhash already oracle-replicates), so CM estimates are
    EXACTLY reproducible in any engine — the gate hash-matches DuckDB,
    no rows-only concession needed.

    NULL items are DROPPED here (and in :func:`cm_estimate`), not
    hashed: ``concat_ws`` would silently hash a NULL to the bare salt
    while every SQL oracle NULL-propagates and drops the row — the
    policy lives in the operator so no call site can diverge.
    """
    from apache_cassandra_spark.analytics.dedup import _hash64

    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    group_cols = group_cols or []
    df = df.where(F.col(item_col).isNotNull())
    buckets = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(_hash64(F.col(item_col), f"cm:{d}"), F.lit(width)).alias("w"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(*group_cols, F.explode(buckets).alias("dw"))
        .groupBy(*group_cols, F.col("dw.d").alias("d"), F.col("dw.w").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("width", F.lit(width).cast("long"))
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: for every row of ``items`` return
    ``(group…, item, est)`` where ``est = min over d of counter[h_d]``
    — an overestimate of the true frequency by at most the collision
    mass, never an underestimate. ``depth``/``width`` must match the
    sketch's. Items absent from the sketched data read whatever their
    buckets hold (possibly 0 via the left join's coalesce).

    Plan: items fan out ×depth (a literal array explode), then ONE
    equi-join against the counter grid on (group, d, w) and a min
    aggregate — no window, no collect; the sketch side is
    depth·width·|groups| rows, which AQE broadcasts when small.

    ``depth``/``width`` are cross-checked against the sketch (one cheap
    aggregate over the bounded counter table): depth against the actual
    hash-row ids, width against the sketch's recorded ``width`` metadata
    column — the recorded value is the only reliable signal, since a
    sketch built NARROWER than the probe's width still has every
    ``w < width`` (max-bucket sampling can only catch the too-wide
    direction). A mismatch in either would probe wrong buckets and
    silently break the never-underestimate guarantee (wrong/missing
    buckets miss the left join, coalesce to 0, and the min reports 0
    for present items), so both raise. An EMPTY sketch skips validation
    by construction — every estimate is then 0, correct for no data.
    """
    from apache_cassandra_spark.analytics.dedup import _hash64

    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    group_cols = group_cols or []
    # sketches persisted before the width-metadata column existed (or
    # re-read through a schema that dropped it) stay probe-able: fall
    # back to the best-effort max(w) < width check, which catches only
    # a sketch WIDER than the probe — the too-narrow direction is
    # undetectable without the metadata (the reason the column exists)
    # Eager checkpoint (r14): the validation aggregate below is a
    # DRIVER ACTION at construction time, and the probe join re-reads
    # the sketch under the caller's action — two separate jobs that AQE
    # stage reuse cannot span, so an unmaterialized sketch pipeline (a
    # full scan+aggregate of the sketched input) executed TWICE per
    # estimate. The counter grid is bounded at depth·width·|groups| rows
    # by construction, so materializing it once is always cheap.
    sketch = sketch.localCheckpoint(eager=True)
    has_width = "width" in sketch.columns
    aggs = [F.max("d").alias("md"), F.max("w").alias("mw")]
    if has_width:
        aggs += [F.min("width").alias("w_lo"), F.max("width").alias("w_hi")]
    bounds = sketch.agg(*aggs).first()
    if bounds["md"] is not None:
        if bounds["md"] != depth - 1:
            raise ValueError(
                f"depth mismatch: sketch has hash rows 0..{bounds['md']}, "
                f"estimate asked for depth={depth}"
            )
        if has_width and bounds["w_lo"] != bounds["w_hi"]:
            raise ValueError(
                f"mixed-width sketch: widths {bounds['w_lo']}..{bounds['w_hi']} "
                "— sketches merged across different widths are meaningless"
            )
        if has_width and bounds["w_hi"] != width:
            raise ValueError(
                f"width mismatch: sketch was built with width={bounds['w_hi']}, "
                f"estimate asked for width={width}"
            )
        if bounds["mw"] >= width:
            raise ValueError(
                f"corrupt sketch: bucket {bounds['mw']} >= "
                + (f"recorded width={width}" if has_width else f"probe width={width}")
            )
    if has_width:
        sketch = sketch.drop("width")
    buckets = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(_hash64(F.col(item_col), f"cm:{d}"), F.lit(width)).alias("w"),
            )
            for d in range(depth)
        ]
    )
    fanned = (
        items.where(F.col(item_col).isNotNull())
        .select(*group_cols, item_col, F.explode(buckets).alias("dw"))
        .select(
            *group_cols, item_col, F.col("dw.d").alias("d"), F.col("dw.w").alias("w")
        )
    )
    return (
        fanned.join(sketch, [*group_cols, "d", "w"], "left")
        .groupBy(*group_cols, item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )
