"""Last-write-wins cell reconciliation — THE core merge semantic.

Reference behavior being reproduced (exactly):

* ``db/Column.java:196-210`` (``comparePriority``): higher timestamp wins;
  on a timestamp tie a tombstone beats a live column; two live columns with
  equal timestamps -> larger value (unsigned byte order) wins.
* ``db/filter/QueryFilter.java:86-113`` (``collectCollatedColumns``): the
  k-way merge of memtable + SSTables that applies that reduction per column.
* ``db/ColumnFamilyStore.java:1036-1045`` + ``QueryFilter.java:120-128``
  (``isRelevant``): container (row / supercolumn) tombstones shadow any cell
  whose timestamp is <= the container's deletion timestamp.
* ``db/ColumnFamilyStore.java:663-726`` (``removeDeleted``): the live view
  drops cell tombstones after shadowing.

Spark-first shape: the k-way merge + reduce is one ``groupBy(key, sc,
column).agg(max_by(cell, priority))`` — Catalyst executes it hash-based
with map-side partial aggregation, so at 100 TB the merge is a single
shuffle on the cell coordinate, and any predicate on (key, sc, column)
commutes with the merge and is pushed below it by the operators layer.
Container tombstones are aggregated to one watermark per container and
left-joined on the SAME key(s) as the reconcile groupBy — so the join is
co-partitioned with the merge shuffle and AQE broadcasts the watermark side
only when its runtime size is actually small. No forced ``F.broadcast``:
under a delete-heavy 100 TB workload the watermark table is unbounded (one
row per tombstoned container) and a forced hint would override AQE's size
check and OOM the driver (same failure class as the round-5 dedup ``sizes``
broadcast; the reference never materializes the watermark set on one node
either — ``db/ColumnFamilyStore.java:1036-1045``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: canonical cell columns (FIXTURES.md cell layout)
CELL_COLS = ["key", "sc", "column", "value", "ts", "tombstone", "ldt"]


def priority() -> Column:
    """Orderable priority struct == ``Column.comparePriority`` semantics.

    Struct comparison is field-by-field: (ts, tombstone, value). Spark
    compares BinaryType unsigned-lexicographically, matching the
    reference's value tiebreak (``FBUtilities.compareByteArrays``).
    """
    return F.struct(
        F.col("ts").alias("p_ts"),
        F.col("tombstone").cast("int").alias("p_del"),
        F.col("value").alias("p_val"),
    )


_TS_BIAS = -(2**63)  # XOR flips the sign bit: signed long order -> unsigned byte order


def priority_binary() -> Column:
    """``comparePriority`` as ONE order-preserving binary: the unsigned
    lexicographic order of the encoding equals the (ts, tombstone, value)
    priority order, so the LWW winner is a plain ``max`` over one column.
    (Still a SortAggregate — see the plan note on ``reconcile`` — Spark
    cannot hash-aggregate variable-length buffers.)

    Layout: ``[8B big-endian ts XOR sign-bit] [1B tombstone] [payload]``
    where payload = value bytes for live cells (the value tiebreak compares
    exactly here; shorter-is-prefix ranks lower in both Spark and
    ``FBUtilities.compareByteArrays``) or the 4-byte ldt for tombstones
    (ties between two equal-ts tombstones keep the latest deletion time —
    the reference picks arbitrarily; a tombstone's ldt is always stamped by
    the write path, nulls encode as 0). All expressions are JVM codegen —
    hex/unhex/concat — no Python anywhere.
    """
    ts_bytes = F.unhex(F.lpad(F.hex(F.col("ts").bitwiseXOR(F.lit(_TS_BIAS))), 16, "0"))
    flag = F.when(F.col("tombstone"), F.lit(b"\x01")).otherwise(F.lit(b"\x00"))
    payload = (
        F.when(F.col("tombstone"), F.unhex(F.lpad(F.hex(F.coalesce(F.col("ldt"), F.lit(0))), 8, "0")))
        .otherwise(F.coalesce(F.col("value"), F.lit(b"")))
    )
    return F.concat(ts_bytes, flag, payload)


def reconcile(cells: DataFrame) -> DataFrame:
    """Collapse multi-version cells to one winner per (key, sc, column).

    ``max_by`` over the priority struct; partial (map-side) aggregation
    combines versions before the single shuffle on the cell coordinate.

    Plan note (measured, round 3): this is a SortAggregate, and that is
    *unavoidable* — Spark's HashAggregateExec requires every aggregation
    buffer attribute to be UnsafeRow-mutable (fixed-size), which excludes
    both the ``max_by`` struct buffer AND a ``max`` over any variable-length
    binary/string; ObjectHashAggregate only serves imperative aggregates.
    The order-preserving single-binary formulation (``reconcile_binary``)
    was built and benched to test this: identical SortAggregate plan,
    0.59s vs 0.57s on the sf0.1 lww_events merge — no win, so the
    struct form (clearer, no decode step) ships.
    """
    winner = F.max_by(F.struct(*[F.col(c) for c in CELL_COLS]), priority()).alias("cell")
    return cells.groupBy("key", "sc", "column").agg(winner).select("cell.*")


def reconcile_binary(cells: DataFrame) -> DataFrame:
    """One-``max`` formulation over ``priority_binary()`` — semantically
    identical to ``reconcile`` (fuzz-locked in
    tests/test_property_reconcile.py); kept as the documented experiment
    and as the shape a future fixed-width-buffer engine could hash-aggregate.
    """
    win = cells.groupBy("key", "sc", "column").agg(F.max(priority_binary()).alias("_w"))
    tomb = F.expr("substring(_w, 9, 1)") == F.lit(b"\x01")
    tail = F.expr("substring(_w, 10, 2147483647)")
    # XOR with the sign bit == add-bias in unsigned space: pattern = ts + 2^63
    ts = (
        F.conv(F.hex(F.expr("substring(_w, 1, 8)")), 16, 10).cast("decimal(20,0)")
        - F.expr("cast('9223372036854775808' as decimal(20,0))")  # 2^63, > max long literal
    ).cast("bigint")
    return win.select(
        "key",
        "sc",
        "column",
        F.when(tomb, F.lit(None).cast("binary")).otherwise(tail).alias("value"),
        ts.alias("ts"),
        tomb.alias("tombstone"),
        F.when(tomb, F.conv(F.hex(tail), 16, 10).cast("int")).alias("ldt"),
    )




def shadow_containers(
    cells: DataFrame, container_tombstones: DataFrame | None, with_sc_level: bool = True
) -> DataFrame:
    """Drop cells shadowed by row- or supercolumn-level tombstones.

    A cell is dead iff a container tombstone covering it has
    ``tomb.ts >= cell.ts`` (reference ``QueryFilter.isRelevant``: relevant
    when the column's timestamp is *greater than* markedForDeleteAt).
    Only the max watermark per container matters.

    Scale note (round 7): the watermark joins carry NO broadcast hint.
    The watermark table has one row per tombstoned container — unbounded
    under delete-heavy workloads — so the decision is left to AQE, which
    broadcasts when the built side is genuinely under the threshold and
    falls back to a shuffle join (co-partitioned on ``key``, the same key
    as the reconcile aggregate, hence nearly free) when it is not.
    Plan-locked in tests/test_plans.py: small-sf plans still show
    BroadcastHashJoin via AQE.
    """
    if container_tombstones is None:
        return cells

    row_w = (
        container_tombstones.where(F.col("sc").isNull())
        .groupBy("key")
        .agg(F.max("ts").alias("row_del_ts"))
    )
    out = (
        cells.join(row_w, "key", "left")
        .where(F.col("row_del_ts").isNull() | (F.col("ts") > F.col("row_del_ts")))
        .drop("row_del_ts")
    )
    if with_sc_level:
        # supercolumn-scoped watermarks only exist for Super CFs; Standard
        # CF callers pass with_sc_level=False to skip the join entirely
        sc_w = (
            container_tombstones.where(F.col("sc").isNotNull())
            .groupBy("key", "sc")
            .agg(F.max("ts").alias("sc_del_ts"))
        )
        out = (
            out.join(sc_w, ["key", "sc"], "left")
            .where(F.col("sc_del_ts").isNull() | (F.col("ts") > F.col("sc_del_ts")))
            .drop("sc_del_ts")
        )
    return out


def live_view(
    cells: DataFrame,
    container_tombstones: DataFrame | None = None,
    with_sc_level: bool = True,
    pre_reconciled: bool = False,
) -> DataFrame:
    """The reconciled *live* view: reconcile -> container shadowing -> drop
    cell tombstones. Every read operator is an expression over this.

    ``pre_reconciled=True`` skips the LWW aggregate entirely: compaction
    output (``gc_view``) holds exactly one version per (key, sc, column) —
    the winner of ``max_by`` — so re-reconciling is the identity. A CF
    backed *only* by its compacted bucketed table reads with no aggregate
    and no shuffle (the bucketed scan's HashPartitioning(key) satisfies the
    slice windows' distribution too)."""
    base = cells if pre_reconciled else reconcile(cells)
    return shadow_containers(base, container_tombstones, with_sc_level).where(
        ~F.col("tombstone")
    )


def gc_view(
    cells: DataFrame,
    container_tombstones: DataFrame | None,
    gc_before: int,
) -> DataFrame:
    """Compaction output view (reference ``removeDeleted`` +
    ``CompactionManager.java:676``): reconciled cells with tombstones older
    than ``gc_before`` (seconds epoch, = now - gcGraceSeconds) purged but
    *younger* tombstones retained (they still shadow future late writes).
    """
    rec = shadow_containers(reconcile(cells), container_tombstones)
    return rec.where(~F.col("tombstone") | (F.col("ldt") >= F.lit(gc_before)))
