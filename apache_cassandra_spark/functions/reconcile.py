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
Container tombstones are tiny relative to data (they're per-row deletes)
-> aggregated to one watermark per container and **broadcast**-joined.
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


def reconcile(cells: DataFrame) -> DataFrame:
    """Collapse multi-version cells to one winner per (key, sc, column)."""
    winner = F.max_by(F.struct(*[F.col(c) for c in CELL_COLS]), priority()).alias("cell")
    return cells.groupBy("key", "sc", "column").agg(winner).select("cell.*")


def shadow_containers(
    cells: DataFrame, container_tombstones: DataFrame | None, with_sc_level: bool = True
) -> DataFrame:
    """Drop cells shadowed by row- or supercolumn-level tombstones.

    A cell is dead iff a container tombstone covering it has
    ``tomb.ts >= cell.ts`` (reference ``QueryFilter.isRelevant``: relevant
    when the column's timestamp is *greater than* markedForDeleteAt).
    Only the max watermark per container matters.
    """
    if container_tombstones is None:
        return cells

    row_w = (
        container_tombstones.where(F.col("sc").isNull())
        .groupBy("key")
        .agg(F.max("ts").alias("row_del_ts"))
    )
    out = (
        cells.join(F.broadcast(row_w), "key", "left")
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
            out.join(F.broadcast(sc_w), ["key", "sc"], "left")
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
