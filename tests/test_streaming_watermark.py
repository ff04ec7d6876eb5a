"""Pins the micro-batch watermark contract the streaming_watermark_replay
oracle replays (calibrated empirically on this Spark version):

1. one-batch LAG — the late filter of batch b uses the watermark derived
   from batches 0..b-2, so a row late relative to the PREVIOUS batch's
   max still lands;
2. WINDOW-END basis — a row whose own event time is behind the watermark
   survives if its window's end is ahead of it;
3. inclusive boundaries — a window ending exactly AT the watermark is
   dropped (filter) / emitted (append drain).

If a Spark upgrade changes any of these, this file fails before the
driver gate can silently diverge."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

H = 3600


def _replay(spark, tmp_path, batches, delay, mode="update"):
    """Run `batches` (list of [(ts_sec, tag)]) as one file per trigger in
    order; return (kept tag set, per-batch numRowsDroppedByWatermark)."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        tmpd = str(tmp_path / f"t{i}")
        spark.createDataFrame(rows, "ts_sec double, tag string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmpd)
        dst = f"{src}/f{i}.parquet"
        shutil.move(glob.glob(f"{tmpd}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))
    stream = (
        spark.readStream.schema("ts_sec double, tag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withColumn("ts", F.timestamp_seconds(F.col("ts_sec")))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour"), "tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    view = "wm_pin_view"
    spark.catalog.dropTempView(view)
    q = (
        agg.writeStream.format("memory")
        .queryName(view)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "replay did not finish"
    dropped = [
        op.get("numRowsDroppedByWatermark")
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    ]
    kept = {r["tag"] for r in spark.sql(f"select tag from {view}").collect()}
    return kept, dropped


BATCH0 = [(float(h * H + 1800), "t") for h in range(6)]  # max event time 5h30


def test_one_batch_lag(spark, tmp_path):
    # row 'a' at 1h10 arrives in batch 1; the watermark from batch 0
    # (5h30 − 1h = 4h30) takes effect only in batch 2, so 'a' is KEPT
    # while the identical row 'x' in batch 2 is dropped
    kept, dropped = _replay(
        spark,
        tmp_path,
        [BATCH0, [(1 * H + 600.0, "a")], [(1 * H + 600.0, "x")]],
        "1 hour",
    )
    assert "a" in kept and "x" not in kept
    assert dropped == [0, 0, 1]


def test_window_end_basis(spark, tmp_path):
    # batch-2 row 'm' at 4h10: event time behind the 4h30 watermark but
    # window [4h,5h) ends ahead of it -> kept (event-time basis would drop)
    kept, _ = _replay(
        spark,
        tmp_path,
        [BATCH0, [(4 * H + 2400.0, "d")], [(4 * H + 600.0, "m")]],
        "1 hour",
    )
    assert "m" in kept


def test_filter_boundary_inclusive(spark, tmp_path):
    # delay 90m -> watermark in batch 2 is exactly 4h00; row 'p' in
    # window [3h,4h) (end == watermark) is dropped
    kept, dropped = _replay(
        spark,
        tmp_path,
        [BATCH0, [(4 * H + 2400.0, "d")], [(3 * H + 600.0, "p")]],
        "90 minutes",
    )
    assert "p" not in kept
    assert dropped[-1] == 1


def test_append_emission_boundary_inclusive(spark, tmp_path):
    # single batch, final watermark = 5h30 − 90m = exactly 4h00: windows
    # ending 1h..4h are emitted (4h00 == watermark included), 5h/6h held
    kept_ends = set()
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(BATCH0, "ts_sec double, tag string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "t0"))
    shutil.move(
        glob.glob(str(tmp_path / "t0/part-*.parquet"))[0], f"{src}/f0.parquet"
    )
    stream = (
        spark.readStream.schema("ts_sec double, tag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withColumn("ts", F.timestamp_seconds(F.col("ts_sec")))
        .withWatermark("ts", "90 minutes")
        .groupBy(F.window("ts", "1 hour"), "tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    view = "wm_pin_emit"
    spark.catalog.dropTempView(view)
    q = (
        agg.writeStream.format("memory")
        .queryName(view)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    for r in spark.sql(f"select window.end as we from {view}").collect():
        kept_ends.add(r["we"].hour + 24 * (r["we"].day - 1))
    assert kept_ends == {1, 2, 3, 4}
