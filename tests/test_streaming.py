"""Streaming ingest path: mutation stream -> store, watermarked windows.
Mirrors the commitlog/memtable write semantics (SURVEY.md §2.5, §7.2.8)."""

import json

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.catalog import Catalog
from apache_cassandra_spark.model import ColumnPath
from apache_cassandra_spark.operators import read
from apache_cassandra_spark.sources.cellstore import CellStore
from apache_cassandra_spark.streaming.ingest import (
    mutation_stream,
    stream_into_store,
    windowed_event_stats,
)


@pytest.fixture()
def store(spark, tmp_path):
    catalog = Catalog.from_dict({"KS": {"Streamed": {"compare_with": "UTF8Type"}}})
    return CellStore(spark, str(tmp_path / "store"), catalog)


def write_mutations(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "batch0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_lww(spark, store, tmp_path):
    src = tmp_path / "mutations"
    write_mutations(
        src,
        [
            {"key": "u1", "sc": None, "column": "6e616d65", "value": "616c696365", "ts": 1, "tombstone": False, "ldt": None},
            {"key": "u1", "sc": None, "column": "6e616d65", "value": "626f62", "ts": 2, "tombstone": False, "ldt": None},
            {"key": "u2", "sc": None, "column": "6e616d65", "value": None, "ts": 3, "tombstone": True, "ldt": 0},
        ],
    )
    cells = mutation_stream(spark, str(src))
    q = stream_into_store(
        cells, store, "KS", "Streamed", str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    cf = store.cf("KS", "Streamed")
    rows = read.get(cf, "u1", ColumnPath("Streamed", column=b"name")).collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"bob"  # LWW applied at read
    assert read.get_count(cf, "u2").collect()[0]["count"] == 0  # tombstone honored


def test_stream_apply_listener_veto(spark, store, tmp_path):
    src = tmp_path / "mutations2"
    write_mutations(
        src,
        [
            {"key": "keep", "sc": None, "column": "63", "value": "76", "ts": 1, "tombstone": False, "ldt": None},
            {"key": "drop", "sc": None, "column": "63", "value": "76", "ts": 1, "tombstone": False, "ldt": None},
        ],
    )
    cells = mutation_stream(spark, str(src))
    q = stream_into_store(
        cells,
        store,
        "KS",
        "Streamed",
        str(tmp_path / "ckpt2"),
        apply_listener=lambda df: df.where(F.col("key") != "drop"),
        available_now=True,
    )
    q.awaitTermination(120)
    cf = store.cf("KS", "Streamed")
    keys = sorted({r["key"] for r in cf.cells.collect()})
    assert keys == ["keep"]


def test_windowed_stats_stream_matches_batch(spark, tmp_path):
    import pyspark.sql.types as T

    rows1 = [
        (1, 1_000_000 * (3600 * 0 + 5), "click", 1.0),
        (2, 1_000_000 * (3600 * 0 + 6), "click", 2.0),
    ]
    rows2 = [
        # hour 3: advances the watermark (3h - 1h) past window 0's end
        (3, 1_000_000 * (3600 * 3 + 7), "view", 3.0),
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_micros", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    batch = spark.createDataFrame(rows1 + rows2, schema)
    expected = sorted(tuple(r) for r in windowed_event_stats(batch).collect())

    src = tmp_path / "events_stream"
    src.mkdir()
    # two files + maxFilesPerTrigger=1 -> two micro-batches, so the
    # watermark from batch 1 can close window 0 during batch 2
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out_rows = []

    q = (
        windowed_event_stats(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out_rows.extend(tuple(r) for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows: window 0, not window 3
    assert set(out_rows) <= set(expected)
    closed = [t for t in expected if t[0] == "1970-01-01 00:00:00"]
    assert sorted(out_rows) == sorted(closed)
