"""Sharded corpus sink + schema-first readers (sources/corpus.py)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.sources import corpus as C


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "de") for i in range(200)],
        "doc_id long, text string, lang string",
    )


def test_shard_layout_and_membership(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    C.write_sharded(docs, out, key_col="doc_id", n_shards=4, fmt="parquet")
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/shard=*"))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(out)
    assert back.count() == 200
    # membership is the closed-form md5 arithmetic, recomputable on read
    mismatch = back.where(F.col("shard") != C.shard_expr("doc_id", 4)).count()
    assert mismatch == 0


def test_rows_per_file_bounds_files(spark, docs, tmp_path):
    out = str(tmp_path / "bounded")
    C.write_sharded(docs, out, key_col="doc_id", n_shards=2, rows_per_file=30, fmt="parquet")
    for shard_dir in glob.glob(f"{out}/shard=*"):
        for f in glob.glob(f"{shard_dir}/*.parquet"):
            import pyarrow.parquet as pq

            assert pq.read_metadata(f).num_rows <= 30


def test_write_is_deterministic(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        C.write_sharded(docs, out, key_col="doc_id", n_shards=4, fmt="json")
    for shard in range(4):
        fa = sorted(glob.glob(f"{a}/shard={shard}/part-*"))
        fb = sorted(glob.glob(f"{b}/shard={shard}/part-*"))
        ca = b"".join(open(f, "rb").read() for f in fa)
        cb = b"".join(open(f, "rb").read() for f in fb)
        assert ca == cb  # byte-stable shard contents


def test_readers_are_schema_first(spark, tmp_path):
    p = str(tmp_path / "x.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hi"}\n')
    with pytest.raises(ValueError, match="schema"):
        C.read_corpus(spark, p, fmt="json")
    df = C.read_corpus(spark, p, fmt="json", schema="doc_id long, text string")
    assert df.collect()[0]["text"] == "hi"
    with pytest.raises(ValueError, match="format"):
        C.read_corpus(spark, p, fmt="orc2")


def test_csv_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "csv")
    C.write_sharded(docs, out, key_col="doc_id", n_shards=2, fmt="csv")
    back = C.read_corpus(spark, out, fmt="csv", schema="doc_id long, text string, lang string")
    assert back.count() == 200
    assert {r["lang"] for r in back.select("lang").distinct().collect()} == {"en", "de"}


def test_orc_sharded_roundtrip(spark, tmp_path):
    """ORC is the second self-describing columnar interchange (built into
    Spark): sharded write -> read back preserves rows, shard membership,
    and the declared-schema contract (a wrong declared type fails at
    read, like parquet)."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    out = str(tmp_path / "orc_shards")
    C.write_sharded(docs, out, key_col="doc_id", n_shards=4, fmt="orc")
    back = C.read_corpus(spark, out, fmt="orc")
    assert back.count() == 40
    assert sorted(back.columns) == ["doc_id", "shard", "text"]
    # shard membership is the closed-form expression, not write luck
    recomputed = back.withColumn("expect", C.shard_expr("doc_id", 4))
    assert recomputed.where("shard != expect").count() == 0
    # declared schema stays a contract for self-describing formats
    typed = C.read_corpus(spark, out, fmt="orc", schema="doc_id long, text string, shard int")
    assert typed.count() == 40


def test_avro_is_an_explicit_non_format(spark):
    with pytest.raises(ValueError, match="unsupported corpus format"):
        C.read_corpus(spark, "/nope", fmt="avro")
