"""Multimodal column plumbing: Arrow-batched decode stub, resize, frame
sampling. The codec is stubbed (no PIL/ffmpeg in this container) — the
Spark-side schema/batching/partitioning is what's under test."""

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.analytics import multimodal as mm


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i}", 20 + i) for i in range(9)],
        "doc_id long, text string, n_chars long",
    )
    return mm.synthetic_media_from_documents(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString().replace("media_id:bigint", "media_id:bigint")
    assert {r["media_type"] for r in media.select("media_type").distinct().collect()} == {
        "image",
        "audio",
        "video",
    }


def test_extract_features_deterministic_fake(media):
    out = mm.extract_features(media, deterministic_fake=True)
    rows = out.collect()
    assert len(rows) == 9
    r = {x["media_id"]: x for x in rows}
    assert r[0]["n_bytes"] == len(b"payload text 0")
    assert len(r[0]["feature"]) == 8
    # deterministic: same payload -> same feature
    out2 = {x["media_id"]: x["feature"] for x in mm.extract_features(media).collect()}
    assert out2[3] == r[3]["feature"]


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"bytes", "image")


def test_resize_rewrites_meta(media):
    out = mm.resize_stub(media, 128, 256).select("meta.width", "meta.height").distinct().collect()
    assert [(r["width"], r["height"]) for r in out] == [(128, 256)]


def test_frame_sample_plan(media):
    plan = mm.frame_sample_plan(media, every_ms=100)
    rows = plan.collect()
    assert all(r["frame_ts"] % 100 == 0 for r in rows)
    # only video rows produce frames
    vids = {r["media_id"] for r in media.where(F.col("media_type") == "video").collect()}
    assert {r["media_id"] for r in rows} == vids
