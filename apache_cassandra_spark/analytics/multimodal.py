"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side contract is fully real — schema, partition sizing, UDF
signatures, batch shapes, and tests all run; only the *codec* step is
stubbed (the decode libraries aren't in this container). ``decode_stub``
raises ``NotImplementedError`` unless ``deterministic_fake=True``, which
substitutes a reproducible fake "decode" so pipelines are testable
end-to-end.

Design: media payloads ride in their own column so Parquet keeps them in
separate column chunks — metadata-only queries never read the bytes
(column pruning), and ``spark.sql.files.maxPartitionBytes`` keeps task
inputs bounded even when payloads are MBs each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: hash-derived features."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def decode_stub(payload: bytes, media_type: str, deterministic_fake: bool = False) -> list[float]:
    """STUB: real image/audio decode needs PIL/ffmpeg — not in this
    container. The Spark plumbing around this call is real and tested."""
    if deterministic_fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        f"no codec for {media_type}: install PIL/torchaudio/ffmpeg and replace decode_stub"
    )


def extract_features(media: DataFrame, deterministic_fake: bool = True, batch_limit: int = 1024) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` — Arrow batches of whole
    rows stream through Python once; output schema fixed (FEATURE_SCHEMA)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "media_type": chunk["media_type"],
                        "n_bytes": chunk["payload"].map(lambda p: len(p or b"")).astype("int32"),
                        "feature": chunk["payload"].map(
                            lambda p: decode_stub(p, "any", deterministic_fake=deterministic_fake)
                        ),
                    }
                )

    return media.select("media_id", "media_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through, rewrites meta (real impl would
    transcode inside the same mapInPandas shape as extract_features)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one row per (media_id, frame_ts) — the
    distributable unit of video decode work. The decode itself is the stub."""
    frames = F.explode(
        F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms))
    )
    return media.where(F.col("media_type") == "video").select("media_id", frames.alias("frame_ts"))


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (payload = text bytes)
    so the multimodal plumbing is exercised by real distributed data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
