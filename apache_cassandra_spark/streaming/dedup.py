"""Streaming deduplication for ingest pipelines.

A training-data ingest stream wants exactly the batch dedup semantics
(``analytics.dedup.exact_dedup``) applied incrementally: the first
arrival of a content hash passes, every later duplicate is dropped, even
across micro-batches. Structured Streaming has a native stateful
operator for precisely this — ``dropDuplicates`` (unbounded state) /
``dropDuplicatesWithinWatermark`` (state expired by the event-time
watermark) — so the implementation is a hash projection plus the
built-in operator, no custom state code.

Scale: state per distinct document is one 128-bit hash key in the state
store, not the document body; with an event-time watermark the store
holds only the lateness horizon. The same function works on a batch
DataFrame (Spark collapses ``dropDuplicates`` to a hash aggregate),
which is how the equivalence test pins streaming == batch output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: unit-separator joint hash — same content key as dedup.exact_dedup
def content_hash(cols: Sequence[str]) -> Column:
    return F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))


def dedup_stream(
    docs: DataFrame,
    content_cols: Sequence[str] = ("text",),
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup over a (possibly streaming) frame.

    With ``event_time_col`` set on a streaming frame, duplicates are only
    suppressed within the watermark horizon and state is garbage-collected
    past it (``dropDuplicatesWithinWatermark``) — the unbounded-state
    default is correct for bounded backfills, the watermarked form for
    always-on ingest.
    """
    hashed = docs.withColumn("content_hash", content_hash(content_cols))
    if event_time_col is not None and hashed.isStreaming:
        return hashed.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
