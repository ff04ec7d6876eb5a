"""Stream-stream event-time joins — the click/impression correlation
shape (attribute each click to its impression within an event-time
horizon).

Structured Streaming joins two streams by buffering both sides in the
state store; WITHOUT time bounds that state grows forever, so the
operator here enforces the production contract: a watermark on both
sides plus an event-time range condition, which lets Spark expire
buffered rows as the watermark advances (state ~ input rate × horizon,
not history).

The same function runs on batch frames (the time-range condition becomes
a plain theta predicate on top of the key equi-join) — the equivalence
test pins streaming output == the batch join, the same
batch-as-specification discipline as `streaming/dedup.py` and
`streaming/sessions.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts_micros",
    right_ts: str = "ts_micros",
    horizon: str = "1 hour",
    watermark: str | None = "1 hour",
    prefix: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Join right-side events to left-side events with the same ``key``
    where ``left_ts <= right_ts <= left_ts + horizon`` (an impression on
    the left, its clicks on the right). Timestamps are bigint
    epoch-micros (the events contract); ``horizon``/``watermark`` are
    Spark interval strings.

    Streaming: both sides get event-time watermarks; the range condition
    bounds the buffered state on each side to the horizon + lateness.
    Scale: the equi-join key carries the shuffle — the time range is a
    post-locate filter, never a theta join; state per key is the rows
    inside the horizon window only.

    ``watermark=None`` disables state expiry AND late-drop: required for
    historical replay from unordered files (a watermark would silently
    drop every pair a micro-batch behind the running max event time —
    the r5 sessions pitfall). Inner joins stay correct without a
    watermark; the cost is state bounded by the replayed history instead
    of the horizon, so keep a watermark on live streams.
    """
    lt = left.select(
        F.col(key).alias("_k"),
        F.timestamp_micros(F.col(left_ts)).alias("_lt"),
        *[F.col(c).alias(prefix[0] + c) for c in left.columns if c not in (key, left_ts)],
    )
    rt = right.select(
        F.col(key).alias("_rk"),
        F.timestamp_micros(F.col(right_ts)).alias("_rt"),
        *[F.col(c).alias(prefix[1] + c) for c in right.columns if c not in (key, right_ts)],
    )
    if lt.isStreaming and watermark is not None:
        lt = lt.withWatermark("_lt", watermark)
    if rt.isStreaming and watermark is not None:
        rt = rt.withWatermark("_rt", watermark)
    cond = (
        (lt["_k"] == rt["_rk"])
        & (rt["_rt"] >= lt["_lt"])
        & (rt["_rt"] <= lt["_lt"] + F.expr(f"INTERVAL {horizon}"))
    )
    out = lt.join(rt, cond, "inner")
    return out.select(
        F.col("_k").alias(key),
        F.unix_micros("_lt").alias("left_ts"),
        F.unix_micros("_rt").alias("right_ts"),
        *[c for c in out.columns if c.startswith(prefix[0]) or c.startswith(prefix[1])],
    )
