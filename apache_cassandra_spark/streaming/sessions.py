"""Session windows over event streams — Spark's native stateful
session operator (``F.session_window``), the streaming twin of the
batch ``events_sessionize`` query.

The batch query computes sessions with lag + running-sum (one window
pass per user); a *stream* cannot look backwards like that, so the
streaming form uses ``session_window(event_time, gap)`` — Spark keeps
per-key session state, merges windows as events arrive, and emits a
session when the watermark passes its close. Same membership semantics:
two events share a session iff no silence longer than ``gap`` separates
them (session_window merges on overlap of [t, t+gap) intervals, which is
exactly the gap rule).

Works on batch frames too (no state needed) — the equivalence test pins
batch session_window membership to the lag-based query's, so the two
formulations can't drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "ts_micros",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-(user, session) aggregates via native session windows.

    Scale: state is per active (key, session); the watermark bounds how
    long a session can stay open, so state size is (active keys ×
    open sessions), not history. On batch input it's a plain aggregate.

    ``watermark=None`` disables the lateness bound — REQUIRED when
    replaying unordered historical files in complete mode (a batch whose
    events lag a previous batch's max by more than the watermark would
    silently drop them: measured 9,549 → 6,479 sessions on a 6-file
    shuffle of the events table). Live append-mode streams should keep a
    watermark or state never ages out."""
    with_ts = events.withColumn("_event_time", F.timestamp_micros(F.col(ts_col)))
    if with_ts.isStreaming and watermark is not None:
        with_ts = with_ts.withWatermark("_event_time", watermark)
    return (
        with_ts.groupBy(F.session_window("_event_time", gap).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.min("_event_time").alias("first_event"),
            F.max("_event_time").alias("last_event"),
        )
        .select(
            key_col,
            "n_events",
            F.unix_micros("first_event").alias("start_us"),
            F.unix_micros("last_event").alias("end_us"),
        )
    )
