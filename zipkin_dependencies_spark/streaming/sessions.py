"""Streaming gap-based sessionization — the Structured Streaming twin of
``operators/sessionize.py`` (same contract: one row per closed session).

Uses the built-in ``session_window`` aggregation: Spark's state store merges
events into sessions that extend while events keep arriving within the gap,
and the watermark closes (and garbage-collects) sessions once event time has
moved ``watermark`` past their end — the streaming answer to "a session ends
when the user goes quiet". Append mode therefore emits each session exactly
once, when it can no longer grow.

Scale: state is one compact aggregate row per OPEN session (not per event),
hash-partitioned by (session_window, user_id); watermark eviction bounds the
store to in-flight sessions. No Python in the path — session_window is a
native stateful operator.

Semantic note vs the batch operator: ``session_window`` starts a new session
when the gap is REACHED (next - prev >= gap); the batch windowed variant
splits only when the gap is exceeded (>). Events exactly ``gap`` apart are a
documented half-open/closed difference of the two engines' definitions, not
a bug — pick one operator per pipeline, don't mix outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    event_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming events (must carry an event-time ``ts``) → closed sessions:
    (user_id, start_us, end_us, n_events, n_errors). Run with
    ``outputMode("append")``; sessions emit once the watermark passes them."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        event_stream.withColumn("_ts", ts)
        .withWatermark("_ts", watermark)
        .groupBy(
            F.session_window("_ts", f"{gap_seconds} seconds").alias("w"),
            F.col(user_col).alias("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            F.min(F.unix_micros(F.col("_ts"))).alias("start_us"),
            F.max(F.unix_micros(F.col("_ts"))).alias("end_us"),
        )
        .select("user_id", "start_us", "end_us", "n_events", "n_errors")
    )
