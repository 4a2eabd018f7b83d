"""Streaming windowed aggregation with watermark-bounded late data — the
Structured Streaming twin of the batch ``sliding_window_events`` query
(extension operator; the reference is batch-only, SURVEY §7 M6 streaming
mode).

Semantics: events land in every window covering their event time
(window/slide overlapping windows each); a window EMITS once the watermark
(max seen event time − delay) passes its end, and events arriving after
the watermark has passed their window are DROPPED — the bounded-state
answer to out-of-order streams. Append mode therefore emits each window
exactly once, complete as-of the watermark.

Scale: state is one aggregate row per (open window × event_type) — the
window generator expands rows JVM-side before a normal streaming hash
aggregate, and watermark eviction garbage-collects closed windows, so the
state store is bounded by (watermark horizon / slide) × |event types|
regardless of stream length. No Python anywhere in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_counts(
    event_stream: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ append-mode stream of (win_start_us, win_end_us, event_type,
    n_events): one row per closed window, late events beyond ``watermark``
    dropped. Matches the batch query's column contract so the two can be
    diffed directly (the repair path: re-run batch over the lake, compare,
    backfill)."""
    return (
        event_stream.select(
            F.col(ts_col).cast("timestamp").alias("_ts"),
            F.col(type_col).alias("event_type"),
        )
        .withWatermark("_ts", watermark)
        .groupBy(
            F.window("_ts", window, slide).alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            F.unix_micros(F.col("w.end")).alias("win_end_us"),
            "event_type",
            "n_events",
        )
    )


def streaming_anomalies(
    event_stream: DataFrame,
    baseline_stats: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming volume-anomaly monitor: tumbling-window counts per type,
    scored live against a STATIC baseline — the stream-static broadcast
    join pattern (the realistic production split of the batch
    ``window_anomalies`` operator: expected behavior is computed offline
    over the lake, the stream only has to count and compare).

    ``baseline_stats`` carries (event_type, mean, std) from the batch
    side; each closed window emits with its z-score when |z| ≥ threshold.
    State is the windowed count aggregate only (watermark-GC'd); the
    baseline joins in as a broadcast against every micro-batch, so
    updating the baseline file between restarts retunes the monitor
    without touching stream state."""
    counts = (
        event_stream.select(
            F.col(ts_col).cast("timestamp").alias("_ts"),
            F.col(type_col).alias("event_type"),
        )
        .withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
        )
    )
    scored = counts.join(F.broadcast(baseline_stats), "event_type").select(
        "event_type",
        "win_start_us",
        "n_events",
        F.round(
            (F.col("n_events") - F.col("mean")) / F.col("std"), 9
        ).alias("z9"),
    )
    return scored.filter(F.abs(F.col("z9")) >= z_threshold)
