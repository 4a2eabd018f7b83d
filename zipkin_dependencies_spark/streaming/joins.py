"""Stream-stream interval join — native Structured Streaming two-stream
join with event-time range conditions and watermark-bounded state (the
one streaming join class the engine's other streaming operators don't
cover; no custom kernel, this is exactly what Spark's stream-stream join
machinery exists for).

Use case: live attribution — every (click, conversion) pair for the same
user where the conversion lands within ``within`` of the click. An INNER
stream-stream join emits each pair the moment both sides have arrived
(emission does not wait for the watermark); the watermarks + the range
condition bound the join STATE — each side holds only rows newer than
watermark − within, so state is O(rate × horizon), not O(stream).

The drained availableNow replay therefore equals the batch inequality
join exactly (every pair emits, order-independent), which is what the
``streaming_join_replay`` oracle query pins against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    within_seconds: int,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """→ append-mode stream of (user_id, left_id, right_id, left_ts_us,
    right_ts_us): all same-user pairs with
    ``left.ts <= right.ts <= left.ts + within_seconds`` (inclusive, like
    SQL BETWEEN). Both inputs must be streaming DataFrames."""
    l = (
        left_stream.select(
            F.col(user_col).alias("l_user"),
            F.col(ts_col).cast("timestamp").alias("l_ts"),
            F.col(id_col).alias("left_id"),
        ).withWatermark("l_ts", watermark)
    )
    r = (
        right_stream.select(
            F.col(user_col).alias("r_user"),
            F.col(ts_col).cast("timestamp").alias("r_ts"),
            F.col(id_col).alias("right_id"),
        ).withWatermark("r_ts", watermark)
    )
    joined = l.join(
        r,
        F.expr(
            "l_user = r_user AND "
            f"r_ts >= l_ts AND r_ts <= l_ts + interval {within_seconds} seconds"
        ),
        "inner",
    )
    return joined.select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        F.unix_micros("l_ts").alias("left_ts_us"),
        F.unix_micros("r_ts").alias("right_ts_us"),
    )
