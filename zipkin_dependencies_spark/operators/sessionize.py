"""Gap-based event sessionization (extension operator; no reference analog —
the reference is pure batch over traces, but a training-data/event pipeline
needs session grouping for interaction logs).

Classic window-function decomposition, fully relational (no UDF, no state):

1. per user, order events by (ts, event_id) — the id tiebreak makes
   simultaneous events deterministic;
2. a session starts where the gap to the previous event exceeds the
   threshold (``lag`` + comparison);
3. the running count of session starts is the session index
   (``sum over rows unbounded preceding``);
4. aggregate per (user, session index).

Scale: both windows and the final aggregate hash-partition by ``user_id``
only — one shuffle total, reused across all three steps (Catalyst plans a
single Exchange; the sort feeds both window functions). Skewed power-users
are bounded by their own event count, never by the corpus.

In Structured Streaming the same semantics are ``session_window(ts, gap)``
with a watermark; this batch operator is the backfill/repair path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: DuckDB twin (events view pre-registered). Timestamps emitted as epoch
#: micros so the cross-engine value hash sees integers, not formatting.
SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us} THEN 1
                 ELSE 0 END AS is_start
  FROM ordered
),
indexed AS (
  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) AS end_us
FROM indexed
GROUP BY user_id, session_idx
"""


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """→ one row per (user, session): index, event/error counts, bounds (µs)."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_seconds * 1_000_000

    flagged = events.withColumn("_ts_us", ts_us).withColumn(
        "_is_start",
        F.when(
            F.lag("_ts_us").over(w).isNull()
            | (F.col("_ts_us") - F.lag("_ts_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    indexed = flagged.withColumn(
        "session_idx",
        F.sum("_is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return indexed.groupBy(
        F.col(user_col).alias("user_id"), F.col("session_idx").cast("long").alias("session_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
        F.min("_ts_us").alias("start_us"),
        F.max("_ts_us").alias("end_us"),
    )


def sessionize_sql(gap_seconds: int = 1800) -> str:
    return SESSIONIZE_SQL.format(gap_us=gap_seconds * 1_000_000)
