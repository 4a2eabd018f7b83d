"""Event-stream analytics: transition counts and windowed anomaly scores
(extension operators; no reference analog — the reference's only event
stream is spans, but an analytics engine over event logs needs both).

Both are single-exchange window/aggregate compositions — no UDFs, no
driver loops, engine-exact arithmetic throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (prev_type, next_type, n): first-order Markov transition counts of
    each user's event sequence (the "what do users do after X" matrix).

    One lag window per user ordered by (ts, id) — the id tiebreak pins
    simultaneous events — then a count over the (prev, next) pairs. The
    user exchange is the only data-scale shuffle; the final aggregate is
    |types|² cardinality. Sequence starts (no previous event) surface as
    prev_type = '(start)' so row counts reconcile with the input."""
    w = Window.partitionBy("u").orderBy("ts", "id")
    return (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .groupBy(
            F.coalesce("prev_type", F.lit("(start)")).alias("prev_type"),
            "next_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: DuckDB twin — identical window + aggregate.
EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT coalesce(prev_type, '(start)') AS prev_type,
       next_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq GROUP BY 1, 2
"""


def window_anomalies(
    events: DataFrame,
    window_seconds: int = 86_400,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (event_type, win_start_us, n_events, z9): tumbling windows whose
    event count deviates ≥ ``z_threshold`` standard deviations from that
    type's own mean window count — the volume-anomaly monitor (outage dip /
    incident spike detection).

    Two aggregates, both tiny after the first: (1) count per (type, window)
    — the only data-scale shuffle, map-side combined; (2) mean/std per type
    over the window counts, broadcast back onto (1). Population variance is
    computed from EXACT integer sums (n·Σx² − (Σx)²)/n², so mean, std, and
    the z-scores are bit-identical across engines and partitionings —
    never a float accumulation. z9 is the round-9 z-score."""
    win_us = window_seconds * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # the counts aggregate feeds BOTH the stats pass and the scoring join;
    # materialize it once (eager checkpoint of the tiny types × windows
    # table) so the corpus is scanned exactly once — Spark does not reuse
    # the subtree across the two consumers on its own (verified: 2 scans
    # without this)
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            (F.floor(ts_us / win_us) * win_us).cast("long").alias("win_start_us"),
        )
        .groupBy("event_type", "win_start_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    # zero-variance guard BEFORE the division: engines disagree on whether
    # NaN compares >= threshold, so a constant-count type must never reach
    # the z expression (integer comparison — exact in both engines)
    joined = counts.join(F.broadcast(stats), "event_type").filter(
        F.col("n_w") * F.col("s2") > F.col("s1") * F.col("s1")
    )
    mean = F.col("s1") / F.col("n_w")
    var = (F.col("n_w") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("n_w") * F.col("n_w")
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        joined.withColumn("z9", F.round(z, 9))
        .filter(F.abs(F.col("z9")) >= z_threshold)
        .select("event_type", "win_start_us", "n_events", "z9")
    )


def window_anomalies_sql(
    window_seconds: int = 86_400, z_threshold: float = 2.0
) -> str:
    """DuckDB twin: same integer-sum variance, same rounding."""
    win_us = window_seconds * 1_000_000
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {win_us}) * {win_us} AS BIGINT)
           AS win_start_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_w,
         CAST(sum(n_events) AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM counts GROUP BY 1
),
scored AS (
  SELECT c.event_type, c.win_start_us, c.n_events,
         round((c.n_events - CAST(s.s1 AS DOUBLE) / s.n_w)
               / sqrt(CAST(s.n_w * s.s2 - s.s1 * s.s1 AS DOUBLE)
                      / (CAST(s.n_w AS DOUBLE) * s.n_w)), 9) AS z9
  FROM counts c JOIN stats s USING (event_type)
  WHERE s.n_w * s.s2 > s.s1 * s.s1
)
SELECT event_type, win_start_us, n_events, z9
FROM scored WHERE abs(z9) >= {z_threshold}
"""
