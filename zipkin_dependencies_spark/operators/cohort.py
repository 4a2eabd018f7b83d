"""Cohort retention — group users by first-seen week, count how many are
still active N weeks later. The other classic product-analytics matrix
next to the funnel (extension operator; no reference analog).

Decomposition (all relational, no UDF):

1. cohort(user) = UTC week of the user's first event — a ``min`` window
   over the user partition (NOT a groupBy+join back: the window reuses the
   same hash partitioning the dedup step below needs anyway);
2. one row per (user, activity week) — dropDuplicates on the pruned
   (user, cohort_week, week_offset) projection;
3. count distinct users per (cohort_week, week_offset) — after step 2 the
   pairs are unique, so this is a plain count, no count_distinct state.

Scale (100 TB): two exchanges total — by user (window + dedup share it;
Catalyst plans one Exchange feeding both) and by (cohort, offset) for the
final count, whose cardinality is weeks² — KB-scale however big the
corpus. The event payload never travels: the first projection prunes to
(user_id, ts-week) before any shuffle.

Week arithmetic is days-since-epoch / 7 (epoch = Thursday; consistent in
both engines and immune to locale week-start rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _week_index(ts_col):
    # floor(days-since-epoch / 7): deterministic integer weeks, no ISO-week
    # locale traps. date_trunc first so sub-day times don't shift the day.
    return F.floor(
        F.datediff(F.to_date(F.date_trunc("day", ts_col)), F.lit("1970-01-01")) / 7
    ).cast("long")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (cohort_week, week_offset, n_users): users first seen in
    ``cohort_week`` (epoch-week index) who were active ``week_offset``
    weeks later. ``week_offset = 0`` row is the cohort size."""
    week = _week_index(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col)
    per_user_week = (
        events.select(F.col(user_col).alias("user_id"), week.alias("week"))
        .withColumn("cohort_week", F.min("week").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .dropDuplicates(["user_id", "cohort_week", "week_offset"])
    )
    return per_user_week.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


#: DuckDB twin (events view pre-registered) — identical week arithmetic.
COHORT_RETENTION_SQL = """
WITH per_event AS (
  SELECT user_id,
         CAST(floor(datediff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) / 7)
              AS BIGINT) AS week
  FROM events
),
cohorted AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM per_event
),
dedup AS (
  SELECT DISTINCT user_id, cohort_week, week - cohort_week AS week_offset
  FROM cohorted
)
SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
FROM dedup
GROUP BY cohort_week, week_offset
"""
