"""Daily gap-fill with LINEAR INTERPOLATION — timeseries resampling for
sparse per-entity metrics (extension operator; the reference's daily
aggregation simply has no row for an empty day — this operator is what a
forecasting/monitoring consumer runs on top of such output).

dense_daily_counts (the sibling in __spark_entry__.py) zero-fills: right
for counts, wrong for level metrics (spend, latency, balance) where an
absent day means "not observed", not "zero". Here every interior missing
day gets the linear blend of its nearest known neighbors — the standard
resampling semantics (pandas ``interpolate(method='time')``, SQL
``last_value IGNORE NULLS`` bracketing).

Shape, and why it scales: the expensive input is aggregated FIRST
(groupBy entity+day — map-side combined, one shuffle of (entity, day)
pairs); the spine (per-entity ``sequence(min_day, max_day)`` exploded)
and the four bracketing windows all run at spine cardinality — entities ×
days, orders of magnitude below event cardinality — partitioned BY
ENTITY, so one entity's series never crosses executors and the window
sort is per-partition. No corpus re-shuffle, no global sort, no Python.

Cross-engine exactness: values are integer-scaled before aggregation;
the interpolation is one all-integer numerator (value-delta × day-offset,
bounded by series span — no overflow) with a SINGLE double division and
one addition, the identical IEEE expression in the DuckDB twin, so the
gate hashes bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_daily(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_milli: F.Column,
) -> DataFrame:
    """Per-entity daily sum of ``value_milli`` over the entity's own
    [first, last] day range, interior missing days linearly interpolated.

    Returns (entity, day, value_milli nullable — null marks a filled
    day, interp double — the dense series, is_gap).
    """
    day = F.to_date(F.date_trunc("day", F.col(ts_col).cast("timestamp")))
    daily = (
        df.select(F.col(entity_col).alias("entity"), day.alias("day"), value_milli.alias("vm"))
        .groupBy("entity", "day")
        .agg(F.sum("vm").alias("value_milli"))
    )
    spine = (
        daily.groupBy("entity")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "entity",
            F.explode(F.sequence("mn", "mx")).alias("day"),
        )
    )
    dense = spine.join(daily, ["entity", "day"], "left")
    back = (
        Window.partitionBy("entity")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("entity")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("value_milli").isNotNull(), F.col("day"))
    bracketed = dense.select(
        "entity",
        "day",
        "value_milli",
        F.last("value_milli", ignorenulls=True).over(back).alias("pv"),
        F.last(known_day, ignorenulls=True).over(back).alias("pd"),
        F.first("value_milli", ignorenulls=True).over(fwd).alias("nv"),
        F.first(known_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    # endpoints are always known (the spine is bounded by the entity's
    # min/max OBSERVED day), so pv/pd/nv/nd are non-null on gap rows
    interp = F.when(
        F.col("value_milli").isNotNull(), F.col("value_milli").cast("double")
    ).otherwise(
        F.col("pv")
        + (
            (F.col("nv") - F.col("pv")) * F.datediff("day", "pd")
        ).cast("double")
        / F.datediff("nd", "pd")
    )
    return bracketed.select(
        "entity",
        "day",
        "value_milli",
        interp.alias("interp"),
        F.col("value_milli").isNull().alias("is_gap"),
    )


def purchase_interpolation_sql() -> str:
    """DuckDB twin of the events purchase-series instantiation
    (q_interpolated_purchases): identical windows, identical IEEE
    arithmetic order (integer numerator, one double division, one
    addition)."""
    return """
WITH daily AS (
  SELECT user_id AS entity,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
           AS value_milli
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
spine AS (
  SELECT entity, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY))
                      AS DATE) AS day
  FROM (SELECT entity, min(day) AS mn, max(day) AS mx
        FROM daily GROUP BY 1)
),
dense AS (
  SELECT s.entity, s.day, d.value_milli
  FROM spine s LEFT JOIN daily d ON s.entity = d.entity AND s.day = d.day
),
bracketed AS (
  SELECT entity, day, value_milli,
         last_value(value_milli IGNORE NULLS) OVER (
           PARTITION BY entity ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN value_milli IS NOT NULL THEN day END
                    IGNORE NULLS) OVER (
           PARTITION BY entity ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(value_milli IGNORE NULLS) OVER (
           PARTITION BY entity ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN value_milli IS NOT NULL THEN day END
                     IGNORE NULLS) OVER (
           PARTITION BY entity ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM dense
)
SELECT entity, day, value_milli,
       CASE WHEN value_milli IS NOT NULL
            THEN CAST(value_milli AS DOUBLE)
            ELSE pv + CAST((nv - pv) * date_diff('day', pd, day) AS DOUBLE)
                      / date_diff('day', pd, nd)
       END AS interp,
       value_milli IS NULL AS is_gap
FROM bracketed
"""
