"""Funnel (ordered-sequence) analysis — per user, the earliest time each
step of an ordered event sequence was reached, where step k counts only if
it happens STRICTLY AFTER the user's step-(k-1) time. The standard product
analytics conversion query (signup → click → purchase), and a shape Spark
has no built-in for (extension operator; no reference analog).

The naive formulation is k self-joins (step-k events joined against the
step-(k-1) firsts) — k shuffles of the event table and a skew hazard per
join. This implementation is the **sequential conditional-window**
decomposition:

    w  = one window per user (no ordering needed — frame is the whole
         partition)
    t1 = min(ts where type = step1)                over w
    t2 = min(ts where type = step2 AND ts > t1)    over w
    t3 = min(ts where type = step3 AND ts > t2)    over w
    ...

Each tk is an ordinary column by the time t(k+1) references it, so the
whole chain plans as ONE Exchange (hash by user) feeding k Window
operators back-to-back, and the final per-user aggregate reuses that same
partitioning — one shuffle total regardless of funnel depth. Per key the
cost is k linear passes over the user's own rows: skewed power-users are
bounded by their own event count.

Scale (100 TB): the pre-window projection keeps (user, ts µs, type) only —
the exchange never ships payloads; window state per step is a single
running min. A 1000-executor run is embarrassingly parallel across users.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_us: int | None = None,
) -> DataFrame:
    """→ one row per user seen in ``events``: ``t1_us..tk_us`` (epoch µs of
    the earliest strictly-ordered completion of each step, null once the
    chain breaks) and ``stage_reached`` (number of completed steps).

    ``within_us`` bounds each hop: step k counts only inside
    ``(t(k-1), t(k-1) + within_us]``. Greedy-from-first semantics (the
    industry-standard funnel): each step anchors on the EARLIEST qualifying
    event, so a user who converts only via a later step-1 occurrence does
    not count — deterministic and one-pass, matching the SQL twin."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    df = events.select(
        F.col(user_col).alias("user_id"),
        ts_us.alias("_ts_us"),
        F.col(type_col).alias("_type"),
    )
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col("_type") == step
        if prev is not None:
            cond = cond & (F.col("_ts_us") > F.col(prev))
            if within_us is not None:
                cond = cond & (F.col("_ts_us") <= F.col(prev) + F.lit(within_us))
        name = f"t{i}_us"
        df = df.withColumn(name, F.min(F.when(cond, F.col("_ts_us"))).over(w))
        prev = name

    t_cols = [f"t{i}_us" for i in range(1, len(steps) + 1)]
    stage = F.lit(0)
    for i, c in enumerate(t_cols, start=1):
        stage = F.when(F.col(c).isNotNull(), i).otherwise(stage)
    # rows of one user all carry identical t1..tk after the windows; the
    # min() aggregate collapses them and reuses the window's hash partitioning
    return (
        df.groupBy("user_id")
        .agg(*[F.min(c).alias(c) for c in t_cols])
        .select(
            "user_id", *t_cols, stage.cast("int").alias("stage_reached")
        )
    )


def funnel_sql(steps: Sequence[str], within_us: int | None = None) -> str:
    """DuckDB twin: the same sequential conditional windows, one CTE per
    step (SQL window expressions can't reference a sibling alias, so the
    chain unrolls into CTEs; the arithmetic is identical)."""
    steps = list(steps)
    ctes = ["base AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events)"]
    prev_rel, prev_t = "base", None
    for i, step in enumerate(steps, start=1):
        guard = f" AND ts_us > t{i-1}_us" if prev_t else ""
        if prev_t and within_us is not None:
            guard += f" AND ts_us <= t{i-1}_us + {within_us}"
        ctes.append(
            f"s{i} AS (SELECT *, min(CASE WHEN event_type = '{step}'{guard} "
            f"THEN ts_us END) OVER (PARTITION BY user_id) AS t{i}_us FROM {prev_rel})"
        )
        prev_rel, prev_t = f"s{i}", f"t{i}_us"
    t_cols = [f"t{i}_us" for i in range(1, len(steps) + 1)]
    stage = "CASE " + " ".join(
        f"WHEN t{i}_us IS NOT NULL THEN {i}"
        for i in range(len(steps), 0, -1)
    ) + " ELSE 0 END"
    return (
        "WITH " + ",\n".join(ctes) + ",\n"
        f"collapsed AS (SELECT user_id, "
        f"{', '.join('min(' + c + ') AS ' + c for c in t_cols)} "
        f"FROM {prev_rel} GROUP BY user_id)\n"
        f"SELECT user_id, {', '.join(t_cols)}, "
        f"CAST({stage} AS INT) AS stage_reached FROM collapsed"
    )
