"""As-of join — for each left row, attach the most recent right row at or
before it (per key). The canonical point-in-time lookup of event/feature
pipelines (last price before a trade, last click before a purchase, latest
feature snapshot before a label), and an operator Spark's join family does
not provide (extension operator; no reference analog — SURVEY §2 has no
joins beyond the pushed MySQL subquery one).

A naive formulation is an inequality join (``l.key = r.key AND r.ts <=
l.ts`` + max-per-left-row): Spark plans that as a broadcast-nested-loop or
sort-merge with per-row rescans — O(|L|·|R|) per key, hopeless at scale.
This implementation is the **union + ordered-window** decomposition:

1. tag right rows side=0 and left rows side=1 and union the two pruned
   projections (key, ts, payload-struct);
2. one window per key ordered by ``(ts, side, tiebreak)``, frame = rows
   unbounded-preceding→current: ``last(right_payload, ignorenulls=True)``
   carries the latest right row forward onto every left row;
3. keep side=1 rows; optionally null out matches older than ``tolerance``.

Cost: ONE shuffle, on the join key only — both inputs are sorted together
once, every key's work is linear in its own row count, and payload columns
ride inside a struct so the exchange ships exactly what the output needs.
Ordering right (side=0) before left (side=1) at equal timestamps makes the
match INCLUSIVE (``r.ts <= l.ts``) — the same semantics as DuckDB's native
``ASOF JOIN ... ON l.ts >= r.ts``, which is the oracle twin.

Scale (100 TB): the single exchange partitions by key; a skewed key costs
one sorted run of its own rows (no quadratic blow-up, unlike the
inequality-join plan). Window state is one struct (the running "last right
row") — O(1) per row, no frame buffering, because the frame never looks
ahead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the most recent
    right row with ``right.ts <= left.ts`` in the same ``on`` group (nulls
    when no such row, like DuckDB ``ASOF LEFT JOIN``).

    ``right_cols`` are the right payload columns to attach (default: all
    non-key, non-ts columns), emitted as ``<col><suffix>`` plus
    ``<right_ts><suffix>`` (epoch µs). ``tiebreak`` orders simultaneous
    rows deterministically (same-side ties; pick a unique id column).
    ``tolerance_us`` nulls out matches farther back than the given µs."""
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]
    right_cols = list(right_cols)

    l_payload = [c for c in left.columns if c not in on]
    ts_us_l = F.unix_micros(F.col(left_ts).cast("timestamp"))
    ts_us_r = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # pruned projections: key, event-time µs, one payload struct per side.
    # `_tb` makes same-timestamp SAME-side rows deterministic; cross-side
    # ties are already pinned by `_side` (right sorts first → inclusive).
    # A tiebreak column absent from BOTH inputs is a caller typo that would
    # silently degrade to nondeterministic same-ts ordering — fail loudly.
    if tiebreak and tiebreak not in left.columns and tiebreak not in right.columns:
        raise ValueError(
            f"asof_join: tiebreak column {tiebreak!r} exists in neither "
            f"input (left: {left.columns}, right: {right.columns})"
        )
    if tiebreak:
        # a non-integral tiebreak would cast to long as null (silently
        # nondeterministic again) — require an integral id column
        for side in (left, right):
            if tiebreak in side.columns:
                dtype = dict(side.dtypes)[tiebreak]
                if dtype not in ("tinyint", "smallint", "int", "bigint"):
                    raise ValueError(
                        f"asof_join: tiebreak column {tiebreak!r} must be "
                        f"an integral id column, got {dtype}"
                    )
    tb_l = F.col(tiebreak) if tiebreak and tiebreak in left.columns else F.lit(0)
    tb_r = F.col(tiebreak) if tiebreak and tiebreak in right.columns else F.lit(0)
    lhs = left.select(
        *on,
        ts_us_l.alias("_ts_us"),
        F.lit(1).alias("_side"),
        tb_l.cast("long").alias("_tb"),
        F.struct(*l_payload).alias("_l"),
    )
    rhs = right.select(
        *on,
        ts_us_r.alias("_ts_us"),
        F.lit(0).alias("_side"),
        tb_r.cast("long").alias("_tb"),
        F.struct(ts_us_r.alias("_r_ts_us"), *right_cols).alias("_r"),
    )
    lhs = lhs.withColumn("_r", F.lit(None).cast(rhs.schema["_r"].dataType))
    rhs = rhs.withColumn("_l", F.lit(None).cast(lhs.schema["_l"].dataType))

    u = lhs.unionByName(rhs.select(*lhs.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts_us", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_us is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_ts_us") - F.col("_m._r_ts_us") <= F.lit(tolerance_us),
                F.col("_m"),
            ),
        )
    out_cols = (
        [F.col(c) for c in on]
        + [F.col(f"_l.{c}").alias(c) for c in l_payload]
        + [F.col("_ts_us").alias(f"{left_ts}_us")]
        + [F.col("_m._r_ts_us").alias(f"{right_ts}{suffix}_us")]
        + [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    )
    return matched.select(*out_cols)


#: DuckDB twin for the attribution demo query (events view pre-registered):
#: native ASOF LEFT JOIN, inclusive on l.ts >= r.ts — the semantics the
#: window decomposition reproduces. Timestamps emitted as epoch µs.
ASOF_ATTRIBUTION_SQL = """
WITH purchases AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type IN ('click', 'view')
)
SELECT p.user_id,
       p.event_id,
       round(p.value, 9) AS value,
       epoch_us(p.ts) AS ts_us,
       epoch_us(c.ts) AS ts_r_us,
       c.event_id AS event_id_r,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def asof_attribution(events: DataFrame) -> DataFrame:
    """Demo/driver query: each purchase attributed to the user's most recent
    click-or-view at or before it. Exercises the left-outer path (early
    purchases with no prior click keep nulls) and the inclusive tie rule."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.round(F.col("value"), 9).alias("value"), "ts"
    )
    clicks = events.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], tiebreak="event_id", suffix="_r"
    )
    return joined.select(
        "user_id",
        "event_id",
        "value",
        "ts_us",
        "ts_r_us",
        "event_id_r",
        (F.col("ts_us") - F.col("ts_r_us")).alias("gap_us"),
    )
