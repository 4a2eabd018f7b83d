"""Slowly-changing-dimension (type 2) history builder — the warehouse
"dimension merge" every analytics engine ships: an update stream of
(key, value, ts) observations becomes one row per VALUE EPISODE with its
validity interval and a current flag (extension operator; the reference
materializes only current-state links, never attribute history).

Change capture is null-safe (a value transitioning to/from NULL is a
change like any other) and tie-broken by an explicit sequence column —
observation streams carry same-timestamp updates (the fixture's orders
table has same-day orders per customer), and without a total order the
"previous value" is nondeterministic and no two engines would agree.

Scale: two window passes over the SAME (key) partitioning — change
detection (lag) then interval closing (lead) — so Catalyst plans ONE
exchange on the key; the second window reuses the first's sort. No
joins, no driver state; per-key cost is the key's own update count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    updates: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    seq_col: str,
) -> DataFrame:
    """→ (key, value, valid_from, valid_to, version, is_current): one row
    per value episode. ``valid_from`` is the first observation of the
    episode's value, ``valid_to`` the start of the NEXT episode (null for
    the open/current one — the half-open [from, to) convention),
    ``version`` numbers episodes per key from 1, ``is_current`` marks the
    last. ``seq_col`` breaks same-timestamp ties (required for a total
    order; see module docstring)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    observed = updates.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
        F.lag(value_col).over(w).alias("_prev"),
        F.row_number().over(w).alias("_rn"),
    )
    changes = observed.filter(
        (F.col("_rn") == 1) | ~F.col("value").eqNullSafe(F.col("_prev"))
    )
    w2 = Window.partitionBy("key").orderBy("_ts", "_seq")
    return changes.select(
        "key",
        "value",
        F.col("_ts").alias("valid_from"),
        F.lead("_ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("_ts").over(w2).isNull().alias("is_current"),
    )


def customer_priority_scd2_sql() -> str:
    """DuckDB twin of the gated query (orders as an update stream of each
    customer's latest o_orderpriority): identical windows, identical
    null-safe change predicate (IS DISTINCT FROM), identical tiebreak."""
    return """
WITH obs AS (
  SELECT o_custkey AS key, o_orderpriority AS value,
         o_orderdate AS ts, o_orderkey AS seq,
         lag(o_orderpriority) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
changes AS (
  SELECT * FROM obs WHERE rn = 1 OR value IS DISTINCT FROM prev
)
SELECT key, value,
       ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       CAST(row_number() OVER w2 AS BIGINT) AS version,
       lead(ts) OVER w2 IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY key ORDER BY ts, seq)
"""
