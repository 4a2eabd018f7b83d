"""Salted join — skew-neutralizing key decomposition for large joins
(extension operator; the reference's single RDD join inherits Spark's
hash partitioning and dies on hot keys the same way any shuffle join
does — this operator is the published mitigation, expressed as plain
DataFrame relational algebra so Catalyst still optimizes around it).

The problem at 100 TB: a shuffle join hash-partitions both sides on the
join key, so every row of a hot key lands on ONE task. With a zipfian
key (one user, one service, one day dominating), that task runs for
hours while 999 executors idle — wall-clock is the max partition, not
the mean. AQE's skew-join split helps when the skew is in one *stage's*
input sizes, but a single monster key still can't be split by AQE alone
when the small side must meet every one of its occurrences.

The salt decomposition: pick a fan-out k. On the BIG side, extend the
join key with a deterministic salt in [0, k) derived from a non-key
column (``pmod(xxhash64(salt_from), k)`` — NOT rand(): retries and
speculative tasks must re-derive the same salt or the join drops/dupes
rows). On the SMALL side, cross-join each row with the salt domain
(``explode(sequence(0, k-1))``) so every (key, salt) bucket finds its
match. The hot key's rows now spread over k tasks; the small side pays
k× replication — the classic space-for-parallelism trade. Correctness
is invariant: each big-side row still meets exactly one copy of its
key's small-side row, so the join result is row-for-row identical to
the unsalted join (the oracle twin is the UNSALTED SQL join — the gate
proves salt-invisibility, which is the operator's whole contract).

When to reach for it: both sides too big to broadcast (else broadcast
and there is no shuffle to skew) AND key histogram shows a head key
holding >~1/tasks of the rows. k should cover the head: k ≈
head_key_rows / target_partition_rows, bounded by small-side
replication tolerance. ``auto_salt_k`` derives exactly that from a
head-key probe — the same auto-sizing discipline as ``auto_planes`` /
``auto_banding`` in llm/dedup.py (the r05 manual-knob sweep closed).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def auto_salt_k(
    big: DataFrame,
    key: str,
    target_partition_rows: int = 5_000_000,
    max_k: int = 64,
    sample_fraction: float | None = None,
) -> int:
    """Fan-out k for ``salted_join`` from a head-key probe:
    ``k = ceil(head_key_rows / target_partition_rows)``, clamped to
    [1, max_k] — k=1 (no salting, no small-side replication) when no key
    is hot, exactly the k the module docstring tells the 100 TB operator
    to compute by hand.

    The probe is ``groupBy(key).count()`` + max — one key-cardinality
    exchange, map-side combined, over the single projected column (a
    column-pruned scan). ``sample_fraction`` bounds even that for
    monster inputs: probe a deterministic sample and scale the head
    count back up (seeded, so retries re-derive the same k — the same
    determinism contract as the salt itself). ``max_k`` caps small-side
    replication; ``target_partition_rows`` is the per-task row budget
    (default sized for ~executor-core work at production row widths)."""
    probe = big.select(key)
    if sample_fraction is not None:
        probe = probe.sample(fraction=sample_fraction, seed=2026)
    head = (
        probe.groupBy(key)
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    ) or 0
    if sample_fraction is not None:
        head = int(head / sample_fraction)
    return max(1, min(max_k, math.ceil(head / target_partition_rows)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``big_key = small_key`` with the key
    salted ``n_salts`` ways.

    ``salt_from`` names a big-side column whose hash spreads the salt —
    any column with per-row variety under the hot key (an event id, a
    span id, a timestamp). Deterministic: same row → same salt, always.

    Returns the joined frame with the salt columns dropped — callers see
    exactly the unsalted join's columns. Only inner/left joins make
    sense here (a right/full join would see the small side k× — guarded).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: a "
            "right/full join would observe the small side's k-fold "
            "replication as spurious unmatched rows"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return joined.drop(salted_small["__salt"]).drop(salted_big["__salt"])


def segment_revenue(
    events: DataFrame,
    customer: DataFrame,
    n_salts: int | None = None,
    target_partition_rows: int = 5_000_000,
) -> DataFrame:
    """Per-market-segment event value rollup through the salted join:
    events (big, user-skewed at production shape) meet the customer dim
    (too wide a slice to broadcast at 100 TB scale) on user_id =
    c_custkey, salted by event_id. Values integer-scaled ×1000 so the
    sums hash exactly against the unsalted DuckDB twin.

    ``n_salts=None`` (default) derives k from a head-key probe via
    ``auto_salt_k`` — the auto path the r06 verdict asked the gate to
    exercise; ``target_partition_rows`` is its per-task row budget
    (gated fixtures pass a small budget so the probe derives a real
    k > 1 from the fixture's own head key)."""
    if n_salts is None:
        n_salts = auto_salt_k(
            events, "user_id", target_partition_rows=target_partition_rows
        )
    joined = salted_join(
        events,
        customer.select("c_custkey", "c_mktsegment"),
        big_key="user_id",
        small_key="c_custkey",
        salt_from="event_id",
        n_salts=n_salts,
    )
    value_milli = F.round(F.col("value") * 1000).cast("long")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_milli).alias("value_milli"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# The oracle is the UNSALTED join — identical output proves the salt
# never leaks into results (the operator's contract).
SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
         AS value_milli,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""
