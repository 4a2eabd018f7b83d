"""Bin-bucketed point-in-interval range join — the scale-safe form of
``SELECT ... FROM points p JOIN intervals i ON p.ts BETWEEN i.lo AND i.hi``
(extension operator; the reference has no join operators at all).

Spark plans a pure inequality join as BroadcastNestedLoopJoin (fine only
while one side broadcasts) or, worse, a cartesian product. The classic
fix is BINNING: explode each interval into the fixed-width bins it covers,
key each point by its single bin, and equi-join on the bin — Catalyst then
runs an ordinary shuffled hash join, AQE handles skewed bins, and the
exact bound check runs as a post-join filter on co-located rows.

Cost model (100 TB): the interval side replicates ×(len/bin_width + 1) —
choose ``bin_width`` near the median interval length so replication stays
O(1) per interval; the point side never replicates (a point lies in
exactly ONE bin, so the join is duplicate-free by construction — no
distinct needed). One shuffle each side, on the bin key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    bin_width: int,
    ts_col: str = "ts_us",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) matches with ``lo <= ts <= hi`` (inclusive
    bounds, like SQL BETWEEN). Columns of both inputs are preserved;
    callers project/aggregate downstream. ``how='inner'`` only — the
    binning construction has no outer semantics."""
    if how != "inner":
        raise ValueError("range_join_points supports inner joins only")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    binned_i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    binned_p = points.withColumn("_bin", F.floor(F.col(ts_col) / bin_width))
    return (
        binned_p.join(binned_i, "_bin")
        .filter(
            (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
