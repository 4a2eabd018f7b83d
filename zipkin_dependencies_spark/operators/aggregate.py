"""Global link reduction (SURVEY §2.7 A2).

``reduceByKey`` in the reference (CassandraDependenciesJob.java:178-186 et
al.) ≙ Catalyst HashAggregate(partial) → Exchange → HashAggregate(final):
map-side combine is free, and since the linker kernel already collapsed each
trace to its distinct (parent, child) pairs, the exchange moves only
O(traces × links-per-trace) tiny rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_links(trace_links: DataFrame, extra_keys: list[str] | None = None) -> DataFrame:
    """Sum per-trace (or per-partition partial) links to the global table.
    ``extra_keys`` prepends grouping columns (e.g. ``["day"]`` for the
    multi-day incremental path)."""
    keys = [*(extra_keys or []), "parent", "child"]
    return trace_links.groupBy(*keys).agg(
        F.sum("call_count").alias("call_count"),
        F.sum("error_count").alias("error_count"),
    )
