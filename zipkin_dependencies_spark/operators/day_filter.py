"""The three day-filter semantics (SURVEY §2.3 F1/F2/F3) as a config enum.

- F1 ``SPAN_WINDOW``  (MySQL parity): every span filtered to the µs window;
  partial traces link from in-window spans only
  (MySQLDependenciesJob.java:182-196).
- F2 ``TRACE_ROOT``   (Cassandra parity): no scan-time predicate; after
  grouping, a trace whose *root* span has a missing/zero/out-of-window
  timestamp is dropped whole (SpansToDependencyLinks.java:36-42). Implemented
  inside the linker kernel (operators/link.py) — zero extra shuffle.
- F3 ``DAY_PARTITION`` (ES parity): read only the day's partition; no
  timestamp predicate at all (ElasticsearchDependenciesJob.java:173,180).
"""

from __future__ import annotations

import datetime as dt
from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DayFilter(str, Enum):
    SPAN_WINDOW = "span_window"      # F1, MySQL parity
    TRACE_ROOT = "trace_root"        # F2, Cassandra parity (default)
    DAY_PARTITION = "day_partition"  # F3, ES parity


def filter_span_window(spans: DataFrame, start_us: int, end_us: int) -> DataFrame:
    """F1: per-span BETWEEN on the timestamp — pushed to the parquet scan."""
    return spans.filter(F.col("timestamp").between(start_us, end_us))


def filter_day_partition(
    spans: DataFrame, day: dt.date, end_day: dt.date | None = None
) -> DataFrame:
    """F3: static partition pruning on the `day` partition column — Catalyst
    turns this into PartitionFilters on the scan, the Spark-native equivalent
    of the reference reading one daily index. ``end_day`` widens the prune to
    an inclusive range (multi-index backfill)."""
    if end_day is not None:
        return spans.where(F.col("day").between(F.lit(day), F.lit(end_day)))
    return spans.where(F.col("day") == F.lit(day))
