"""Span dedup (SURVEY §2.4 D1/D2).

The reference dedupes redundantly-stored spans per trace with a
LinkedHashSet over the 9 projected fields
(cassandra3/.../CassandraRowsToDependencyLinks.java:31-36). Relationally
that's dropDuplicates over the projected columns. The linker kernel's tree
merge makes exact duplicates harmless anyway, so this is optional work —
but running it *before* the groupBy(trace_key) shuffle shrinks the exchange
when storage replays are common.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: the projected fields that define span identity for dedup purposes
SPAN_IDENTITY_COLS = [
    "trace_key",
    "parent_id",
    "id",
    "kind",
    "local_service",
    "remote_service",
    "shared",
    "is_error",
    "timestamp",
]


def dedupe_spans(normalized_spans: DataFrame) -> DataFrame:
    return normalized_spans.dropDuplicates(SPAN_IDENTITY_COLS)
