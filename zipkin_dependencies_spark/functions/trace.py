"""Trace-id scalar functions (SURVEY §2.2 P2, §2.5 G1-G3).

All pure Column expressions — JVM-side, whole-stage-codegen'd; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_trace_id(col: Column | str) -> Column:
    """Lowercase-hex normalize and left-pad to 16 or 32 chars.

    Mirrors [EXT] ``Span.normalizeTraceId`` as called at
    cassandra3/.../CassandraRowToSpan.java:26: ids longer than 16 chars pad to
    32, shorter pad to 16. Non-hex input is left as-is (the reference throws;
    we keep the row and let the null-service guards drop nonsense links —
    dropping data silently at 100 TB is worse than a weird key).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.when(F.length(c) > 16, F.lpad(c, 32, "0")).otherwise(F.lpad(c, 16, "0"))


def lenient_trace_key(col: Column | str) -> Column:
    """Low 64 bits: 128-bit ids truncate to their last 16 hex chars, so mixed
    64/128-bit reports of one trace unify (CassandraRowToSpan.java:27,
    ElasticsearchDependenciesJob.java:261)."""
    norm = normalize_trace_id(col)
    return F.substring(norm, -16, 16)


def trace_key(col: Column | str, strict: bool) -> Column:
    """Grouping key: strict keeps the full id (G1); lenient truncates (G2/G3).

    ``STRICT_TRACE_ID`` env semantics at CassandraDependenciesJob.java:65.
    """
    return normalize_trace_id(col) if strict else lenient_trace_key(col)
