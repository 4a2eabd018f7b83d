"""The per-trace linking operator — the one non-relational kernel (SURVEY §2.6).

Spark mapping (a) from the survey: ``groupBy(trace_key).applyInPandas`` over
the Arrow channel, executing the pure-Python linker per trace. Each group is
one trace; output is the per-trace link table, which the global A2 aggregation
then sums. Map-side cost is bounded: the kernel's output cardinality is
O(|services|²) per trace, orders of magnitude smaller than its input.

Scale notes (100 TB):
- the groupBy(trace_key) shuffle is THE big shuffle of the pipeline; AQE
  coalesces post-shuffle partitions. Bucketed span storage on trace_key would
  remove it entirely (G1 parity — see plans/job.py notes).
- per-trace skew ("Heavy" scenario): one giant trace lands on one task. The
  kernel is O(n) in spans-per-trace with small constants (dict/deque), and
  holds only one trace's 8 narrow columns in memory at once — a 10⁷-span
  trace is ~1 GB of Python objects, survivable; two-phase subtree linking is
  the round-2+ hardening for anything beyond that.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame

from ..linker import DependencyLinker, Span, trace_in_day_window
from ..schemas import TRACE_LINKS_SCHEMA


def _rows_to_spans(pdf: pd.DataFrame) -> list[Span]:
    # itertuples over 8 narrow columns; avoids pandas .apply overhead
    return [
        Span(
            parent_id=p if isinstance(p, str) else None,
            id=i if isinstance(i, str) else None,
            kind=k if isinstance(k, str) else None,
            local_service=ls if isinstance(ls, str) else None,
            remote_service=rs if isinstance(rs, str) else None,
            shared=bool(sh) if sh is not None and sh == sh else False,
            is_error=bool(er) if er is not None and er == er else False,
            timestamp=int(ts) if ts is not None and ts == ts else None,
        )
        for p, i, k, ls, rs, sh, er, ts in zip(
            pdf["parent_id"].values,
            pdf["id"].values,
            pdf["kind"].values,
            pdf["local_service"].values,
            pdf["remote_service"].values,
            pdf["shared"].values,
            pdf["is_error"].values,
            pdf["timestamp"].values,
        )
    ]


def make_trace_linker(window: tuple[int, int] | None = None):
    """Build the grouped-map function. ``window=(start_us, end_us)`` enables
    the F2 per-trace root-timestamp filter *inside* the kernel — zero extra
    shuffle, exactly where the reference applies it
    (cassandra3/.../SpansToDependencyLinks.java:36-42)."""

    def link_one_trace(pdf: pd.DataFrame) -> pd.DataFrame:
        spans = _rows_to_spans(pdf)
        if window is not None and not trace_in_day_window(spans, *window):
            return pd.DataFrame(columns=["parent", "child", "call_count", "error_count"])
        links = DependencyLinker().put_trace(spans).link()
        if not links:
            return pd.DataFrame(columns=["parent", "child", "call_count", "error_count"])
        return pd.DataFrame(links)[["parent", "child", "call_count", "error_count"]]

    return link_one_trace


def trace_links(normalized_spans: DataFrame, window: tuple[int, int] | None = None) -> DataFrame:
    """LINK_INPUT_SCHEMA rows → per-trace links (pre-aggregation)."""
    return normalized_spans.groupBy("trace_key").applyInPandas(
        make_trace_linker(window), schema=TRACE_LINKS_SCHEMA
    )


def links_from_spans(
    normalized_spans: DataFrame, window: tuple[int, int] | None = None
) -> DataFrame:
    """Full core: per-trace linking + global A2 reduction."""
    from .aggregate import aggregate_links

    return aggregate_links(trace_links(normalized_spans, window))
