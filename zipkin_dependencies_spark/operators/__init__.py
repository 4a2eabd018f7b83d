from .aggregate import aggregate_links
from .day_filter import filter_span_window, filter_day_partition
from .dedup import dedupe_spans
from .link import links_from_spans, trace_links

__all__ = [
    "aggregate_links",
    "filter_span_window",
    "filter_day_partition",
    "dedupe_spans",
    "links_from_spans",
    "trace_links",
]
