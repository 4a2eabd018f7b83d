from .dedup import streaming_dedupe_exact
from .funnels import streaming_funnel
from .links import incremental_daily_links, streaming_trace_links
from .sessions import streaming_sessionize
from .windows import streaming_anomalies, streaming_window_counts

__all__ = [
    "incremental_daily_links",
    "streaming_dedupe_exact",
    "streaming_funnel",
    "streaming_sessionize",
    "streaming_anomalies",
    "streaming_trace_links",
    "streaming_window_counts",
]
