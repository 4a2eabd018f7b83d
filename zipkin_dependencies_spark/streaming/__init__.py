from .dedup import streaming_dedupe_exact
from .links import incremental_daily_links, streaming_trace_links

__all__ = ["incremental_daily_links", "streaming_dedupe_exact", "streaming_trace_links"]
