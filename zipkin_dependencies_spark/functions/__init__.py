from .trace import lenient_trace_key, normalize_trace_id, trace_key
from .spans import clean_kind, error_flag, normalize_spans, service_name
from .time import day_window_micros, micros_to_day, utc_day

__all__ = [
    "normalize_trace_id",
    "lenient_trace_key",
    "trace_key",
    "clean_kind",
    "error_flag",
    "service_name",
    "normalize_spans",
    "day_window_micros",
    "micros_to_day",
    "utc_day",
]
