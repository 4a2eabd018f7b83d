from .parquet import read_spans_parquet
from .json import read_spans_json, spans_from_json_strings
from .v1 import v1_to_v2_spans

__all__ = [
    "read_spans_parquet",
    "read_spans_json",
    "spans_from_json_strings",
    "v1_to_v2_spans",
]
