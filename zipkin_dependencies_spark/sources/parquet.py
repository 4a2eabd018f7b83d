"""Primary span source: parquet with the explicit v2 schema (SURVEY §2.1 S1/S4).

Schema is declared, never inferred — at 100 TB a schema-inference pass is a
full extra scan, and drift across files must fail loudly, not merge silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SPAN_SCHEMA


def read_spans_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a span table. Day-partitioned layouts (dir per ``day=``) get
    partition pruning for free when the F3 filter applies; flat layouts rely
    on F1's pushed timestamp predicate instead."""
    return spark.read.schema(SPAN_SCHEMA).parquet(path)
