"""Primary span source: parquet with the explicit v2 schema (SURVEY §2.1 S1/S4).

Schema is declared, never inferred — at 100 TB a schema-inference pass is a
full extra scan, and drift across files must fail loudly, not merge silently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SPAN_SCHEMA


def read_spans_parquet(
    spark: SparkSession, path: str, missing_as_empty: bool = True
) -> DataFrame:
    """Read a span table. Day-partitioned layouts (dir per ``day=``) get
    partition pruning for free when the F3 filter applies; flat layouts rely
    on F1's pushed timestamp predicate instead.

    ``missing_as_empty`` (default on, matching the reference's
    ``ES_INDEX_READ_MISSING_AS_EMPTY``,
    elasticsearch/.../ElasticsearchDependenciesJob.java:66): a day with no
    data yet — the cron-today case — is an empty result, not a crash. The
    explicit schema makes the empty frame indistinguishable downstream."""
    if missing_as_empty and not _exists(spark, path):
        return spark.createDataFrame([], schema=SPAN_SCHEMA)
    return spark.read.schema(SPAN_SCHEMA).parquet(path)


def _exists(spark: SparkSession, path: str) -> bool:
    # local/posix fast path; fall back to the Hadoop FS API for remote URIs
    if "://" not in path or path.startswith("file://"):
        return os.path.exists(path.removeprefix("file://"))
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
