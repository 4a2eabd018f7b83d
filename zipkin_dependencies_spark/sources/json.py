"""zipkin v2 JSON span source (SURVEY §2.1 S4, §2.2 P3/P4).

The reference reads ES daily indexes as raw (docId, json) pairs and decodes
with SpanBytesDecoder.JSON_V2, logging + skipping malformed spans
(elasticsearch/.../TraceIdAndJsonToDependencyLinks.java:38-44). Spark-first:
``from_json`` with the explicit schema in PERMISSIVE mode ≙ skip-and-count —
malformed docs yield null structs we filter out, and a `_corrupt` accumulator
equivalent is exposed as a countable DataFrame instead of a log line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SPAN_JSON_SCHEMA, SPAN_SCHEMA


def _v2_projection(s: Column) -> list[Column]:
    endpoint = lambda side: F.struct(  # noqa: E731
        s[side]["serviceName"].alias("service_name"),
        s[side]["ipv4"].alias("ipv4"),
        s[side]["ipv6"].alias("ipv6"),
        s[side]["port"].alias("port"),
    )
    return [
        s["traceId"].alias("trace_id"),
        s["parentId"].alias("parent_id"),
        s["id"].alias("id"),
        s["kind"].alias("kind"),
        s["name"].alias("name"),
        s["timestamp"].alias("timestamp"),
        s["duration"].alias("duration"),
        endpoint("localEndpoint").alias("local_endpoint"),
        endpoint("remoteEndpoint").alias("remote_endpoint"),
        s["annotations"].alias("annotations"),
        s["tags"].alias("tags"),
        s["shared"].alias("shared"),
        s["debug"].alias("debug"),
    ]


def spans_from_json_strings(df: DataFrame, json_col: str = "json") -> DataFrame:
    """(id, json-string) rows → canonical span columns; malformed JSON rows are
    dropped (they decode to a null struct). The caller can count skips as
    ``df.count() - result.count()`` without an extra scan thanks to cache or
    AQE statistics reuse."""
    parsed = df.select(F.from_json(F.col(json_col), SPAN_JSON_SCHEMA).alias("s"))
    ok = parsed.filter(F.col("s").isNotNull() & F.col("s.traceId").isNotNull())
    return ok.select(*_v2_projection(F.col("s"))).withColumn(
        "day", F.lit(None).cast("date")
    )


def read_spans_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines span files → canonical span columns (explicit schema; the
    `day` column is absent in raw JSON and set null — use F1 windowing)."""
    raw = spark.read.schema(SPAN_JSON_SCHEMA).json(path)
    df = raw.filter(F.col("traceId").isNotNull())
    # reuse the same projection by wrapping columns into a struct
    return df.select(F.struct(*[F.col(f.name) for f in SPAN_JSON_SCHEMA.fields]).alias("s")) \
        .select(*_v2_projection(F.col("s"))) \
        .withColumn("day", F.lit(None).cast("date"))
