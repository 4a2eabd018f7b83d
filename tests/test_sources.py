"""JSON source + trace-id function tests (SURVEY §2.1 S4, §2.2 P2-P4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from zipkin_dependencies_spark.functions import normalize_spans
from zipkin_dependencies_spark.functions.trace import (
    lenient_trace_key,
    normalize_trace_id,
)
from zipkin_dependencies_spark.operators.link import links_from_spans
from zipkin_dependencies_spark.sources.json import spans_from_json_strings


def test_trace_id_normalization(spark):
    df = spark.createDataFrame(
        [("ABC",), ("48485A3953BB6124",), ("463ac35c9f6413ad48485a3953bb6124",)],
        ["trace_id"],
    )
    rows = df.select(
        normalize_trace_id("trace_id").alias("norm"),
        lenient_trace_key("trace_id").alias("low64"),
    ).collect()
    assert rows[0].norm == "0000000000000abc"
    assert rows[0].low64 == "0000000000000abc"
    assert rows[1].norm == "48485a3953bb6124"
    assert rows[2].norm == "463ac35c9f6413ad48485a3953bb6124"
    assert rows[2].low64 == "48485a3953bb6124"


def span_json(**kw):
    doc = {
        "traceId": "000000000000000a",
        "id": "0000000000000001",
        "kind": "CLIENT",
        "localEndpoint": {"serviceName": "frontend"},
        "remoteEndpoint": {"serviceName": "backend"},
        "timestamp": 1_464_710_316_000_000,
    }
    doc.update(kw)
    return json.dumps(doc)


def test_json_strings_decode_and_link(spark):
    raw = spark.createDataFrame(
        [
            ("1", span_json()),
            ("2", span_json(id="0000000000000002", tags={"error": "true"})),
            ("3", "{not json"),           # malformed ⇒ skipped, not fatal
            ("4", '{"no": "traceId"}'),   # missing key ⇒ skipped
        ],
        ["doc_id", "json"],
    )
    spans = spans_from_json_strings(raw)
    assert spans.count() == 2
    links = links_from_spans(normalize_spans(spans))
    out = {(r.parent, r.child): (r.call_count, r.error_count) for r in links.collect()}
    assert out == {("frontend", "backend"): (2, 1)}


def test_json_endpoint_shape_maps_to_canonical(spark):
    raw = spark.createDataFrame([("1", span_json())], ["doc_id", "json"])
    row = spans_from_json_strings(raw).first()
    assert row.local_endpoint.service_name == "frontend"
    assert row.remote_endpoint.service_name == "backend"
    assert row.trace_id == "000000000000000a"


def test_missing_span_path_reads_as_empty(spark, tmp_path):
    """S4 parity: the reference treats a missing daily index as empty
    (ES_INDEX_READ_MISSING_AS_EMPTY) — a day with no data yet is an empty
    result with the full schema, not a crash."""
    from zipkin_dependencies_spark.schemas import SPAN_SCHEMA
    from zipkin_dependencies_spark.sources import read_spans_parquet

    df = read_spans_parquet(spark, str(tmp_path / "nope"))
    assert df.schema == SPAN_SCHEMA and df.count() == 0

    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        read_spans_parquet(spark, str(tmp_path / "nope"), missing_as_empty=False)


def test_job_on_missing_store_yields_empty_links(spark, tmp_path):
    import datetime as dt

    from zipkin_dependencies_spark.plans.job import DependencyLinksJob, JobConfig

    job = DependencyLinksJob(
        spark, JobConfig(day=dt.date(2024, 1, 1), spans_path=str(tmp_path / "void"))
    )
    assert job.links().count() == 0
