"""v1 two-table reconstruction tests (FIXTURES.md §F2; SURVEY §2.6 MySQL matrix)."""

from __future__ import annotations

import pytest

from zipkin_dependencies_spark.functions import normalize_spans
from zipkin_dependencies_spark.operators.link import links_from_spans
from zipkin_dependencies_spark.schemas import V1_ANNOTATIONS_SCHEMA, V1_SPANS_SCHEMA
from zipkin_dependencies_spark.sources.v1 import v1_to_v2_spans


@pytest.fixture()
def v1_factory(spark):
    def factory(span_rows, anno_rows):
        spans = spark.createDataFrame(
            [tuple(r) for r in span_rows], schema=V1_SPANS_SCHEMA
        )
        annos = spark.createDataFrame(
            [tuple(r) for r in anno_rows], schema=V1_ANNOTATIONS_SCHEMA
        )
        return spans, annos

    return factory


def reconstruct(spans, annos, **kw):
    df = v1_to_v2_spans(spans, annos, **kw)
    return {r.id: r.asDict(recursive=True) for r in df.collect()}


def test_server_span_sr_with_ca(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000)],
        [
            (None, 1, 10, "sr", "backend", -1),
            (None, 1, 10, "ca", "frontend", 0),
            (None, 1, 10, "noise", "x", 0),  # filtered by F4 key filter
        ],
    )
    (span,) = reconstruct(spans, annos).values()
    assert span["kind"] == "SERVER"
    assert span["local_endpoint"]["service_name"] == "backend"
    assert span["remote_endpoint"]["service_name"] == "frontend"
    assert span["parent_id"] is None


def test_sa_without_sr_is_clientish(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000)],
        [
            (None, 1, 10, "cs", "frontend", -1),
            (None, 1, 10, "sa", "backend", 0),
        ],
    )
    (span,) = reconstruct(spans, annos).values()
    assert span["kind"] == "CLIENT"  # cs present ⇒ CLIENT
    assert span["local_endpoint"]["service_name"] == "frontend"
    assert span["remote_endpoint"]["service_name"] == "backend"


def test_sa_without_cs_uses_lc_and_null_kind(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000)],
        [
            (None, 1, 10, "lc", "frontend", 6),
            (None, 1, 10, "sa", "backend", 0),
        ],
    )
    (span,) = reconstruct(spans, annos).values()
    assert span["kind"] is None  # kind-null, both endpoints ⇒ linker treats as client
    assert span["local_endpoint"]["service_name"] == "frontend"
    assert span["remote_endpoint"]["service_name"] == "backend"


def test_cs_only_is_server_of_uninstrumented_client(v1_factory):
    # "cs" only: one-sided span owned by the client; reference renders it as
    # a SERVER span whose local is the client address (ca||cs).
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000)],
        [(None, 1, 10, "cs", "frontend", -1)],
    )
    (span,) = reconstruct(spans, annos).values()
    assert span["kind"] == "SERVER"
    assert span["local_endpoint"]["service_name"] == "frontend"
    assert span["remote_endpoint"]["service_name"] is None


def test_finagle_ca_equals_sa_drops_client_address(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000)],
        [
            (None, 1, 10, "ca", "backend", 0),
            (None, 1, 10, "sa", "backend", 0),
            (None, 1, 10, "lc", "frontend", 6),
        ],
    )
    (span,) = reconstruct(spans, annos).values()
    # ca==sa ⇒ ca dropped ⇒ local falls back to lc; no fake loopback
    assert span["local_endpoint"]["service_name"] == "frontend"
    assert span["remote_endpoint"]["service_name"] == "backend"


def test_messaging_producer_consumer(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000), (None, 1, 11, 10, 1_000_000)],
        [
            (None, 1, 10, "ms", "producer", -1),
            (None, 1, 10, "ma", "kafka", 0),
            (None, 1, 11, "mr", "consumer", -1),
            (None, 1, 11, "ma", "kafka", 0),
        ],
    )
    result = reconstruct(spans, annos)
    prod = result["000000000000000a"]
    cons = result["000000000000000b"]
    assert prod["kind"] == "PRODUCER"
    assert prod["local_endpoint"]["service_name"] == "producer"
    assert prod["remote_endpoint"]["service_name"] == "kafka"
    assert cons["kind"] == "CONSUMER"
    assert cons["local_endpoint"]["service_name"] == "consumer"
    assert cons["remote_endpoint"]["service_name"] == "kafka"
    assert cons["parent_id"] == "000000000000000a"


def test_error_requires_string_type_tag(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 1_000_000), (None, 1, 11, None, 1_000_000)],
        [
            (None, 1, 10, "sr", "a", -1),
            (None, 1, 10, "error", "a", 6),   # STRING tag ⇒ error
            (None, 1, 11, "sr", "b", -1),
            (None, 1, 11, "error", "b", -1),  # annotation, not a tag ⇒ no error
        ],
    )
    result = reconstruct(spans, annos)
    assert result["000000000000000a"]["tags"] == {"error": ""}
    assert result["000000000000000b"]["tags"] is None


def test_day_window_filters_spans(v1_factory):
    spans, annos = v1_factory(
        [(None, 1, 10, None, 5_000_000), (None, 1, 11, None, 99_000_000)],
        [(None, 1, 10, "sr", "a", -1), (None, 1, 11, "sr", "b", -1)],
    )
    result = reconstruct(spans, annos, start_us=0, end_us=10_000_000)
    assert set(result) == {"000000000000000a"}


def test_end_to_end_v1_links(spark, v1_factory):
    # classic client+server shared pair in v1: both sides annotate span 10
    spans, annos = v1_factory(
        [(None, 5, 10, None, 1_000_000), (None, 5, 11, 10, 2_000_000)],
        [
            (None, 5, 10, "sr", "frontend", -1),
            (None, 5, 11, "cs", "frontend", -1),
            (None, 5, 11, "sa", "backend", 0),
            (None, 5, 11, "sr", "backend", -1),
        ],
    )
    v2 = v1_to_v2_spans(spans, annos)
    links = links_from_spans(normalize_spans(v2))
    out = {(r.parent, r.child): (r.call_count, r.error_count) for r in links.collect()}
    assert out == {("frontend", "backend"): (1, 0)}
