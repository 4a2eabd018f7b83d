"""Bucketed span storage: shuffle-free grouping parity (SURVEY §2.5 G1,
§7 M4). Verifies (a) the bucketed path produces identical links to the
shuffled path, and (b) the linker plan over a bucketed table really has no
exchange below the Python stage."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from zipkin_dependencies_spark.functions import normalize_spans
from zipkin_dependencies_spark.operators.link import links_from_spans
from zipkin_dependencies_spark.sources.bucketed import (
    read_spans_bucketed,
    write_spans_bucketed,
)
from zipkin_dependencies_spark.testdata import derived_spans

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("bucketed")
    norm = normalize_spans(derived_spans(spark, SF))
    write_spans_bucketed(norm, "spans_bucketed_test", num_buckets=8, path=str(path / "t"))
    yield "spans_bucketed_test"
    spark.sql("DROP TABLE IF EXISTS spans_bucketed_test")


def links_sorted(df):
    return sorted(
        (r.parent, r.child, r.call_count, r.error_count)
        for r in df.collect()
    )


def test_bucketed_links_match_shuffled_links(spark, bucketed_table):
    norm = normalize_spans(derived_spans(spark, SF))
    expected = links_sorted(links_from_spans(norm))
    got = links_sorted(
        links_from_spans(read_spans_bucketed(spark, bucketed_table), clustered=True)
    )
    assert got == expected and len(got) > 0


def test_bucketed_plan_has_no_span_scale_exchange(spark, bucketed_table):
    df = links_from_spans(read_spans_bucketed(spark, bucketed_table), clustered=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pandas_ids = [
        int(m.group(1)) for m in re.finditer(r"^\((\d+)\) MapInPandas", plan, re.M)
    ]
    exchange_ids = [
        int(m.group(1)) for m in re.finditer(r"^\((\d+)\) Exchange", plan, re.M)
    ]
    assert len(pandas_ids) == 1
    # ids are assigned bottom-up: nothing below the Python stage shuffles;
    # the only exchange is the link-cardinality aggregate above it
    assert all(i > pandas_ids[0] for i in exchange_ids)
    assert len(exchange_ids) == 1
    assert "SelectedBucketsCount" in plan  # scan really used the bucket layout


def test_clustered_flag_without_bucketing_would_double_count(spark):
    """The safety property inverted: clustered=True on a NON-clustered input
    must be observably wrong, proving the flag changes the plan rather than
    being cosmetic. Duplicate span reports merge per trace only when the
    trace is whole in one task — split them round-robin and they double."""
    from zipkin_dependencies_spark.schemas import LINK_INPUT_SCHEMA

    rows = []
    for t in range(50):
        dup = (f"t{t}", "r", "c", "CLIENT", "svc-a", "svc-b", False, False, 1)
        rows += [dup, dup]  # replayed storage report of the same span
    norm = spark.createDataFrame(rows, schema=LINK_INPUT_SCHEMA)

    correct = links_from_spans(norm).collect()
    assert sum(r.call_count for r in correct) == 50  # merged per trace

    split = links_from_spans(norm.repartition(8), clustered=True).collect()
    assert sum(r.call_count for r in split) > 50  # round-robin split ⇒ doubles
