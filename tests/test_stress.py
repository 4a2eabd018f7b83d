"""Opt-in scale stress (SPARK_GRAFT_STRESS=1): the SCALING.md 10× point,
reproducible — 7.5M spans (ten sf0.1 replicas under fresh trace ids)
through the full flagship pipeline, asserting result invariance and a
throughput floor. Skipped by default to keep the suite fast."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="set SPARK_GRAFT_STRESS=1 to run the 7.5M-span stress point",
)


def _replicate_10x(spark):
    """Ten sf0.1 replicas under fresh trace ids: roots' trace_id/id and
    children's parent_id get a replica-digit prefix. NOTE: the rewrite is
    only correct for the current DEPTH-2 derived_spans forest (children
    point only at roots) — a deeper fixture would dangle grandchildren,
    so the count assert and the 10x-result asserts both guard it."""
    from zipkin_dependencies_spark.testdata import derived_spans

    base = derived_spans(spark, "/root/testdata/sf0.1")
    replicas = []
    for i in range(10):
        p = str(i)
        replicas.append(
            base.withColumn(
                "trace_id", F.concat(F.lit(p), F.substring("trace_id", 2, 15))
            )
            .withColumn(
                "id",
                F.when(
                    F.col("parent_id").isNull(),
                    F.concat(F.lit(p), F.substring("id", 2, 15)),
                ).otherwise(F.col("id")),
            )
            .withColumn(
                "parent_id",
                F.when(
                    F.col("parent_id").isNotNull(),
                    F.concat(F.lit(p), F.substring("parent_id", 2, 15)),
                ),
            )
        )
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    big = big.localCheckpoint(eager=True)
    assert big.count() == 7_500_000
    return base, big


def test_flagship_at_10x_replicated_sf01(spark):
    from zipkin_dependencies_spark.functions import normalize_spans
    from zipkin_dependencies_spark.operators.link import links_from_spans

    base, big = _replicate_10x(spark)
    n = 7_500_000

    # replicas preserve service names, so links must equal 10x the base
    base_links = {
        (r["parent"], r["child"]): (r["call_count"], r["error_count"])
        for r in links_from_spans(normalize_spans(base)).collect()
    }
    t0 = time.monotonic()
    got = {
        (r["parent"], r["child"]): (r["call_count"], r["error_count"])
        for r in links_from_spans(normalize_spans(big)).collect()
    }
    wall = time.monotonic() - t0
    assert got == {k: (10 * c, 10 * e) for k, (c, e) in base_links.items()}
    # generous floor: the recorded point is ~1M spans/s; flag anything
    # an order of magnitude off (a plan regression, not machine noise)
    assert n / wall > 100_000, f"throughput collapsed: {n/wall:,.0f} spans/s"


def test_path_build_at_10x_replicated_sf01(spark):
    """The pointer-doubling path table at 7.5M spans (the sf1 tier's
    worst wall ratio): replicas preserve service names, so every path's
    occurrence count must be exactly 10× the base — and the build must
    sustain a throughput floor (conservative: >150k spans/s end-to-end
    including the leaf anti-join and count aggregation)."""
    import time

    from zipkin_dependencies_spark.functions import normalize_spans
    from zipkin_dependencies_spark.operators.paths import top_trace_paths

    base, big = _replicate_10x(spark)
    n = 7_500_000

    base_paths = {
        r["path"]: r["n_occurrences"]
        for r in top_trace_paths(normalize_spans(base), k=100).collect()
    }
    t0 = time.monotonic()
    big_paths = {
        r["path"]: r["n_occurrences"]
        for r in top_trace_paths(normalize_spans(big), k=100).collect()
    }
    el = time.monotonic() - t0
    assert big_paths == {p: c * 10 for p, c in base_paths.items()}
    assert n / el > 150_000, f"path build too slow: {n/el:.0f} spans/s"
