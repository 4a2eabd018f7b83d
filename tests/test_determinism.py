"""Partition-invariance: results must be BIT-identical when the physical
partitioning changes — the property the integer-scaled-sum designs exist to
guarantee, and the one a 1000-executor cluster silently violates if any
aggregate leans on float accumulation order.

Each query runs once in the session's normal layout and once with the input
repartitioned to a coprime partition count; the sorted row multisets must
match exactly (no tolerance — identical doubles or bust).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

#: queries whose outputs carry floats derived from cross-row aggregation —
#: the ones where partitioning could leak into values
FLOAT_SENSITIVE = [
    "label_centroids",
    "unigram_surprisal",
    "window_anomalies",
    "service_pagerank",
    "corpus_stats",
    "quantile_gate",
    "quantized_cosine_topk",
    "trace_size_percentiles",
    "kmeans_clusters",
    # r04 additions: trailing-rate divisions, burst numbering via window
    # tiebreaks, path top-k tie ordering, mixture-plan epoch division
    "link_error_rates",
    "collapse_bursts",
    "top_trace_paths",
    "mixing_plan",
    # r04 continuation: mean/ratio divisions over integer sums, regression
    # aggregates over logs, path-latency top-k tie ordering
    "dataset_card",
    "token_fertility",
    "zipf_fit",
    "path_latencies",
    "error_paths",
    "gopher_quality",
    # r05 continuation: robust-z division over x2-scaled bigint medians,
    # Gini rank formula, autocorrelation covariance ratio
    "mad_anomalies",
    "customer_spend_gini",
    "daily_autocorrelation",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", FLOAT_SENSITIVE)
def test_result_invariant_under_repartitioning(spark, name):
    import __spark_entry__ as e

    q = e.queries()[name]
    base = _rows(q(spark, SF))

    # rerun with a different shuffle width: same SQL, different physical
    # layout → different accumulation orders anywhere a float sum hides
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = _rows(q(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    assert base == alt, f"{name}: result depends on partitioning"
