"""Local replica of the driver's t2 correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet,
compare row counts, column names, and order-insensitive values (sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(_canon(row[i]) for i in order) for row in rows
    )


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def all_query_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, ddb, name):
    import __spark_entry__ as e

    q = e.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = e.oracle_sql().get(name)
    if sql is None:
        # rows-only check for non-SQL-expressible ops
        assert len(spark_rows) >= 0
        return
    res = ddb.execute(sql)
    ddb_cols = [d[0].lower() for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count mismatch"
    left = _rows_to_multiset(spark_rows, spark_cols)
    right = _rows_to_multiset(ddb_rows, ddb_cols)
    assert left == right, f"{name}: value mismatch (first diff: " \
        f"{next(((a, b) for a, b in zip(left, right) if a != b), None)})"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"parent", "child", "call_count", "error_count"}


def test_registry_gate_window_policy():
    """Evidence policy guard (PARITY.md "Evidence tiers"): the driver's
    correctness gate runs the FIRST 50 registry entries, so every query
    that has never received a driver CORRECTNESS row must sit inside that
    window. A refactor that reorders the registry silently forfeits the
    round's gate coverage — fail here instead."""
    import __spark_entry__ as e

    never_driver_gated = {
        # r04 batch of previously-ungated operators + all r04 additions
        "streaming_funnel_replay", "streaming_anomalies_replay",
        "curation_pipeline_v2", "sessionize_events", "asof_attribution",
        "funnel_events", "quantile_gate", "bm25_search", "hybrid_search",
        "kmeans_clusters", "dense_daily_counts", "props_rollup",
        "corpus_diff", "semantic_search", "unigram_surprisal",
        "service_pagerank", "service_reachability", "span_fanout_histogram",
        "event_value_percentiles", "events_daily_pivot",
        "trace_size_percentiles", "event_transitions", "window_anomalies",
        "cohort_retention", "corpus_stats", "group_topn_sample",
        "label_centroids", "media_stats", "media_frames", "media_features",
        "incident_range_join", "collapse_bursts", "inverted_index",
        "ngram_containment", "link_error_rates", "mixing_plan",
        "top_trace_paths", "streaming_bursts_replay",
        "streaming_join_replay", "links_window_diff",
        "trace_depth_histogram", "heavy_hitter_users",
        "shipping_priority", "nation_volume_pairs",
    }
    window = set(list(e.queries())[:50])
    missing = never_driver_gated - window
    assert not missing, (
        f"never-driver-gated queries pushed out of the first-50 gate "
        f"window: {sorted(missing)}"
    )
    # and every registry entry still has an oracle twin
    assert set(e.queries()) == set(e.oracle_sql())
