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
        # r05 state: Block A (tier-L through r04 — their first driver row
        # lands in CORRECTNESS_r05, which runs AFTER this round's work)
        "bigram_surprisal", "normalized_text", "session_duration_histogram",
        "ann_recall", "winsorized_values", "service_health",
        "gopher_quality", "c4_line_filter", "doc_length_histogram",
        "zipf_fit", "path_latencies", "returned_item_customers",
        "error_paths", "token_fertility", "dataset_card",
        "language_confusion", "streaming_sessions_replay",
        "streaming_dedup_replay", "curation_pipeline_v3", "events_cube",
        "large_volume_customers", "priority_return_orders",
        "service_triangles", "customers_without_orders",
        "service_clustering", "dedupe_near_against", "embedding_drift",
        "split_audit",
        # Block B (operators new in r05)
        "json_decode_audit", "json_hardened_links", "temperature_resample",
        "chunked_documents", "customer_scd2", "service_components",
        "fuzzy_part_names", "decontaminate_fuzzy",
        "salted_segment_revenue", "promo_revenue", "min_cost_supplier",
        "small_quantity_revenue", "supplier_part_variety",
        "sole_return_suppliers", "interpolated_purchases",
        "customer_order_distribution", "top_supplier_revenue",
        "bracketed_discount_revenue", "nation_market_share",
        "product_type_profit", "winnowed_fingerprints", "ewma_event_value",
    }
    window = set(list(e.queries())[:50])
    missing = never_driver_gated - window
    assert not missing, (
        f"never-driver-gated queries pushed out of the first-50 gate "
        f"window: {sorted(missing)}"
    )
    # and every registry entry still has an oracle twin
    assert set(e.queries()) == set(e.oracle_sql())
