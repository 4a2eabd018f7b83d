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
        # r07 state: through CORRECTNESS_r06, these 20 (14 r05 Block-B2 +
        # 6 r06 additions) have never held a driver row — their first
        # lands in CORRECTNESS_r07, which runs AFTER this round's work
        "forecast_revenue_change", "nation_trade_volume",
        "basket_part_pairs", "referential_integrity_audit",
        "daily_autocorrelation", "tfidf_keywords", "customer_spend_gini",
        "cross_doc_span_dedup", "hard_negative_mining",
        "important_part_share", "late_shipment_priority",
        "dominant_part_suppliers", "vocab_growth", "mad_anomalies",
        "prefix_filter_pairs", "streaming_links_stateful",
        "part_basket_kcore", "packed_chunk_spans", "doc_novelty",
        "semantic_dedup",
        # new in r07 (Block B — gate the round they appear)
        "part_communities_lpa", "dsir_importance",
        "hll_user_counts", "cms_token_counts", "weighted_doc_sample",
        "pq_cosine_topk", "hll_merge_audit", "theta_user_overlap",
    }
    window = set(list(e.queries())[:50])
    missing = never_driver_gated - window
    assert not missing, (
        f"never-driver-gated queries pushed out of the first-50 gate "
        f"window: {sorted(missing)}"
    )
    # and every registry entry still has an oracle twin
    assert set(e.queries()) == set(e.oracle_sql())
