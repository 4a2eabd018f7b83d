"""Weak-scaling fixture generator: derive an R×-scale copy of a driver
testdata directory whose replicas are KEY-SHIFTED and CONTENT-DISJOINT, so
wall-clock at R× measures the engine's scaling curve rather than a
degenerate workload.

Naive replication (union R identical copies) is the wrong fixture for
every interesting operator: near-dup pipelines would see R exact copies of
every document (verified pairs grow R², not R), ANN would rank R-way ties,
and exact dedup would collapse the corpus back to 1×. Each replica here is
transformed so the per-replica workload profile matches the source and the
cross-replica interaction is none:

- fact keys (order/trace, event, user, doc, vec ids) shift by
  ``replica * KEY_STRIDE`` — joins stay internally consistent per replica
  (lineitem rows follow their orders), streams of distinct entities grow
  linearly; KEY_STRIDE ≡ 1 (mod 5) keeps the ``doc_id % 5`` sampling
  predicates selecting the same fraction per replica;
- document text passes through a replica-specific Caesar substitution
  (``F.translate`` over [a-z]) — token lengths, whitespace, punctuation,
  and per-doc shingle counts are preserved (same per-replica dedup
  difficulty), while shingles across replicas are disjoint (no
  cross-replica near-dup pairs: total pairs grow linearly, the honest
  weak-scaling shape);
- embeddings rotate their dimension order by the replica index — norms
  (and thus cosine geometry per replica) are exactly preserved, vectors
  across replicas are distinct;
- dimension tables (region/nation/customer/supplier/part) stay 1×, like a
  production warehouse: facts grow, dimensions don't, broadcast joins stay
  broadcast-able.

Timestamps are untouched: the event/order time WINDOW is constant while
volume grows R× — the standard "same retention, more traffic" scale model,
so per-window aggregates genuinely densify.

This module writes to a caller-chosen scratch dir and never touches the
driver's read-only testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: key shift between replicas. Far above any driver-data key, and ≡ 1
#: (mod 5) so doc_id % 5 == 0 sampling keeps selecting ~1/5 per replica.
KEY_STRIDE = (1 << 32) + 1

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_ALPHA_UP = _ALPHA.upper()


def _caesar(i: int) -> tuple[str, str]:
    """Replica-i substitution alphabet (identity for replica 0)."""
    k = i % 26
    rot = _ALPHA[k:] + _ALPHA[:k]
    return _ALPHA + _ALPHA_UP, rot + rot.upper()


def _replica(spark: SparkSession, src: str, table: str, i: int) -> DataFrame:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    shift = F.lit(i * KEY_STRIDE).cast("long")
    if table == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + shift)
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + shift)
    if table == "events":
        return df.withColumn("event_id", F.col("event_id") + shift).withColumn(
            "user_id", F.col("user_id") + shift
        )
    if table == "documents":
        src_a, dst_a = _caesar(i)
        return df.withColumn("doc_id", F.col("doc_id") + shift).withColumn(
            "text", F.translate(F.col("text"), src_a, dst_a)
        )
    if table == "embeddings":
        out = df.withColumn("vec_id", F.col("vec_id") + shift)
        if i % 64:
            k = i % 64
            emb = F.concat(
                F.slice(F.col("embedding"), k + 1, 64 - k),
                F.slice(F.col("embedding"), 1, k),
            )
            out = out.withColumn("embedding", emb)
        return out
    raise ValueError(f"not a fact table: {table}")


def write_scaled(
    spark: SparkSession, src_dir: str, dst_dir: str, replicas: int = 10
) -> None:
    """Materialize ``replicas``× fact tables (+ 1× dims) under ``dst_dir``
    as one parquet dir per table, matching the driver layout so every
    ``queries()`` entry runs against it unmodified."""
    os.makedirs(dst_dir, exist_ok=True)
    # driver parquet stores TIMESTAMP(NANOS); read as long nanos (exactly
    # like testdata.load_events) so the copy round-trips losslessly
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in DIM_TABLES:
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst_dir}/{t}.parquet")
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        out = _replica(spark, src_dir, t, 0)
        for i in range(1, replicas):
            out = out.unionByName(_replica(spark, src_dir, t, i))
        out.write.mode("overwrite").parquet(f"{dst_dir}/{t}.parquet")
