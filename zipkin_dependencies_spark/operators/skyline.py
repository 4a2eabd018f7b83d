"""Distributed Pareto frontier (2-D skyline): the non-dominated rows
under (minimize cost, maximize benefit) — "best tradeoff" queries
(cheapest-for-its-recency supplier, fastest-for-its-price service
tier) that a WHERE clause cannot express (Börzsönyi et al. 2001 "The
Skyline Operator").

Dominance (minimize c, maximize d): A dominates B iff c_A ≤ c_B and
d_A ≥ d_B with at least one strict. The naive plan is the O(N²)
dominance self-join; the sort-based identity this module uses instead:

    B is dominated  ⟺  max{ d_A : c_A < c_B } ≥ d_B
                        OR max{ d_A : c_A = c_B } > d_B

so the frontier falls out of ONE prefix-max over the cost order plus a
per-cost-value max — both computable at scale with the two-phase
bucketing the rank family uses (operators/rank.py): range-bucket on
cost, per-bucket maxima prefix-max on the driver (n_buckets rows),
within-bucket RANGE-frame windows (bounded by the bucket). Equal
(c, d) duplicates do NOT dominate each other (no strict inequality) —
all copies stay on the frontier, which both engines must agree on."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pareto_frontier(
    df: DataFrame,
    cost_col: str,
    benefit_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """→ the input rows on the (minimize ``cost_col``, maximize
    ``benefit_col``) Pareto frontier. Both columns must be integral
    (quantize first — exact comparisons are the point).

    Scale shape: one exchange keyed by the cost bucket; the only
    global state is the per-bucket max table (n_buckets rows,
    driver-side prefix max, broadcast back). Within-bucket prefix
    maxima use a RANGE frame ordered by cost — bounded by the bucket,
    never a data-sized window. The dominance check is then a pure
    per-row predicate."""
    # a small source can arrive in fewer partitions than cores (one
    # parquet file ⇒ one task evaluating the bucket expression and the
    # windows serially) AND this operator reads its input three times
    # (split sample, bucket maxima, final windows). Small-source path:
    # re-spread + materialize once so the three jobs read memory. A
    # 100 TB scan is already wide — the condition never fires there, so
    # no gratuitous exchange or materialization at scale (there,
    # re-deriving from the columnar scan beats writing a copy).
    n_par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_par:
        df = df.repartition(n_par).localCheckpoint(eager=True)
    # relativeError 0.01: splits only load-balance the buckets — the
    # frontier is exact whatever the splits (the rank-family rule)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    splits = sorted(set(df.stat.approxQuantile(cost_col, qs, 0.01)))
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + (F.col(cost_col) > F.lit(s)).cast("int")
    bucketed = df.withColumn("__bkt", bucket)

    # per-bucket max benefit -> driver prefix-max over STRICTLY prior
    # buckets (n_buckets rows; a size the caller chose, not the data)
    bmax = (
        bucketed.groupBy("__bkt")
        .agg(F.max(benefit_col).alias("__mx"))
        .collect()
    )
    acc = None
    prior: list[tuple[int, int | None]] = []
    for bkt, mx in sorted((r["__bkt"], r["__mx"]) for r in bmax):
        prior.append((bkt, acc))
        acc = mx if acc is None else max(acc, mx)
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        prior, schema="__bkt int, __prior long"
    )

    # within-bucket: max benefit over STRICTLY cheaper rows (RANGE frame
    # excludes cost ties), and max benefit among SAME-cost rows
    w_prev = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(cost_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("__bkt", cost_col)
    out = (
        bucketed.join(F.broadcast(offsets), "__bkt")
        .withColumn("__prev", F.max(benefit_col).over(w_prev))
        .withColumn("__same", F.max(benefit_col).over(w_same))
        .withColumn(
            "__cheaper_max",
            F.greatest(
                F.coalesce(F.col("__prev"), F.lit(-(1 << 62))),
                F.coalesce(F.col("__prior"), F.lit(-(1 << 62))),
            ),
        )
        .filter(
            (F.col("__cheaper_max") < F.col(benefit_col))
            & (F.col("__same") <= F.col(benefit_col))
        )
        .drop("__bkt", "__prior", "__prev", "__same", "__cheaper_max")
    )
    return out


def pareto_frontier_sql(
    table_expr: str, key_cols: str, cost: str, benefit: str
) -> str:
    """DuckDB twin — the same sort-based identity as one RANGE-frame
    window over the global cost order plus a same-cost max (DuckDB is
    the oracle; it is allowed the single window the Spark side
    deliberately avoids)."""
    return f"""
WITH pts AS ({table_expr}),
scored AS (
  SELECT *,
         max({benefit}) OVER (ORDER BY {cost}
                              RANGE BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_mx,
         max({benefit}) OVER (PARTITION BY {cost}) AS same_mx
  FROM pts
)
SELECT {key_cols}, {cost}, {benefit}
FROM scored
WHERE (prev_mx IS NULL OR prev_mx < {benefit})
  AND same_mx <= {benefit}
"""
