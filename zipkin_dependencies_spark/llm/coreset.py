"""Coreset selection: greedy k-center (farthest-point traversal) over
an embedding column — the diversity-sampling primitive data-pruning
pipelines use to pick a small set of maximally-spread exemplars
(Gonzalez 1985's 2-approximation; the "facility location" family used
for training-data selection and active-learning seed sets).

Spark-first shape: the corpus NEVER shuffles. Each round broadcasts
exactly one new center (a literal array in the plan), updates a
running per-vector min-distance column with one ``least()``, and takes
the global argmax with a one-row aggregate. Driver state is k rows —
the selected centers — which is the algorithm's own output size, not a
data-sized collect. Distances are EXACT integers (vectors quantize to
1e6-scaled longs once; squared L2 sums of ints are fold-order-free),
so the DuckDB twin replays the selection bit-for-bit, tiebreaks
included."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ k rows (sel_round, vec_id, dist_q): the greedy k-center
    selection order. Round 0 seeds with the smallest id (deterministic,
    content-independent); round r picks the vector FARTHEST (max
    min-distance, ties to the smallest id) from the first r centers.
    ``dist_q`` is the selected vector's quantized squared L2 distance
    to the prior centers (0 for the seed) — the classic k-center radius
    sequence, monotonically non-increasing.

    Scale (100 TB of vectors): per round — one narrow projection over
    the corpus (update min_d against ONE broadcast literal center) and
    one TakeOrdered(1). k rounds total; nothing data-sized ever reaches
    the driver and the corpus is never exchanged. The quantized base
    is checkpointed once so rounds re-read a materialized 2-column
    table instead of re-deriving the projection."""
    q = F.transform(
        F.col(vec_col), lambda x: F.round(x * 1e6).cast("bigint")
    )
    base = emb.select(F.col(id_col).alias("vid"), q.alias("qv")).localCheckpoint(
        eager=True
    )

    def dist_to(center_q: list[int]):
        # kept as the sequential fold after a same-session sf10 A/B
        # (SCALING.md HOF audit): unrolled 9.3 s vs fold 10.3 s at sf10 —
        # inside the noise band — but the k chained unrolled trees cost
        # 4.7 s of codegen at sf0.1 (2.0 → 6.7 s measured). k-center's
        # multiplicative term is rounds, and rounds stack in ONE plan, so
        # compile cost scales with k while the win does not.
        lit = F.array(*[F.lit(int(v)) for v in center_q])
        return F.aggregate(
            F.zip_with(F.col("qv"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    seeds = base.orderBy("vid").limit(1).collect()
    if not seeds:
        raise ValueError("kcenter_coreset: empty input — nothing to select")
    seed = seeds[0]
    centers = [(0, seed["vid"], 0)]
    cur = base.withColumn("min_d", dist_to(list(seed["qv"])))
    for r in range(1, k):
        fars = cur.orderBy(F.desc("min_d"), F.asc("vid")).limit(1).collect()
        if not fars:
            raise ValueError(
                f"kcenter_coreset: corpus exhausted at round {r} (< k rows)"
            )
        far = fars[0]
        centers.append((r, far["vid"], far["min_d"]))
        if r < k - 1:
            cq = (
                base.filter(F.col("vid") == far["vid"]).collect()[0]["qv"]
            )
            cur = cur.withColumn(
                "min_d", F.least(F.col("min_d"), dist_to(list(cq)))
            )
    spark = emb.sparkSession
    return spark.createDataFrame(
        centers, "sel_round int, vec_id bigint, dist_q bigint"
    )


def kcenter_coreset_sql(k: int = 8, dim: int = 64) -> str:
    """DuckDB twin of ``kcenter_coreset`` — identical quantization,
    seed, argmax tiebreak, and integer distances, unrolled per round."""
    ctes = [
        f"""flat AS (
  SELECT vec_id AS vid, i,
         CAST(round(embedding[i + 1] * 1e6) AS BIGINT) AS q
  FROM embeddings, range({dim}) t(i)
)""",
        """c0 AS (SELECT min(vid) AS vid FROM flat)""",
        """d1 AS (
  SELECT a.vid, CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS min_d
  FROM flat a JOIN flat b ON a.i = b.i AND b.vid = (SELECT vid FROM c0)
  GROUP BY a.vid
)""",
    ]
    for r in range(1, k):
        ctes.append(
            f"""c{r} AS (
  SELECT vid, min_d FROM d{r} ORDER BY min_d DESC, vid ASC LIMIT 1
)"""
        )
        if r < k - 1:
            ctes.append(
                f"""d{r + 1} AS (
  SELECT a.vid,
         least(d.min_d,
               CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT)) AS min_d
  FROM flat a
  JOIN flat b ON a.i = b.i AND b.vid = (SELECT vid FROM c{r})
  JOIN d{r} d ON d.vid = a.vid
  GROUP BY a.vid, d.min_d
)"""
            )
    selects = ["SELECT 0 AS sel_round, vid AS vec_id, CAST(0 AS BIGINT) AS dist_q FROM c0"]
    for r in range(1, k):
        selects.append(
            f"SELECT {r} AS sel_round, vid AS vec_id, min_d AS dist_q FROM c{r}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY sel_round"
    )
