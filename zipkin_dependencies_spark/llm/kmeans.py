"""K-means-lite clustering over the embedding column — deterministic,
fixed-round, exactly reproducible across engines (extension operator; the
"cluster the corpus" step between ANN and curation in an embedding-aware
data pipeline).

Determinism engineering (the whole point — stock k-means is seed- and
order-dependent, useless for an oracle-gated engine):
- init: every vector with ``id % stride == 0`` is a centroid (the same
  deterministic coarse-quantizer convention as the IVF index);
- assignment: squared-L2 accumulated in dimension order — the unrolled
  codegen'd chain when ``dim`` is passed (the N·k assignment is the classic
  data×K stage; SCALING.md HOF audit measured 5× at sf10), else the ordered
  ``zip_with``+``aggregate`` fold; both are the identical accumulation
  chain of the SQL twin's ``ORDER BY i`` sum;
  ties broken by centroid id through a single ``min_by(struct(d, cid))``;
- update: per-(cluster, dim) means from INTEGER sums (round(x·2^bits) as
  long — order-free), centroid components rounded to 9 decimals per round
  so every subsequent distance computes on identical doubles everywhere.

Scale (10⁹ vectors): each round is one broadcast of the k×dim centroid
table against the corpus scan (assignment never shuffles the corpus —
the per-vector k-way argmin collapses through a map-side-combinable
``min_by``) plus one (cluster, dim)-keyed update aggregate whose shuffle
carries k·dim cells per input partition. Rounds are unrolled (no
convergence probe), so the driver never inspects data; cost is
rounds × (scan + tiny shuffle) — the textbook distributed k-means layout.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_stride(n_rows: int) -> int:
    """Centroid-stride = ceil(sqrt(N)) — the balance point of the two
    costs a stride controls (r07 sf1 measurement, SCALING.md fourth
    tier): assignment is N·k = N²/stride distance folds (every vector
    scores every centroid), the downstream in-cluster pair scan is
    N·stride. A FIXED stride holds occupancy flat but makes assignment
    quadratic — measured ~158× wall at 10× data on semantic_dedup. stride
    = √N makes both terms N^1.5 (the sub-quadratic SemDeDup shape; the
    paper's web-scale runs use approximate assignment to go below that,
    which trades the bit-exact oracle this engine gates on).

    Uses float sqrt + ceil so the DuckDB twin (CEIL(SQRT(COUNT(*)))) is
    bit-identical: for N < 2^52 the correctly-rounded IEEE sqrt cannot
    cross an integer boundary (gap to the next integer ≥ 1/(2√N) ≫ ulp),
    so both engines derive the same stride."""
    return max(1, math.ceil(math.sqrt(max(n_rows, 1))))


def _sq_dist(v: str, c: str, dim: int | None = None):
    """Ordered squared-L2 fold. With ``dim`` known at plan time the fold
    unrolls into codegen'd arithmetic — identical accumulation chain
    (0.0 + t0 + t1 + …), but off the interpreted higher-order-function
    path that dominates the N·k assignment stage (the PQ-encode lesson,
    llm/pq.py)."""
    if dim:
        t = F.lit(0.0)
        for j in range(dim):
            d = F.expr(f"{v}[{j}] - {c}[{j}]")
            t = t + d * d
        return t
    return F.aggregate(
        F.zip_with(F.col(v), F.col(c), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, d: acc + d,
    )


def kmeans_assign(
    emb: DataFrame,
    rounds: int = 2,
    stride: int = 97,
    scale_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """→ (vec_id, cluster, d9): each vector's cluster (centroid id of the
    stride-sampled init, carried through ``rounds`` update rounds) and its
    round-9 squared distance to that centroid."""
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cents = vecs.filter(F.col("id") % stride == 0).select(
        F.col("id").alias("cid"), F.col("v").alias("cv")
    )
    # same convention as ivf_cosine_topk: an empty coarse sample is a
    # caller error (stride too large for the id range), not an empty result
    if cents.isEmpty():
        raise ValueError(f"no centroids: no vector id divisible by {stride}")

    def assign(centroids: DataFrame) -> DataFrame:
        scored = vecs.join(F.broadcast(centroids)).select(
            "id",
            "v",
            F.struct(
                _sq_dist("v", "cv", dim).alias("d"), F.col("cid").alias("cid")
            ).alias("s"),
        )
        return scored.groupBy("id").agg(
            F.min("s").alias("best"), F.first("v").alias("v")
        ).select(
            "id", "v", F.col("best.cid").alias("cluster"), F.col("best.d").alias("d")
        )

    scale = float(1 << scale_bits)
    for _ in range(rounds):
        assigned = assign(cents)
        cents = (
            assigned.select(
                F.col("cluster").alias("cid"), F.posexplode("v").alias("i", "x")
            )
            .select(
                "cid",
                "i",
                F.round(F.col("x") * F.lit(scale)).cast("long").alias("qx"),
            )
            .groupBy("cid", "i")
            .agg(
                F.round(
                    (F.sum("qx") / F.count(F.lit(1))) / F.lit(scale), 9
                ).alias("c")
            )
            .groupBy("cid")
            .agg(
                F.expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)")
                .alias("cv")
            )
        )
    final = assign(cents)
    return final.select(
        F.col("id").alias("vec_id"), "cluster", F.round("d", 9).alias("d9")
    )


def kmeans_assign_sql(
    rounds: int = 2,
    stride: int | str = 97,
    scale_bits: int = 20,
    dim: int = 64,
) -> str:
    """DuckDB twin: the same unrolled rounds over the flat (id, i, x)
    representation; ordered distance sums, integer-scaled centroid means.
    ``stride`` may be an int literal or a SQL scalar expression string
    (e.g. a subquery deriving ceil(sqrt(count(*))) — the auto_stride
    twin), interpolated verbatim into the centroid-init predicate."""
    scale = 1 << scale_bits
    ctes = [
        f"""flat AS (
  SELECT vec_id AS id, CAST(u.i AS INT) - 1 AS i,
         CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) u
)""",
        f"c0 AS (SELECT id AS cid, i, x AS c FROM flat WHERE id % {stride} = 0)",
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""a{r} AS (
  SELECT id, cid, d FROM (
    SELECT f.id, c.cid, sum((f.x - c.c) * (f.x - c.c) ORDER BY f.i) AS d,
           row_number() OVER (PARTITION BY f.id
             ORDER BY sum((f.x - c.c) * (f.x - c.c) ORDER BY f.i), c.cid) AS rn
    FROM flat f JOIN {prev} c ON f.i = c.i
    GROUP BY f.id, c.cid
  ) WHERE rn = 1
),
c{r} AS (
  SELECT a.cid, f.i,
         round((CAST(sum(CAST(round(f.x * {scale}.0) AS BIGINT)) AS DOUBLE)
                / count(*)) / {scale}.0, 9) AS c
  FROM flat f JOIN a{r} a USING (id)
  GROUP BY a.cid, f.i
)"""
        )
        prev = f"c{r}"
    ctes.append(
        f"""final AS (
  SELECT id, cid, d FROM (
    SELECT f.id, c.cid, sum((f.x - c.c) * (f.x - c.c) ORDER BY f.i) AS d,
           row_number() OVER (PARTITION BY f.id
             ORDER BY sum((f.x - c.c) * (f.x - c.c) ORDER BY f.i), c.cid) AS rn
    FROM flat f JOIN {prev} c ON f.i = c.i
    GROUP BY f.id, c.cid
  ) WHERE rn = 1
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT id AS vec_id, cid AS cluster, round(d, 9) AS d9 FROM final"
    )
