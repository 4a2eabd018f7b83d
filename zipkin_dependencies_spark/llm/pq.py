"""Product-quantization ANN (Jégou et al. 2011, "Product quantization
for nearest neighbor search" — public method): compress each embedding
to ``n_sub`` one-byte-ish codes, answer top-k with asymmetric distance
computation (ADC) — the memory-resident index family (FAISS's
IVFPQ/PQ) that makes billion-vector search fit in RAM.

Why this matters at 100 TB: a dim-64 float corpus is 256 B/vector; PQ
codes are ``n_sub`` small ints (8 here — a 32× working-set reduction).
The scoring plan never touches raw corpus vectors: the corpus side of
every shuffle and join is the CODES table; queries meet it through a
broadcast lookup table of precomputed sub-dot-products (the ADC trick
— score = Σ_m LUT[query][m][code_m], additive over subspaces).

Determinism engineering (the house recipe):
- the codebook is DERIVED, not trained: sub-centroids are the
  stride-sampled normalized corpus rows (``vec_id % stride == 0``,
  code = rank among sampled ids) — the same deterministic-quantizer
  discipline as IVF's coarse sampler and kmeans' stride init; stride
  auto-sizes to ceil(N/n_codes) so the codebook holds a FIXED ~256
  codes per subspace whatever the corpus (the standard PQ contract;
  encode stays linear in N — see pq_topk's docstring for the measured
  comparison against a corpus-tracking √N codebook);
- encode argmin: squared sub-distances are ordered folds rounded to 9
  decimals BEFORE the argmin, ties to the smallest code — both engines
  pick the identical code;
- ADC partials quantize to round(1e9·sub-dot) BIGINT before the
  per-(query, neighbor) sum — integer sums are fold-order-free, so the
  final ranking key is bit-stable across engines and partitionings.

Plan shape: codebook (M·K rows, KBs) broadcasts into the encode scan
(per-row min_by, map-side combined); the LUT (queries × M·K) broadcasts
into the codes table; ranking is one window per query partition. The
corpus is scanned once to encode and never shuffled as vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, x̂): L2-normalized vectors, zero-norm rows excluded (they
    have no direction to quantize; mirrors the semantic_dedup guard)."""
    from .similarity import _norm

    return (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("nrm", _norm("v"))
        .filter(F.col("nrm") > 0)
        .select(
            "id",
            F.expr("transform(v, x -> CAST(x AS DOUBLE) / nrm)").alias("xs"),
        )
    )


def pq_codebook(
    normed: DataFrame, n_sub: int, subdim: int, stride: int
) -> DataFrame:
    """→ (m, code, sub): the deterministic PQ codebook — subspace ``m``'s
    centroid ``code`` is the m-th slice of the ``code``-th stride-sampled
    normalized corpus vector (rank by id among ``id % stride == 0``)."""
    from pyspark.sql import Window

    sampled = (
        normed.filter(F.pmod(F.col("id"), F.lit(stride)) == 0)
        .withColumn(
            "code",
            F.row_number().over(Window.orderBy("id")) - 1,
        )
    )
    m_col = F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m")
    return sampled.select("code", "xs", m_col).select(
        "m",
        "code",
        F.expr(f"slice(xs, m * {subdim} + 1, {subdim})").alias("sub"),
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    dim: int = 64,
    stride: int | None = None,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, adc_q9, rank): approximate cosine top-k
    by PQ/ADC. ``adc_q9`` is the integer-quantized approximate dot
    product of the query with the neighbor's reconstructed (quantized)
    normalized vector; self-matches are excluded like ``cosine_topk``.

    Codebook sizing: ``stride=None`` derives stride = ceil(N/n_codes)
    (integer ceil — both engines compute it from their own count), so
    the codebook holds ~``n_codes`` codes per subspace REGARDLESS of
    corpus size — the standard PQ contract (FAISS trains K=256): encode
    cost N·M·K stays LINEAR in N. (An earlier √N-codebook draft made
    encode N^1.5 — measured 104 s at the sf10 tier vs this shape's
    linear curve; PQ's quantization error depends on K vs the data
    distribution, not on tracking the corpus size, so a fixed K is the
    right trade — unlike LSH banding, where occupancy forces growth.)

    The codebook-sampling window (one tiny sort of ~n_codes ids) is the
    only non-mergeable step; everything data-sized is broadcast joins +
    map-side-combined aggregates + one per-query window."""
    from pyspark.sql import Window

    from .similarity import MAX_CENTROIDS

    assert dim % n_sub == 0, (dim, n_sub)
    subdim = dim // n_sub
    if stride is None:
        n = emb.count()
        stride = max(1, (n + n_codes - 1) // n_codes)
    normed = _normalized(emb, id_col, vec_col)
    # NO materialize-once here (r11 sf10 re-adjudication, reverting the
    # r10 checkpoint): the codebook IS referenced three times (size-guard
    # count, encode broadcast side, ADC LUT join), but at sf10 the eager
    # checkpoint barrier measured strictly slower (30.9/26.8 s vs
    # 22.0/22.5 s clean A/B) — the re-run references are pruned columnar
    # scans + a bounded sampling window, cheaper than serializing the
    # codebook build into a barrier the three consumers must wait on.
    cb = pq_codebook(normed, n_sub, subdim, stride)
    k_actual = cb.count() // n_sub
    if k_actual > MAX_CENTROIDS:
        raise ValueError(
            f"codebook {k_actual} codes/subspace exceeds {MAX_CENTROIDS}; "
            "raise stride"
        )

    # encode: per (corpus row, subspace) argmin over the broadcast
    # codebook — squared distance as an ordered fold, round(9) BEFORE
    # the argmin, ties to the smallest code (cross-engine identical).
    # The broadcast-join + map-side-combined min_by shape measured 2-5×
    # faster than an unrolled literal-codebook projection at both scale
    # tiers (literal expression trees of K·M arrays evaluate per-row
    # without constant folding — 24 vs 9 s at sf1, 510 vs 104 s at
    # sf10); with K fixed at ~``n_codes`` the encode is LINEAR in N.
    corpus_sub = normed.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
        F.col("xs"),
    ).select("id", "m", F.expr(f"slice(xs, m * {subdim} + 1, {subdim})").alias("cs"))
    # squared sub-distance UNROLLED over the plan-time-constant subdim:
    # higher-order functions (zip_with/aggregate lambdas) run on Spark's
    # interpreted expression path, and this is the encode's widest stage
    # (N·M·K rows) — the unrolled codegen'd arithmetic measured 2.1×
    # faster at sf0.1 with a bit-identical checksum (the Python sum()
    # builds the same left-to-right addition chain as the sequential
    # fold, so the round-9-then-argmin oracle contract is unchanged).
    d9 = F.round(
        sum(
            (F.expr(f"cs[{j}] - sub[{j}]") * F.expr(f"cs[{j}] - sub[{j}]"))
            for j in range(subdim)
        ),
        9,
    )
    # argmin as min over ONE packed bigint: the 9-dp-rounded distance
    # scales to an exact integer (≤ 4e9 < 2^32 for unit-norm slices, so
    # d9i·2^20 + code fits a long with code < 2^20 ≥ MAX_CENTROIDS) and
    # packing is order-isomorphic to struct(d9, code) — min(bigint)
    # hash-aggregates with a map-side partial, where min_by(code,
    # struct(...)) forces SortAggregate + a full Sort of the
    # corpus×subspace×codebook stage (the encode's widest). Ordering
    # and tie-break (smallest code) are bit-identical to the struct
    # form, so the oracle's round-9-then-argmin contract is unchanged.
    d9i = F.round(d9 * 1e9).cast("bigint")
    codes = (
        corpus_sub.join(F.broadcast(cb), "m")
        .select(
            "id",
            "m",
            (F.shiftleft(d9i, 20) + F.col("code")).alias("packed"),
        )
        .groupBy("id", "m")
        .agg(F.min("packed").alias("packed"))
        .select(
            "id",
            "m",
            F.col("packed").bitwiseAND(F.lit((1 << 20) - 1)).alias("code"),
        )
    )

    # ADC lookup table: per (query, subspace, code) quantized sub-dot —
    # queries × codebook, tiny, broadcast into the codes table
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
        F.col(vec_col).alias("qv"),
    ).select(
        "query_id", "m", F.expr(f"slice(qv, m * {subdim} + 1, {subdim})").alias("qs")
    )
    # same unroll as the encode distance (identical fold order); this
    # stage is queries×M×K (tiny), unrolled for contract symmetry
    p_q9 = F.round(
        sum(
            (F.expr(f"CAST(qs[{j}] AS DOUBLE)") * F.expr(f"sub[{j}]"))
            for j in range(subdim)
        )
        * 1e9
    ).cast("bigint")
    lut = qsub.join(cb, "m").select("query_id", "m", "code", p_q9.alias("p_q9"))

    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(F.sum("p_q9").alias("adc_q9"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_q9"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_q9", "rank")
    )


def pq_topk_sql(
    k: int = 5,
    n_sub: int = 8,
    dim: int = 64,
    stride: int | None = None,
    n_codes: int = 256,
    query_pred: str = "vec_id < 32",
) -> str:
    """DuckDB twin of ``pq_topk`` over the ``embeddings`` view: identical
    normalization, stride sampling (integer-ceil N/n_codes — exact in
    both engines), round-9 argmin encode, quantized ADC partials,
    integer score sum, (score desc, id asc) ranking."""
    subdim = dim // n_sub
    stride_sql = (
        str(stride)
        if stride is not None
        else f"(SELECT GREATEST(1, (COUNT(*) + {n_codes - 1}) // {n_codes})"
        " FROM embeddings)"
    )
    return f"""
WITH flat AS (
  SELECT vec_id AS id, CAST(u.i AS INT) - 1 AS i,
         CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) u
),
norms AS (
  SELECT id, sqrt(sum(x * x ORDER BY i)) AS nrm FROM flat GROUP BY id
),
normed AS (
  SELECT f.id, f.i, f.i // {subdim} AS m, f.x / n.nrm AS x
  FROM flat f JOIN norms n ON n.id = f.id AND n.nrm > 0
),
sampled AS (
  SELECT id, row_number() OVER (ORDER BY id) - 1 AS code
  FROM (SELECT DISTINCT id FROM normed WHERE id % {stride_sql} = 0)
),
cb AS (
  SELECT s.code, n.m, n.i % {subdim} AS j, n.x AS c
  FROM sampled s JOIN normed n ON n.id = s.id
),
dists AS (
  SELECT n.id, n.m, c.code,
         round(sum((n.x - c.c) * (n.x - c.c) ORDER BY n.i), 9) AS d9
  FROM normed n JOIN cb c ON c.m = n.m AND c.j = n.i % {subdim}
  GROUP BY n.id, n.m, c.code
),
codes AS (
  SELECT id, m, code FROM (
    SELECT id, m, code,
           row_number() OVER (PARTITION BY id, m ORDER BY d9, code) AS rn
    FROM dists
  ) WHERE rn = 1
),
qflat AS (
  SELECT vec_id AS query_id, CAST(u.i AS INT) - 1 AS i,
         (CAST(u.i AS INT) - 1) // {subdim} AS m,
         CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) u
  WHERE {query_pred}
),
lut AS (
  SELECT q.query_id, q.m, c.code,
         CAST(round(sum(q.x * c.c ORDER BY q.i) * 1e9) AS BIGINT) AS p_q9
  FROM qflat q JOIN cb c ON c.m = q.m AND c.j = q.i % {subdim}
  GROUP BY q.query_id, q.m, c.code
),
scored AS (
  SELECT l.query_id, cd.id AS neighbor_id,
         CAST(sum(l.p_q9) AS BIGINT) AS adc_q9
  FROM codes cd JOIN lut l ON l.m = cd.m AND l.code = cd.code
  WHERE cd.id <> l.query_id
  GROUP BY l.query_id, cd.id
)
SELECT query_id, neighbor_id, adc_q9, rank FROM (
  SELECT query_id, neighbor_id, adc_q9,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_q9 DESC, neighbor_id ASC
         ) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""
