"""Similarity search over an embedding column (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline. The
  query side is broadcast; the corpus scan stays partitioned, so the plan is
  a BroadcastNestedLoopJoin + per-corpus-partition scoring + top-k: linear in
  corpus size, embarrassingly parallel, no shuffle of the corpus.
- `lsh_cosine_topk`: the scale path — random-hyperplane signatures bucket the
  corpus; only colliding buckets are scored. Signatures are deterministic
  (hash-derived hyperplanes), so re-runs and cross-engine checks reproduce.

Dot products accumulate strictly in array order — as a sequential
`aggregate(zip_with(...))` fold by default, or (when the caller passes a
plan-time `dim` on a data×K multiplicative stage) as the unrolled
codegen'd chain `0.0 + t0 + t1 + …` with the identical association, so
float summation is deterministic either way (important for oracle
comparison; the keep/unroll decision rule is SCALING.md's HOF audit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: IVF coarse-quantizer budget: the centroid matrix rides in every task
#: closure (n × dim × 8 B ≈ 8 MB at dim 64), so size centroid_stride to
#: keep corpus_rows / centroid_stride at or under this.
MAX_CENTROIDS = 16_384


def _dot(a: str, b: str, dim: int | None = None) -> Column:
    """Ordered-fold dot product. With ``dim`` (a plan-time constant), the
    fold unrolls into codegen'd arithmetic with the IDENTICAL left-to-right
    accumulation chain (0.0 + t0 + t1 + …) — zip_with/aggregate lambdas run
    on Spark's interpreted expression path, which measured 2× slower on the
    N·K-row stages (PQ encode, kmeans assignment, in-cluster pair scans);
    without ``dim`` (unknown width) the sequential fold is kept.

    CONTRACT: passing ``dim`` asserts every vector has EXACTLY that
    width. The unrolled chain indexes v[0..dim-1] directly, so a shorter
    vector errors under ANSI mode (INVALID_ARRAY_INDEX) instead of the
    fold's partial sum over the actual length — deliberately loud, not a
    fallback: ragged inputs under ``dim`` are a caller bug. Callers with
    ragged or unknown-width vectors must omit ``dim``."""
    if dim:
        t: Column = F.lit(0.0)
        for j in range(dim):
            t = t + F.expr(f"cast({a}[{j}] AS DOUBLE) * cast({b}[{j}] AS DOUBLE)")
        return t
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)),"
        f" cast(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(vec: str, dim: int | None = None) -> Column:
    if dim:
        t: Column = F.lit(0.0)
        for j in range(dim):
            t = t + F.expr(f"cast({vec}[{j}] AS DOUBLE) * cast({vec}[{j}] AS DOUBLE)")
        return F.sqrt(t)
    return F.sqrt(
        F.expr(
            f"aggregate({vec}, cast(0.0 AS DOUBLE),"
            f" (acc, v) -> acc + cast(v AS DOUBLE) * cast(v AS DOUBLE))"
        )
    )


def _with_norm(
    df: DataFrame, id_col: str, vec_col: str, dim: int | None = None
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(vec_col, dim).alias("norm"),
    ).filter(F.col("norm") > 0)


def _cosine(a: str, b: str, dim: int | None = None) -> Column:
    return _dot(f"{a}.vec", f"{b}.vec", dim) / (
        F.col(f"{a}.norm") * F.col(f"{b}.norm")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Output: (query_id, neighbor_id, cosine, rank). Ties break on neighbor_id
    so results are total-order deterministic. Queries are broadcast — size
    the query batch, not the corpus. Pass ``dim`` when the embedding width
    is known to unroll the scoring fold (see ``_dot``)."""
    from pyspark.sql import Window as W

    c = _with_norm(corpus, id_col, vec_col, dim).alias("c")
    q = F.broadcast(_with_norm(queries, id_col, vec_col, dim)).alias("q")
    scored = q.join(
        c, F.col("q.id") != F.col("c.id")
    ).select(
        F.col("q.id").alias("query_id"),
        F.col("c.id").alias("neighbor_id"),
        F.round(_cosine("q", "c", dim), 9).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    md5-derived, uniform in [-1, 1). Computed once driver-side and shipped as
    literals — zero per-row hashing on executors, and the identical decimal
    literals can be embedded in an oracle SQL for bit-exact cross-engine
    reproduction."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) / 2.0**59 - 1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_signature(vec_col: str, n_planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature (int bitmask): sign(dot(v, r_p)) sets
    bit p. The dot is a sequential fold in array order (zip_with + aggregate)
    against a literal weight array — deterministic to the last ulp.

    Deliberately NOT unrolled (SCALING.md HOF audit): this is a LINEAR
    per-corpus-row stage, and the measured sf0.1 A/B showed the unrolled
    n_planes×dim expression tree costs more in codegen compilation than
    interpretation costs at any tier the signature stage dominates — the
    unroll only pays on data×K multiplicative stages."""
    weights = hyperplane_weights(n_planes, dim)
    sig = None
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in weights[p]])
        prod = F.zip_with(F.col(vec_col), w, lambda x, wv: x.cast("double") * wv)
        dot = F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)
        term = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("int")


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_stride: int = 97,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-flat approximate cosine top-k — the inverted-file ANN family,
    complementing hyperplane LSH (SURVEY §7 M5: "IVF or LSH-bucketed").

    Coarse quantizer: every corpus vector with ``id % centroid_stride == 0``
    is a centroid (deterministic hash-style sample — no training step, no
    random state; the standard IVF-flat recall/speed trade arrives entirely
    through centroid count and ``n_probe``). Each corpus vector is assigned
    to its nearest centroid (its "cell"); a query scores only vectors in its
    ``n_probe`` nearest cells.

    Scale design (10⁹+ vectors):
    - the centroid table is driver-collected ONCE (bounded: corpus/stride
      rows, the classic coarse-quantizer size) and embedded as literals, so
      cell assignment is a per-row JVM fold — the corpus is never joined or
      shuffled to find its cell;
    - the probe join broadcasts (query, cell) pairs; the corpus side stays
      a scan with a broadcast hash probe — cost ∝ corpus × n_probe/cells;
    - every arithmetic step is the deterministic ordered fold shared with
      cosine_topk, so the DuckDB oracle reproduces values bit-for-bit.
    """
    from pyspark.sql import Window as W

    c = _with_norm(corpus, id_col, vec_col, dim)
    q = _with_norm(queries, id_col, vec_col, dim)

    cents = (
        c.filter(F.col("id") % centroid_stride == 0)
        .select("id", "vec", "norm")
        .collect()
    )  # bounded driver collect: the coarse quantizer itself
    if not cents:
        raise ValueError(
            f"no centroids: no corpus id divisible by {centroid_stride}"
        )
    if len(cents) > MAX_CENTROIDS:
        # sizing rule (100 TB note): the centroid matrix ships inside every
        # task closure — n_centroids × dim × 8 B, ≈8 MB at the 16k/dim-64
        # cap. At 10⁹ vectors a careless stride makes a multi-MB-per-task
        # closure and a slow driver collect; fail loudly with the fix.
        raise ValueError(
            f"ivf_cosine_topk: {len(cents)} centroids exceed MAX_CENTROIDS="
            f"{MAX_CENTROIDS}; raise centroid_stride to >= "
            f"corpus_rows / {MAX_CENTROIDS} (the centroid matrix is "
            "broadcast in the task closure — keep it ~8 MB)"
        )

    import numpy as np
    import pandas as pd

    cent_ids = np.array([r["id"] for r in cents], dtype=np.int64)
    cent_mat = np.array([[float(x) for x in r["vec"]] for r in cents], dtype=np.float64)
    cent_norm = np.array([float(r["norm"]) for r in cents], dtype=np.float64)
    dim = cent_mat.shape[1]
    id_type = corpus.schema[id_col].dataType.simpleString()

    def nearest_cells(top: int):
        """Vectorized cell scoring with BIT-EXACT fold parity: the
        accumulator adds one dimension's product at a time (ascending i),
        vectorized across rows × centroids — each scalar accumulation chain
        is therefore IDENTICAL to the sequential `aggregate(zip_with(...))`
        fold the oracle replays, unlike a BLAS matmul whose summation order
        is unspecified. ~100×64 multiply-adds per row at memory bandwidth
        instead of interpreted Catalyst lambdas (measured 2-3× on the
        bench's assignment stage)."""

        def kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
                acc = np.zeros((len(pdf), len(cent_ids)), dtype=np.float64)
                for i in range(dim):
                    acc += X[:, i, None] * cent_mat[None, :, i]
                negcos = -(acc / (pdf["norm"].to_numpy()[:, None] * cent_norm[None, :]))
                # lexicographic (negcos asc, cid asc): centroids are already
                # cid-ascending, and argmin/argsort pick the first (lowest
                # cid) among ties — matching the oracle's ORDER BY negcos, cid
                if top == 1:
                    yield pdf.assign(cell=cent_ids[np.argmin(negcos, axis=1)])
                else:
                    order = np.argsort(negcos, axis=1, kind="stable")[:, :top]
                    idx = np.arange(len(pdf)).repeat(top)
                    out = pdf.iloc[idx].reset_index(drop=True)
                    yield out.assign(cell=cent_ids[order].ravel())

        return kernel

    from ..scaling import ensure_min_parallelism

    out_schema = f"id {id_type}, vec array<float>, norm double, cell {id_type}"
    # the cell rides along as an extra column out of one mapInPandas pass —
    # no join, no shuffle beyond the CPU-bound stage's parallelism floor
    corpus_cells = ensure_min_parallelism(c.select("id", "vec", "norm")).mapInPandas(
        nearest_cells(1), out_schema
    )
    probe_cells = q.select("id", "vec", "norm").mapInPandas(
        nearest_cells(n_probe), out_schema
    )

    scored = (
        F.broadcast(probe_cells.alias("q"))
        .join(
            corpus_cells.alias("c"),
            (F.col("q.cell") == F.col("c.cell")) & (F.col("q.id") != F.col("c.id")),
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(_cosine("q", "c", dim), 9).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only corpus vectors whose hyperplane
    signature matches the query's (plus all 1-bit neighbors, trading recall
    for fan-out). At 100 TB the bucket join replaces the full cross product —
    cost ∝ corpus/2^planes per query bucket."""
    c = _with_norm(corpus, id_col, vec_col).withColumn(
        "sig", hyperplane_signature("vec", n_planes, dim)
    )
    q = _with_norm(queries, id_col, vec_col).withColumn(
        "sig", hyperplane_signature("vec", n_planes, dim)
    )
    # probe buckets: exact signature + every 1-bit flip (multi-probe LSH)
    probes = F.array(
        F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    q_probes = q.select(
        F.col("id"), F.col("vec"), F.col("norm"), F.explode(probes).alias("probe")
    ).alias("q")
    c_b = c.alias("c")
    from pyspark.sql import Window as W

    scored = q_probes.join(
        c_b, (F.col("q.probe") == F.col("c.sig")) & (F.col("q.id") != F.col("c.id"))
    ).select(
        F.col("q.id").alias("query_id"),
        F.col("c.id").alias("neighbor_id"),
        # fold, not unroll: bucket-collision verify is a near-linear stage
        # (SCALING.md HOF audit — compile cost beats interpretation here)
        F.round(_cosine("q", "c"), 9).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    dim: int | None = None,
) -> DataFrame:
    """Symmetric per-vector int8 quantization → (id, scale, qvec, qnorm2).

    ``scale = max(|v|)/levels``; ``qvec[i] = round(v[i]/scale)`` ∈
    [-levels, levels]; ``qnorm2 = Σ qvec[i]²`` (exact integer). 4× smaller
    vectors (the usual memory/IO win of int8 ANN), computed as pure Column
    expressions in one codegen'd projection — no UDF, no shuffle.
    All-zero vectors (scale 0, cosine undefined) are dropped, matching the
    ``norm > 0`` guard of the float operators."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(
        F.col(id_col).alias("id"),
        vd.alias("_vd"),
        (F.array_max(F.transform(vd, F.abs)) / F.lit(float(levels))).alias("scale"),
    ).filter(F.col("scale") > 0)
    quantized = base.select(
        "id",
        "scale",
        F.transform(
            "_vd", lambda x: F.round(x / F.col("scale")).cast("long")
        ).alias("qvec"),
    )
    if dim:
        # integer sum — order-free; unrolled off the interpreted HOF path
        qnorm2 = sum(
            (F.expr(f"qvec[{j}] * qvec[{j}]") for j in range(dim)),
            F.lit(0).cast("long"),
        )
    else:
        qnorm2 = F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, q: acc + q * q
        )
    return quantized.select("id", "scale", "qvec", qnorm2.alias("qnorm2")).filter(
        F.col("qnorm2") > 0
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    dim: int | None = None,
) -> DataFrame:
    """Cosine top-k on int8-quantized vectors — the memory/bandwidth scale
    path of brute-force ANN (4× less corpus IO than float32; same
    broadcast-queries / corpus-never-shuffles plan as ``cosine_topk``).

    The per-vector scales CANCEL in the cosine:

        cos_q = (s_a s_b Σ qa·qb) / (s_a √Σqa² · s_b √Σqb²)
              = Σ qa·qb / √(Σqa² · Σqb²)

    so scoring is an INTEGER dot product folded exactly (order-free, no
    float-summation drift) with one double division + sqrt at the end —
    which also makes the DuckDB oracle trivially bit-identical.

    Output: (query_id, neighbor_id, cosine, rank) like ``cosine_topk``;
    cosine is the quantized approximation (recall vs exact is gated in
    tests, not here)."""
    from pyspark.sql import Window as W

    c = quantize_embeddings(corpus, id_col, vec_col, levels, dim).alias("c")
    q = F.broadcast(
        quantize_embeddings(queries, id_col, vec_col, levels, dim)
    ).alias("q")
    if dim:
        # integer sum — order-free; unrolled off the interpreted HOF path
        dot_int = sum(
            (F.expr(f"q.qvec[{j}] * c.qvec[{j}]") for j in range(dim)),
            F.lit(0).cast("long"),
        )
    else:
        dot_int = F.aggregate(
            F.zip_with("q.qvec", "c.qvec", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
    scored = q.join(c, F.col("q.id") != F.col("c.id")).select(
        F.col("q.id").alias("query_id"),
        F.col("c.id").alias("neighbor_id"),
        F.round(
            dot_int
            / F.sqrt((F.col("q.qnorm2") * F.col("c.qnorm2")).cast("double")),
            9,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> DataFrame:
    """Per-label centroid of an embedding column → (label, i, c): the
    grouped element-wise mean every clustering / class-prototype step needs.

    Components are scaled to exact integers (round(x·2^scale_bits) — float32
    inputs carry 24 mantissa bits, so 20 bits keeps ~1e-6 resolution) before
    summing: integer sums are order-free, which makes the result identical
    across partitionings, re-runs, and engines — a float sum would drift at
    the last ulp and break value-hash comparison.

    Scale: posexplode looks like an N×dim blow-up, but the groupBy that
    follows partial-aggregates map-side — the shuffle carries only
    (label, i) group cells per input partition (labels × dim × partitions
    rows), never the exploded data. No collect, no UDF."""
    q = F.round(F.col("x").cast("double") * F.lit(float(1 << scale_bits))).cast(
        "long"
    )
    flat = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("label", "i", q.alias("qx"))
    return flat.groupBy("label", "i").agg(
        F.round(
            (F.sum("qx") / F.count(F.lit(1))) / F.lit(float(1 << scale_bits)), 9
        ).alias("c"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


def hard_negative_mining(
    corpus: DataFrame,
    stride: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Contrastive-training hard-example mining: for every query vector
    (deterministic sample: ``id % stride == 0``) return its nearest
    same-label neighbor (the hardest positive anchor) and nearest
    OTHER-label neighbor (the hard negative), plus the cosine margin
    between them. A margin near or below zero flags vectors whose nearest
    neighbor crosses the label boundary — exactly the examples a
    contrastive fine-tune wants over-sampled.

    Plan shape matches `cosine_topk`: the query side broadcasts, the
    corpus never shuffles, scoring is per-corpus-partition, and the only
    exchange is the query-cardinality window. Cosines round to 9 before
    ranking (the established oracle-comparison contract for the
    sequential-fold dot product); ties break on neighbor id. Queries with
    no same-label or no other-label peer surface NULL on that side rather
    than vanishing — the margin is then NULL and the caller decides."""
    from pyspark.sql import Window as W

    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col(label_col).alias("label"),
        _norm(vec_col, dim).alias("norm"),
    ).filter(F.col("norm") > 0)
    q = F.broadcast(base.filter(F.col("id") % stride == 0)).alias("q")
    c = base.alias("c")
    scored = q.join(c, F.col("q.id") != F.col("c.id")).select(
        F.col("q.id").alias("query_id"),
        F.col("c.id").alias("neighbor_id"),
        (F.col("q.label") == F.col("c.label")).alias("same"),
        F.round(_cosine("q", "c", dim), 9).alias("cosine"),
    )
    w = W.partitionBy("query_id", "same").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    pos = F.when(F.col("same"), F.col("neighbor_id"))
    neg = F.when(~F.col("same"), F.col("neighbor_id"))
    return (
        top.groupBy("query_id")
        .agg(
            F.max(pos).alias("pos_id"),
            F.max(F.when(F.col("same"), F.col("cosine"))).alias("pos_cos"),
            F.max(neg).alias("neg_id"),
            F.max(F.when(~F.col("same"), F.col("cosine"))).alias("neg_cos"),
        )
        .withColumn(
            "margin", F.round(F.col("pos_cos") - F.col("neg_cos"), 9)
        )
    )
