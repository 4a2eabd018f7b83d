"""Deterministic sampling operators for training-data pipelines.

Spark's ``df.sample()`` is seed-dependent per partition layout — repartition
the input and the sample changes, which makes pipeline re-runs non-reproducible
and oracle comparison impossible. These operators sample by a content-stable
hash of the row key instead: the decision for a row depends only on the row,
so re-runs, backfills, and engines agree (the property that matters when a
100 TB corpus is resampled incrementally).

Hash family: the top 32 bits of md5(key || salt), identical in Spark
(``conv(substring(md5(x), 1, 8), 16, 10)``) and DuckDB
(``('0x' || substr(md5(x), 1, 8))::BIGINT``) — no UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32


def _bucket(key: Column, salt: str) -> Column:
    """Uniform [0, 2^32) bucket from the key's salted md5."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the space.

    Deterministic in the row key alone: stable under repartitioning,
    re-runs, and engine swaps. Disjoint salts give independent samples of
    the same corpus (train/val splits)."""
    threshold = int(fraction * HASH_SPACE)
    return df.filter(_bucket(F.col(key_col), salt) < threshold)


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling: each stratum value gets its own keep
    fraction (e.g. downsample boilerplate-heavy sources, keep all rare
    ones). One scan, one codegen'd predicate — no per-stratum jobs."""
    threshold = F.lit(int(default_fraction * HASH_SPACE))
    for value, fraction in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(fraction * HASH_SPACE))
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(key_col), salt) < threshold)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test) by
    consecutive hash ranges proportional to ``weights``. Returns the input
    plus a ``split`` column; ranges partition the space so the splits are
    disjoint and exhaustive — the standard reproducible corpus split."""
    total = sum(weights.values())
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    upper = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        upper += weights[name] / total
        cond = bucket < int(upper * HASH_SPACE)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def quantile_gate(
    df: DataFrame,
    score: Column,
    p: float = 0.75,
    group_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep rows whose ``score`` is at or above the corpus's (or their
    group's) p-th percentile — the corpus-RELATIVE quality gate ("keep the
    top quartile per source") that an absolute threshold can't express,
    because the cut moves with the data.

    The threshold never touches the driver: it's a one-row (or
    group-cardinality) aggregate broadcast back onto the scan, so the plan
    is aggregate → broadcast-join → filter, and the corpus itself is
    scanned twice but shuffled ZERO times (the grouped aggregate shuffles
    only (group, score) pairs).

    ``exact=True`` uses ``percentile`` (linear interpolation, the same
    definition as DuckDB's ``quantile_cont`` — oracle-parity mode). At
    100 TB exact percentile sort-buffers each group's values inside the
    aggregate; flip ``exact=False`` for t-digest ``percentile_approx``
    (bounded memory, rank error ≤ 1/accuracy) — same plan shape, no oracle."""
    clash = {"score", "threshold"} & set(df.columns)
    if clash:
        # the gate appends fixed output columns; a silent duplicate would
        # make downstream F.col("score") ambiguous — fail loudly
        raise ValueError(
            f"quantile_gate: input already has column(s) {sorted(clash)}; "
            "rename them first (the gate emits 'score' and 'threshold')"
        )
    pct = (
        F.percentile(score, F.lit(p))
        if exact
        else F.percentile_approx(score, F.lit(p), F.lit(accuracy))
    )
    scored = df.withColumn("_score", score)
    if group_col is None:
        thr = scored.agg(pct.alias("_thr"))
        gated = scored.join(F.broadcast(thr))
    else:
        thr = scored.groupBy(group_col).agg(pct.alias("_thr"))
        gated = scored.join(F.broadcast(thr), group_col)
    return (
        gated.filter(F.col("_score") >= F.col("_thr"))
        .withColumn("_thr", F.round("_thr", 9))
        .withColumnRenamed("_score", "score")
        .withColumnRenamed("_thr", "threshold")
    )


def group_hash_topn(
    df: DataFrame,
    n: int,
    group_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly ``n`` rows per group (fewer if the group is smaller), chosen
    by salted-hash order — the deterministic analog of per-group reservoir
    sampling. Unlike fraction-based sampling, group sizes come out EQUAL
    (balanced eval sets, per-domain caps); unlike rand()-based reservoirs,
    re-runs and engines agree row-for-row.

    Plan: one exchange on the group key + per-group sort of (hash, key)
    prefixes — the window never sees payload columns until the final
    filter, and a group's cost is its own row count. Skew-bounded like any
    per-key window; no global sort."""
    w = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(key_col), salt).alias("_h"), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def mixing_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """→ one row per weighted source: (source, n_docs, n_tokens, weight,
    target_tokens, epochs9, keep_fraction9) — the pre-training data-mixture
    planner. Given mixture ``weights`` (fractions of ``token_budget``) it
    reports, per source, how many tokens exist, how many the mixture wants
    (``target_tokens = floor(weight × budget)``), the repeat factor
    (``epochs9 = target / available``; > 1 means the source must repeat to
    hit its weight) and the single-epoch sampling fraction
    (``keep_fraction9 = min(1, epochs)`` — feed it straight into
    ``stratified_hash_sample`` to materialize the mix).

    One hash aggregate over (source) — token counting is the same
    whitespace tokenizer the gated text_stats uses, summed as exact
    integers, so the plan is engine-exact; the two derived floats are one
    multiply and one divide on those integers (round-9 pinned). At 100 TB
    the aggregate output is |sources| rows — the plan itself is free; the
    expensive part (the sampling scan) happens once, downstream, with the
    plan's fractions baked into a codegen'd predicate."""
    from .text import token_count

    w_expr = F.lit(None).cast("double")
    for value, weight in sorted(weights.items()):
        w_expr = F.when(
            F.col(source_col) == value, F.lit(float(weight))
        ).otherwise(w_expr)

    counted = docs.select(
        F.col(source_col).alias("source"),
        token_count(text_col).alias("_tok"),
    )
    agg = counted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
    )
    out = agg.withColumn(
        "weight", w_expr.alias("weight")
    ).filter(F.col("weight").isNotNull())
    target = F.floor(F.col("weight") * F.lit(int(token_budget))).cast("long")
    return out.select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "weight",
        target.alias("target_tokens"),
        F.round(target / F.col("n_tokens"), 9).alias("epochs9"),
        F.round(
            F.least(F.lit(1.0), target / F.col("n_tokens")), 9
        ).alias("keep_fraction9"),
    )


def temperature_resample(
    docs: DataFrame,
    tau: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened source mixture, materialized in one pass:
    the multilingual-pretraining rebalance (sample sources ∝ n^τ, τ<1
    upweights small sources relative to large ones) expressed as a
    per-source deterministic keep fraction

        keep_fraction_i = min(1, (n_i / n_min)^(τ-1))

    — the ratio of source i's ∝n^τ share to its natural ∝n share,
    anchored at the SMALLEST source (which keeps fraction 1): flattening
    means downsampling the big sources toward the small ones, so the
    anchor must be the source nothing can be downsampled below.
    Normalizing to min (not to the cross-source sum) is also what keeps
    the arithmetic engine-exact: n_i and n_min are exact integer token
    sums (order-free aggregates), so the only float ops are one divide
    and one pow per SOURCE — no cross-source float summation whose fold
    order could differ between engines or runs. τ=1 keeps everything;
    τ→0 equalizes expected kept tokens across sources (every source cut
    to the smallest's size).

    Plan: one token-count aggregate to |sources| rows, a window max over
    that tiny frame, then a broadcast join back and the usual codegen'd
    salted-md5 threshold predicate (hash_sample's determinism contract:
    the keep decision depends only on the row key, the source totals, τ,
    and the salt — stable under repartitioning, re-runs, and engines).
    → (doc_id, source, keep_fraction9) for the survivors."""
    from .text import token_count

    counts = docs.groupBy(F.col(source_col).alias("_src")).agg(
        F.sum(token_count(text_col)).alias("_n")
    )
    n_min = F.min("_n").over(Window.partitionBy())
    frac = F.round(
        F.least(
            F.lit(1.0),
            F.pow(F.col("_n").cast("double") / n_min, F.lit(float(tau) - 1.0)),
        ),
        9,
    )
    fracs = counts.select(
        "_src",
        frac.alias("keep_fraction9"),
        F.floor(frac * F.lit(HASH_SPACE)).cast("long").alias("_threshold"),
    )
    return (
        docs.join(
            F.broadcast(fracs), docs[source_col] == fracs["_src"], "inner"
        )
        .filter(_bucket(F.col(key_col), salt) < F.col("_threshold"))
        .select(F.col(key_col), F.col(source_col), F.col("keep_fraction9"))
    )


def training_order(
    df: DataFrame,
    seed: str = "epoch-0",
    n_shards: int = 8,
    key_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Reproducible global TRAINING-ORDER shuffle → (id, global_pos,
    shard, pos_in_shard): the final stage of a pretraining data pipeline
    — the order documents are read during training, fixed by (corpus,
    seed) alone so a re-run, a backfill, or a different cluster reads
    byte-identical batches. A new ``seed`` is a fresh epoch permutation.

    The permutation is the rank of each row's FULL 128-bit salted md5
    (content-stable, no RNG state), totally ordered by the (hex, id)
    tiebreak. r10 widening (advisor note): ranking by the 32-bit
    `hash_sample` bucket alone meant birthday collisions past ~10⁹ docs
    produced id-ascending runs inside equal-bucket groups — the shuffle
    degraded toward insertion order at trillion-doc scale. Ordering by
    the full lowercase hex string (fixed length ⇒ lexicographic ==
    numeric on the 128-bit value) pushes collisions past any corpus
    size; the 32-bit prefix survives as the NUMERIC range-bucketing
    value (order by (prefix, hex, id) == (hex, id) since the prefix is
    a monotone function of the hex). The rank is the TWO-PHASE
    DISTRIBUTED row_number (`operators/rank.py`): hash values are
    uniform by construction, so the range buckets are perfectly
    balanced and no task ever sorts more than corpus/n_buckets rows —
    the naive `row_number() OVER (ORDER BY hash)` single-partition
    window (which the DuckDB twin deliberately runs; equality IS the
    contract) funnels the whole corpus through one task.

    Shards are ROUND-ROBIN in shuffle order (shard = pos % n_shards,
    pos_in_shard = pos DIV n_shards): each shard is itself a uniform
    pseudo-random subsample with interleaved sources — a prefix of any
    shard is unbiased, which block-contiguous sharding does not give."""
    keyed = df.select(
        F.col(key_col).alias("id"),
        F.md5(
            F.concat(F.col(key_col).cast("string"), F.lit(seed))
        ).alias("__hx"),
    ).select(
        "id",
        "__hx",
        # numeric prefix for range bucketing only (approxQuantile needs a
        # numeric column); the full-hex tiebreak carries the ordering
        F.conv(F.substring("__hx", 1, 8), 16, 10).cast("long").alias("__sk"),
    )
    from ..operators.rank import distributed_row_number

    ranked = distributed_row_number(
        keyed,
        partition_by=[],
        value_col="__sk",
        tiebreak_cols=["__hx", "id"],
        n_buckets=n_buckets,
        out_col="__rn",
    )
    gp = (F.col("__rn") - 1).cast("long")
    # integer DIV, not floor(double /): the double quotient loses integer
    # precision past 2^53 positions, and the DuckDB twin's `//` is exact —
    # byte-identical cross-engine order is the operator's whole contract
    n = int(n_shards)
    return ranked.select(
        "id", gp.alias("global_pos")
    ).select(
        "id",
        "global_pos",
        (F.col("global_pos") % n).cast("long").alias("shard"),
        F.expr(f"CAST(global_pos DIV {n} AS BIGINT)").alias("pos_in_shard"),
    )


def unimax_plan(
    docs: DataFrame,
    epoch_cap: int,
    budget_num: int,
    budget_den: int = 1,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling" — the epoch-capped waterfilling
    mixture): given a total token budget B and a per-source epoch cap
    c, visit sources smallest-first; each takes min(c·nᵢ, u) where u is
    the uniform share of the remaining budget over the remaining
    sources. Small sources are CAPPED at c epochs (fairness: never
    over-repeat a small language/source); what they cannot absorb
    waterfalls to the large ones, which split the remainder evenly.

    → one row per source: (source, n_tokens, cap_tokens,
    allocated_tokens, is_capped, epochs9), allocation exact integers.

    Closed form instead of the paper's sequential loop: once a source
    is UNcapped, the uniform share u stays constant for every later
    (larger) source — allocating u from R over m sources leaves
    u·(m−1) — so capped sources form a PREFIX of the size-sorted order.
    The boundary k is the first i failing c·nᵢ·(N−i+1) ≤ B − Σ_{j<i}
    c·nⱼ, and every test is BIGINT arithmetic (the budget enters as the
    rational budget_num/budget_den of the corpus total: B =
    (total·num) div den — no float touches an allocation; the only
    float is the reported epochs9 ratio, one divide of two exact ints,
    the round-9 contract). Window functions over the |sources|-row
    aggregate — dims-sized single-partition frames, the
    temperature_resample precedent; the corpus pays exactly one
    map-side-combined token-count aggregate.

    Reference parity: the zipkin reference has no mixture planner
    (SURVEY §6 extension surface). Degenerate cases are well-defined:
    B ≥ c·total caps every source (k never fires); a budget too small
    for even the smallest cap makes EVERY source uncapped and u = B
    div N (floor division keeps Σ allocated ≤ B)."""
    from .text import token_count

    c = int(epoch_cap)
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(text_col)).cast("long").alias("n_tokens")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("n_tokens", "source")
    w_pref = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    cap = (F.col("n_tokens") * c).alias("cap_tokens")
    staged = counts.select(
        "source",
        "n_tokens",
        cap,
        F.row_number().over(w_ord).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("_n_src"),
        F.sum(F.col("n_tokens") * c).over(w_all).alias("_cap_total"),
        F.coalesce(
            F.sum(F.col("n_tokens") * c).over(w_pref), F.lit(0)
        ).alias("_pref"),
        F.expr(
            f"(sum(n_tokens) OVER () * {int(budget_num)})"
            f" DIV {int(budget_den)}"
        ).alias("_budget"),
    )
    fail = (
        F.col("cap_tokens") * (F.col("_n_src") - F.col("_rk") + 1)
        > F.col("_budget") - F.col("_pref")
    )
    staged = staged.withColumn(
        "_k",
        F.min(F.when(fail, F.col("_rk"))).over(w_all),
    ).withColumn(
        "_pref_k",
        F.max(
            F.when(F.col("_rk") == F.col("_k"), F.col("_pref"))
        ).over(w_all),
    )
    uniform = F.expr("(_budget - _pref_k) DIV (_n_src - _k + 1)")
    is_capped = F.col("_k").isNull() | (F.col("_rk") < F.col("_k"))
    alloc = F.when(is_capped, F.col("cap_tokens")).otherwise(uniform)
    return staged.select(
        "source",
        "n_tokens",
        "cap_tokens",
        alloc.cast("long").alias("allocated_tokens"),
        is_capped.alias("is_capped"),
        F.round(
            alloc.cast("double") / F.col("n_tokens").cast("double"), 9
        ).alias("epochs9"),
    )
