"""Deterministic sketch operators — HyperLogLog distinct counting,
Count-Min heavy-hitter estimation, and Efraimidis-Spirakis weighted
sampling (all public algorithms: Flajolet et al. 2007 "HyperLogLog";
Cormode & Muthukrishnan 2005 "An improved data stream summary";
Efraimidis & Spirakis 2006 "Weighted random sampling with a
reservoir").

Sketches ARE the 100 TB story: a fixed-size, MERGEABLE state per group
(m registers / d×w counters / k reservoir keys) that map-side combines
and never grows with the data — the tool a pipeline reaches for when
exact distinct/top-k state would be data-sized. Spark's own
approx_count_distinct is the same HLL idea but its output is not
engine-reproducible; these variants pin the hash function (md5, the
repo-wide oracle digest) and quantize every float through ONE
rounding, so a DuckDB twin replays the sketch bit-for-bit and the
value-hash gate can hold the ESTIMATES, not just row counts.

Determinism engineering (the house recipe):
- all hashes are md5 slices (the `('0x'||substring(md5(s),1,k))::BIGINT`
  ≡ `F.conv(F.substring(F.md5(s),1,k),16,10)` equivalence both engines
  share); the HLL register split uses a 60-bit slice so the value fits
  signed-64 in both engines without wrap;
- HLL's Σ 2^(-M_j) harmonic sum is computed as an INTEGER sum of
  2^(51-M_j) (every term exact, fold-order-free) and the α·m²·2^51
  numerator is pre-folded into ONE Python double literal embedded in
  both engines — the estimate is a single double division (+ a single
  ln on the linear-counting branch), then round(4);
- Count-Min is pure integers end to end;
- the E-S sampler's key is the quantized-ln form round(−ln(u)/w · 1e9)
  (one division, one ln, one rounding), ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HLL_SLICE_BITS = 60  # md5 hex chars 1..15 — fits signed 64 both engines
_HLL_LOW_BITS = 50  # low bits used for the rho (leading-zeros) field


def _digest60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def _digest32(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def _hll_numerator(m: int) -> float:
    """α_m · m² · 2^51 pre-folded to one double — BOTH engines embed this
    exact literal so the estimate is a single division away from the
    integer register sum (no cross-engine float-fold ambiguity)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (_HLL_LOW_BITS + 1))


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """→ (group, n_exact, hll_est4, err_pct2): per-group HyperLogLog
    distinct-count estimate next to the exact count — the eval-harness
    shape (like ann_recall): the gate pins the sketch's arithmetic AND
    the row shows its accuracy.

    Register assignment: a 60-bit md5 slice splits into a p-bit register
    index (top bits) and a 50-bit rho field; rho = leading zeros + 1 via
    binary-string length (``bin`` / ``format('{:b}')`` — identical
    minimal-binary semantics in both engines, no float log2 at power-of-
    two boundaries). Registers aggregate as max(rho) — the mergeable
    state — then the harmonic mean is an exact integer sum of
    2^(51-M_j); the only doubles are one division (+ one ln on the
    linear-counting small-range branch) and one round(4).

    Scale (100 TB): the shuffle carries (group, register) pairs — at
    most m=2^p rows per group whatever the data volume; max() is
    map-side combined. This is the distributed distinct counter whose
    state merges across executors, days, and streams."""
    m = 1 << p
    num = _hll_numerator(m)
    low_mask = (1 << _HLL_LOW_BITS) - 1
    h = _digest60(F.col(value_col).cast("string"))
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            F.shiftright(h, _HLL_LOW_BITS).alias("idx"),
            (h.bitwiseAND(F.lit(low_mask))).alias("low"),
        )
        .withColumn(
            "rho",
            F.when(F.col("low") == 0, F.lit(_HLL_LOW_BITS + 1)).otherwise(
                F.lit(_HLL_LOW_BITS + 1) - F.length(F.expr("bin(low)"))
            ),
        )
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("M"))
    )
    sums = regs.groupBy("grp").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_LOW_BITS + 1} - M)")
        ).alias("s_obs"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    v = F.lit(m) - F.col("n_obs")
    s_total = F.col("s_obs") + v * F.lit(1 << (_HLL_LOW_BITS + 1))
    e_raw = F.lit(num) / s_total
    e_lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), e_lc).otherwise(e_raw)
    return (
        exact.join(sums, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            F.round(est, 4).alias("hll_est4"),
            F.round(
                (F.round(est, 4) - F.col("n_exact")) * 100.0 / F.col("n_exact"), 2
            ).alias("err_pct2"),
        )
    )


def hll_distinct_sql(
    table: str, group_col: str, value_col: str, p: int = 10
) -> str:
    """DuckDB twin of ``hll_distinct`` — identical register split,
    integer harmonic sum, single-division estimate."""
    m = 1 << p
    num = repr(_hll_numerator(m))
    lb = _HLL_LOW_BITS
    low_mask = (1 << lb) - 1
    return f"""
WITH h AS (
  SELECT {group_col} AS grp,
         ('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM {table}
),
regs AS (
  SELECT grp, hv >> {lb} AS idx,
         max(CASE WHEN (hv & {low_mask}) = 0 THEN {lb + 1}
                  ELSE {lb + 1} - length(format('{{:b}}', hv & {low_mask}))
             END) AS M
  FROM h GROUP BY grp, idx
),
sums AS (
  SELECT grp,
         CAST(sum(1::BIGINT << ({lb + 1} - M)) AS BIGINT) AS s_obs,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM regs GROUP BY grp
),
exact AS (
  SELECT {group_col} AS grp, CAST(count(DISTINCT {value_col}) AS BIGINT) AS n_exact
  FROM {table} GROUP BY 1
),
est AS (
  SELECT e.grp, e.n_exact,
         CASE WHEN ({num} / (s.s_obs + ({m} - s.n_obs) * (1::BIGINT << {lb + 1})))
                   <= {2.5 * m}
               AND ({m} - s.n_obs) > 0
              THEN {float(m)!r} * ln({float(m)!r} / ({m} - s.n_obs))
              ELSE {num} / (s.s_obs + ({m} - s.n_obs) * (1::BIGINT << {lb + 1}))
         END AS e
  FROM exact e JOIN sums s USING (grp)
)
SELECT grp AS {group_col}, n_exact,
       round(e, 4) AS hll_est4,
       round((round(e, 4) - n_exact) * 100.0 / n_exact, 2) AS err_pct2
FROM est
"""


def hll_merge_audit(
    df: DataFrame,
    day_col: Column,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """→ one row (n_days, n_exact, hll_direct4, hll_merged4,
    merge_lossless): the HLL MERGEABILITY property demonstrated in data —
    per-day register tables (the state an incremental daily rollup
    persists) max-merged across days yield the IDENTICAL registers, and
    therefore the identical estimate, as a direct scan of the whole
    range. ``merge_lossless`` must always be true: max is associative
    and commutative, so max over (day, register) then over register
    equals max over register.

    This is WHY a 100 TB pipeline keeps HLL state instead of raw ids:
    yesterday's registers never need re-scanning — today's merge is
    m-row max() per group, and the same property extends across
    executors, partitions, and streaming micro-batches."""
    m = 1 << p
    num = _hll_numerator(m)
    low_mask = (1 << _HLL_LOW_BITS) - 1
    h = _digest60(F.col(value_col).cast("string"))
    rho = F.when(F.col("low") == 0, F.lit(_HLL_LOW_BITS + 1)).otherwise(
        F.lit(_HLL_LOW_BITS + 1) - F.length(F.expr("bin(low)"))
    )
    base = df.select(
        day_col.alias("day"),
        F.shiftright(h, _HLL_LOW_BITS).alias("idx"),
        (h.bitwiseAND(F.lit(low_mask))).alias("low"),
    ).withColumn("rho", rho)
    daily = base.groupBy("day", "idx").agg(F.max("rho").alias("M"))
    merged = daily.groupBy("idx").agg(F.max("M").alias("M"))
    direct = base.groupBy("idx").agg(F.max("rho").alias("M"))

    def estimate(regs: DataFrame, out: str) -> DataFrame:
        sums = regs.agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_LOW_BITS + 1} - M)")
            ).alias("s_obs"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        v = F.lit(m) - F.col("n_obs")
        s_total = F.col("s_obs") + v * F.lit(1 << (_HLL_LOW_BITS + 1))
        e_raw = F.lit(num) / s_total
        e_lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
        est = F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), e_lc).otherwise(e_raw)
        return sums.select(F.round(est, 4).alias(out))

    exact = df.agg(
        F.countDistinct(day_col).alias("n_days"),
        F.countDistinct(value_col).alias("n_exact"),
    )
    return (
        exact.crossJoin(estimate(direct, "hll_direct4"))
        .crossJoin(estimate(merged, "hll_merged4"))
        .select(
            "n_days",
            "n_exact",
            "hll_direct4",
            "hll_merged4",
            (F.col("hll_direct4") == F.col("hll_merged4")).alias(
                "merge_lossless"
            ),
        )
    )


def hll_merge_audit_sql(
    table: str, day_expr: str, value_col: str, p: int = 10
) -> str:
    """DuckDB twin of ``hll_merge_audit``."""
    m = 1 << p
    num = repr(_hll_numerator(m))
    lb = _HLL_LOW_BITS
    low_mask = (1 << lb) - 1
    est = (
        lambda regs: f"""(
  SELECT CASE WHEN ({num} / (s_obs + ({m} - n_obs) * (1::BIGINT << {lb + 1})))
                   <= {2.5 * m}
               AND ({m} - n_obs) > 0
              THEN round({float(m)!r} * ln({float(m)!r} / ({m} - n_obs)), 4)
              ELSE round({num} / (s_obs + ({m} - n_obs) * (1::BIGINT << {lb + 1})), 4)
         END
  FROM (SELECT CAST(sum(1::BIGINT << ({lb + 1} - M)) AS BIGINT) AS s_obs,
               CAST(count(*) AS BIGINT) AS n_obs
        FROM {regs})
)"""
    )
    return f"""
WITH base AS (
  SELECT {day_expr} AS day,
         ('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM {table}
),
rows_ AS (
  SELECT day, hv >> {lb} AS idx,
         CASE WHEN (hv & {low_mask}) = 0 THEN {lb + 1}
              ELSE {lb + 1} - length(format('{{:b}}', hv & {low_mask}))
         END AS rho
  FROM base
),
daily AS (SELECT day, idx, max(rho) AS M FROM rows_ GROUP BY day, idx),
merged AS (SELECT idx, max(M) AS M FROM daily GROUP BY idx),
direct AS (SELECT idx, max(rho) AS M FROM rows_ GROUP BY idx)
SELECT
  (SELECT CAST(count(DISTINCT {day_expr}) AS BIGINT) FROM {table}) AS n_days,
  (SELECT CAST(count(DISTINCT {value_col}) AS BIGINT) FROM {table}) AS n_exact,
  {est('direct')} AS hll_direct4,
  {est('merged')} AS hll_merged4,
  {est('direct')} = {est('merged')} AS merge_lossless
"""


def cms_topk_counts(
    docs: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """→ (token, n_exact, cms_n, overcount): Count-Min-sketch token-count
    estimates for the corpus's exact top-``k`` tokens, next to the exact
    counts (the eval-harness shape — the gate pins the sketch cells AND
    the row shows CM's one-sided error: overcount ≥ 0 always, the
    sketch's provable contract).

    The sketch is ``depth`` independent md5-salted hash rows of
    ``width`` counters; a token's estimate is the MIN over its d cells.
    All integers — bit-exact cross-engine for free.

    Scale (100 TB): the sketch cells aggregate straight off the token
    occurrences with BOUNDED keys — every partition's partial hash agg
    holds at most d·w = 4096 cells, so the cell shuffle is KBs whatever
    the corpus or vocabulary (this is the property that makes the
    sketch worth keeping; an aggregate keyed by token would shuffle the
    vocabulary). The exact top-k pays the vocabulary-cardinality
    aggregate once — it exists only because this is the eval harness; a
    production pipeline keeps the 4096-cell state and drops the exact
    side. Measured (SCALING.md): deriving both from a materialized
    (token, n) frequency table is 2.7× SLOWER at sf10 — the derived
    fixtures' vocabulary grows with the corpus, so the freq
    materialization is data-sized while the occurrence agg stays
    cell-bounded. Cells are sum-mergeable across days/streams."""
    from .text import tokens

    toks = docs.select(F.explode(tokens(text_col)).alias("token"))

    def cell_idx(row: int, tok: Column) -> Column:
        return F.pmod(
            _digest32(F.concat_ws("|", F.lit(str(row)), tok)), F.lit(width)
        )

    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    cell_idx(r, F.col("token")).alias("idx"),
                )
                for r in range(depth)
            ]
        )
    )
    cells = (
        toks.select(rows.alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.idx").alias("idx"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topk = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("token"))
        .limit(k)
    )
    probes = topk.select(
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cell_idx(r, F.col("token")).alias("idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("token", "n_exact", F.col("rc.r").alias("r"), F.col("rc.idx").alias("idx"))
    return (
        probes.join(F.broadcast(cells), ["r", "idx"])
        .groupBy("token", "n_exact")
        .agg(F.min("c").alias("cms_n"))
        .select(
            "token",
            "n_exact",
            "cms_n",
            (F.col("cms_n") - F.col("n_exact")).alias("overcount"),
        )
    )


def cms_topk_sql(
    k: int = 20, depth: int = 4, width: int = 1024
) -> str:
    """DuckDB twin of ``cms_topk_counts`` over the ``documents`` view."""
    from .oracles import TEXT_TOKENS

    idx = (
        lambda r, tok: f"(('0x' || substring(md5('{r}' || '|' || {tok}), 1, 8))"
        f"::BIGINT % {width})"
    )
    probe_rows = "\n    UNION ALL\n".join(
        f"  SELECT token, n_exact, {r} AS r, {idx(r, 'token')} AS idx FROM topk"
        for r in range(depth)
    )
    cell_rows = "\n    UNION ALL\n".join(
        f"  SELECT {r} AS r, {idx(r, 'token')} AS idx, n_exact AS n FROM freq"
        for r in range(depth)
    )
    return f"""
WITH freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n_exact
  FROM (SELECT unnest({TEXT_TOKENS}) AS token FROM documents)
  GROUP BY token
),
cells AS (
  SELECT r, idx, CAST(sum(n) AS BIGINT) AS c FROM (
{cell_rows}
  ) GROUP BY r, idx
),
topk AS (
  SELECT token, n_exact FROM freq
  ORDER BY n_exact DESC, token ASC LIMIT {k}
),
probes AS (
{probe_rows}
)
SELECT p.token, p.n_exact,
       CAST(min(c.c) AS BIGINT) AS cms_n,
       CAST(min(c.c) - p.n_exact AS BIGINT) AS overcount
FROM probes p JOIN cells c USING (r, idx)
GROUP BY p.token, p.n_exact
"""


def theta_intersections(
    df: DataFrame,
    set_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """→ (set_a, set_b, n_exact, theta_est4, err_pct2) for every set
    pair: estimated distinct-value INTERSECTION via KMV/theta sketches
    (Beyer et al. 2007 "On synopses for distinct-value estimation";
    the DataSketches Theta family) next to the exact intersection — the
    eval-harness shape. This is the set-expression capability HLL lacks:
    HLL registers union cleanly but cannot intersect; theta sketches
    keep the k smallest hash SAMPLES, and samples intersect.

    Deterministic variant, integer thresholds end to end: per set, keep
    the k smallest distinct 60-bit md5 values. Saturated sets get
    θ = the k-th smallest hash (an INTEGER — no float rank boundary to
    disagree on) and retain the k−1 below it; small sets get θ = 2^60
    and retain everything (exact mode). A pair's estimate is
    |R_a ∩ R_b below min(θ_a, θ_b)| · 2^60 / min(θ_a, θ_b) — the count
    and θ are exact integers, the estimate is one double multiply +
    one divide + round(4), identical in both engines; exact-mode pairs
    divide by 2^60 and return the true count.

    Scale (100 TB): the per-set rank uses the two-phase distributed
    row_number (bounded per-task sorts — never a data-sized single
    window); retained sketches are ≤ k rows per set, so every pairwise
    intersection joins KB-sized sketch tables. The exact side exists
    only for the eval column."""
    from ..operators.rank import distributed_row_number

    full = 1 << _HLL_SLICE_BITS
    distinct = (
        df.select(
            F.col(set_col).alias("s"),
            _digest60(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds rank, theta, and exact
    )
    ranked = distributed_row_number(
        distinct, partition_by=["s"], value_col="h", tiebreak_cols=[],
        out_col="rk",
    )
    theta = ranked.groupBy("s").agg(
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "s",
        F.when(F.col("n") >= k, F.col("kth"))
        .otherwise(F.lit(full))
        .alias("theta"),
    )
    retained = ranked.join(theta, "s").filter(
        F.col("h") < F.col("theta")
    ).select("s", "h", "theta")
    pairs = (
        retained.alias("a")
        .join(
            retained.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.s") < F.col("b.s")),
        )
        .select(
            F.col("a.s").alias("set_a"),
            F.col("b.s").alias("set_b"),
            F.col("a.h").alias("h"),
            F.least("a.theta", "b.theta").alias("th"),
        )
        .filter(F.col("h") < F.col("th"))
        .groupBy("set_a", "set_b", "th")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        distinct.alias("a")
        .join(
            distinct.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("set_a"), F.col("b.s").alias("set_b"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = F.round(
        F.col("cnt").cast("double") * F.lit(float(full)) / F.col("th").cast("double"),
        4,
    )
    return (
        exact.join(pairs, ["set_a", "set_b"], "left_outer")
        .select(
            "set_a",
            "set_b",
            "n_exact",
            F.coalesce(est, F.lit(0.0)).alias("theta_est4"),
            F.round(
                (F.coalesce(est, F.lit(0.0)) - F.col("n_exact"))
                * 100.0
                / F.col("n_exact"),
                2,
            ).alias("err_pct2"),
        )
    )


def theta_intersections_sql(
    table: str, set_col: str, value_col: str, k: int = 256
) -> str:
    """DuckDB twin of ``theta_intersections`` — identical integer
    thresholds, retained samples, and single-rounded estimates."""
    full = 1 << _HLL_SLICE_BITS
    return f"""
WITH distinct_ AS (
  SELECT DISTINCT {set_col} AS s,
         ('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}
),
ranked AS (
  SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rk
  FROM distinct_
),
theta AS (
  SELECT s,
         CASE WHEN count(*) >= {k}
              THEN max(CASE WHEN rk = {k} THEN h END)
              ELSE {full} END AS theta
  FROM ranked GROUP BY s
),
retained AS (
  SELECT r.s, r.h, t.theta
  FROM ranked r JOIN theta t USING (s)
  WHERE r.h < t.theta
),
pairs AS (
  SELECT a.s AS set_a, b.s AS set_b,
         LEAST(a.theta, b.theta) AS th,
         CAST(count(*) AS BIGINT) AS cnt
  FROM retained a JOIN retained b
    ON a.h = b.h AND a.s < b.s AND a.h < LEAST(a.theta, b.theta)
  GROUP BY 1, 2, 3
),
exact AS (
  SELECT a.s AS set_a, b.s AS set_b, CAST(count(*) AS BIGINT) AS n_exact
  FROM distinct_ a JOIN distinct_ b ON a.h = b.h AND a.s < b.s
  GROUP BY 1, 2
)
SELECT e.set_a, e.set_b, e.n_exact,
       COALESCE(round(CAST(p.cnt AS DOUBLE) * {float(full)!r}
                      / CAST(p.th AS DOUBLE), 4), 0.0) AS theta_est4,
       round((COALESCE(round(CAST(p.cnt AS DOUBLE) * {float(full)!r}
                             / CAST(p.th AS DOUBLE), 4), 0.0) - e.n_exact)
             * 100.0 / e.n_exact, 2) AS err_pct2
FROM exact e LEFT JOIN pairs p USING (set_a, set_b)
"""


def kmv_quantile_sketch(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    k: int = 128,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """→ (group, n, p{q}_exact_q6, p{q}_est_q6, ...): per-group
    quantile ESTIMATES from a deterministic bottom-k (KMV) uniform
    sample, next to the exact quantiles (both as the 1e6-quantized
    integers — zero float ops after the scan-side quantization) — the
    eval-harness shape. This completes the
    sketch family: HLL answers distinct, Count-Min answers frequency,
    theta answers set intersection, and the KMV sample answers
    QUANTILES — the same k-minimum-hash state, read as a uniform sample
    instead of a cardinality synopsis (Beyer et al. 2007's duality).

    The sample is the k rows with the smallest md5(id) per group —
    deterministic in row content (backfills reproduce it), mergeable
    (the bottom-k of a union is the bottom-k of the per-part bottom-k
    lists — the same property theta exploits). Quantiles are
    nearest-rank (SQL-standard ``percentile_disc``: smallest value whose
    cume_dist ≥ q) over integer-quantized values — no interpolation
    arithmetic to disagree on, both engines return the identical
    integer cell (verified: Spark's WITHIN GROUP percentile_disc ≡
    DuckDB quantile_disc on integers).

    Scale (100 TB): the rank uses the two-phase distributed row_number
    (bounded per-task sorts); the retained sample is ≤ k rows per group,
    so estimate-side state is KBs whatever the data volume. The exact
    side (a sort-buffered percentile_disc per group) exists only as the
    eval column — a production pipeline keeps the k-row sample and
    drops it."""
    from ..operators.rank import distributed_row_number

    vq = F.round(F.col(value_col) * 1e6).cast("bigint")
    base = df.select(
        F.col(group_col).alias("grp"),
        _digest60(F.col(id_col).cast("string")).alias("h"),
        vq.alias("vq"),
    ).localCheckpoint(eager=True)  # feeds both the rank and the exact side
    sample = distributed_row_number(
        base, partition_by=["grp"], value_col="h", tiebreak_cols=[],
        out_col="rk",
    ).filter(F.col("rk") <= k)

    def disc(q: float) -> Column:
        return F.expr(f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY vq)")

    # quantiles emit as the quantized integers themselves (micro-units,
    # suffix _q6) — zero float ops after the scan-side quantization, so
    # there is no decimal-rounding boundary for engines to disagree on
    exact = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            disc(q).cast("bigint").alias(f"p{int(q * 100)}_exact_q6")
            for q in qs
        ],
    )
    est = sample.groupBy("grp").agg(
        *[
            disc(q).cast("bigint").alias(f"p{int(q * 100)}_est_q6")
            for q in qs
        ],
    )
    cols = ["n"]
    for q in qs:
        cols += [f"p{int(q * 100)}_exact_q6", f"p{int(q * 100)}_est_q6"]
    return (
        exact.join(est, "grp")
        .select(F.col("grp").alias(group_col), *cols)
    )


def kmv_quantile_sketch_sql(
    table: str,
    group_col: str,
    id_col: str,
    value_col: str,
    k: int = 128,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of ``kmv_quantile_sketch`` — identical bottom-k
    selection (same md5 slice, same rank) and nearest-rank quantiles."""
    exact_cols = ",\n         ".join(
        f"CAST(quantile_disc(vq, {q!r}) AS BIGINT)"
        f" AS p{int(q * 100)}_exact_q6"
        for q in qs
    )
    est_cols = ",\n         ".join(
        f"CAST(quantile_disc(vq, {q!r}) AS BIGINT)"
        f" AS p{int(q * 100)}_est_q6"
        for q in qs
    )
    out_cols = ", ".join(
        f"p{int(q * 100)}_exact_q6, p{int(q * 100)}_est_q6" for q in qs
    )
    return f"""
WITH base AS (
  SELECT {group_col} AS grp,
         ('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT AS h,
         CAST(round({value_col} * 1e6) AS BIGINT) AS vq
  FROM {table}
),
sample_ AS (
  SELECT grp, vq
  FROM (SELECT grp, vq, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
        FROM base)
  WHERE rk <= {k}
),
exact AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         {exact_cols}
  FROM base GROUP BY grp
),
est AS (
  SELECT grp,
         {est_cols}
  FROM sample_ GROUP BY grp
)
SELECT e.grp AS {group_col}, e.n, {out_cols}
FROM exact e JOIN est USING (grp)
"""


def es_weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """→ k rows (id, *extra, w, key_q9): Efraimidis-Spirakis weighted
    sampling without replacement — select k items with probability
    proportional to weight, DETERMINISTICALLY (u comes from the id's md5,
    not a RNG): rank every item by −ln(u)/w ascending (the A-ES key;
    equivalent to max u^(1/w)) and keep the k smallest. The key is
    integer-quantized (round(·1e9), the house ln recipe) with an id
    tie-break, so both engines select the identical set.

    Zero/negative weights are excluded (they have probability 0 in the
    E-S scheme; ln is undefined at w ≤ 0 anyway).

    Scale (100 TB): ONE pass — each partition keeps its local k smallest
    keys (Spark compiles orderBy+limit to TakeOrderedAndProject), the
    driver merges partitions·k candidate rows. No global sort, no
    data-sized shuffle; this is THE distributed weighted sampler for
    corpus subsampling where df.sample can't do weights and isn't
    reproducible across repartitions."""
    u = (_digest32(F.col(id_col).cast("string")) + 1) / F.lit(4294967296.0)
    key = F.round(-F.log(u) / F.col(weight_col) * 1e9).cast("bigint")
    return (
        docs.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            *extra_cols,
            F.col(weight_col).alias("w"),
            key.alias("key_q9"),
        )
        .orderBy(F.asc("key_q9"), F.asc(id_col))
        .limit(k)
    )


def es_weighted_sample_sql(
    table: str,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> str:
    """DuckDB twin of ``es_weighted_sample``."""
    extras = "".join(f", {c}" for c in extra_cols)
    return f"""
SELECT {id_col}{extras}, {weight_col} AS w,
       CAST(round(-ln((('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT + 1)
                      / 4294967296.0)
                  / {weight_col} * 1e9) AS BIGINT) AS key_q9
FROM {table}
WHERE {weight_col} > 0
ORDER BY key_q9 ASC, {id_col} ASC
LIMIT {k}
"""
