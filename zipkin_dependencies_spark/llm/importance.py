"""DSIR-style data-selection importance weights — hashed-bigram
log-likelihood ratio of a TARGET domain against the rest of the corpus
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method). The pretraining-curation step that ranks a
100 TB crawl by "how much does this document look like the high-quality
target" without training anything: two hashed n-gram count profiles and
one broadcast join.

Determinism engineering (the house recipe):
- features are hashed bigrams — the md5-low-32 digest both engines
  already share (``('0x'||substring(md5(s),1,8))::BIGINT`` ≡
  ``F.conv(F.substring(F.md5(s),1,8),16,10)``) modulo ``n_buckets``;
- the per-bucket weight is ONE ln of a ratio of exact integer products
  (add-1 smoothing), quantized to round(ln·1e9) as BIGINT before any
  per-document sum — integer sums are fold-order-free, so scores are
  bit-stable across engines and partitionings (same scheme as
  ``bigram_surprisal``);
- per-document totals divide and round(6) only at the very end.

Scale (100 TB): the corpus collapses to (doc_id, bucket) rows inside the
scan stage (text never shuffles); the two count profiles are map-side
combined aggregates at BUCKET cardinality (n_buckets rows — KBs); the
weight table broadcasts; the only data-sized exchange is the final
per-document sum, keyed by doc_id. The target/rest split is a predicate
on a column, not a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dsir_importance(
    docs: DataFrame,
    target_source: str,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """→ (doc_id, source, n_bigrams, importance6, avg_importance6): the
    summed (and per-bigram mean) hashed-bigram log-likelihood ratio of
    ``target_source`` docs vs everything else. Positive = looks like the
    target domain. Docs with < 2 tokens stay in the output at 0.0."""
    from .text import tokens

    pairs_expr = F.when(
        F.size(F.col("_toks")) >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1), "
            "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    dig = F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("bigint")
    occ = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            tokens(text_col).alias("_toks"),
        )
        .select("doc_id", "source", F.explode(pairs_expr).alias("bg"))
        .select(
            "doc_id",
            "source",
            F.pmod(dig, F.lit(n_buckets)).alias("bucket"),
        )
        .localCheckpoint(eager=True)  # feeds profiles AND scoring join
    )
    is_t = F.col("source") == target_source
    prof = occ.groupBy("bucket").agg(
        F.sum(is_t.cast("long")).alias("ct"),
        F.sum((~is_t).cast("long")).alias("cs"),
    )
    tot = occ.agg(
        F.sum(is_t.cast("long")).alias("T"),
        F.sum((~is_t).cast("long")).alias("S"),
    ).collect()[0]
    T, S = int(tot["T"] or 0), int(tot["S"] or 0)
    # one ln of exact integer products (add-1 smoothed), quantized — the
    # single-rounding form both engines reproduce bit-for-bit
    q9 = F.round(
        F.log(
            ((F.col("ct") + 1) * F.lit(S + n_buckets))
            / ((F.col("cs") + 1) * F.lit(T + n_buckets)).cast("double")
        )
        * 1_000_000_000
    ).cast("long")
    weights = prof.select("bucket", q9.alias("q9"))
    scored = (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("q9").alias("sq9"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
        .join(scored, "doc_id", "left_outer")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.coalesce(F.col("sq9"), F.lit(0)) / 1e9, 6).alias(
                "importance6"
            ),
            F.when(F.col("n_bigrams").isNull(), F.lit(0.0))
            .otherwise(
                F.round((F.col("sq9") / F.col("n_bigrams")) / 1e9, 6)
            )
            .alias("avg_importance6"),
        )
    )


def dsir_importance_sql(
    target_source: str, n_buckets: int = 4096
) -> str:
    """DuckDB twin: identical tokenization, digest, smoothing, and
    integer-quantized ln weights over the ``documents`` view."""
    from .oracles import TEXT_TOKENS

    return f"""
WITH toked AS (SELECT doc_id, source, {TEXT_TOKENS} AS t FROM documents),
occ AS (
  SELECT doc_id, source,
         ('0x' || substring(md5(u.bg), 1, 8))::BIGINT % {n_buckets} AS bucket
  FROM toked,
       unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])) AS u(bg)
),
prof AS (
  SELECT bucket,
         CAST(sum(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END)
              AS BIGINT) AS ct,
         CAST(sum(CASE WHEN source = '{target_source}' THEN 0 ELSE 1 END)
              AS BIGINT) AS cs
  FROM occ GROUP BY bucket
),
tot AS (
  SELECT CAST(sum(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END)
              AS BIGINT) AS T,
         CAST(sum(CASE WHEN source = '{target_source}' THEN 0 ELSE 1 END)
              AS BIGINT) AS S
  FROM occ
),
weights AS (
  SELECT bucket,
         CAST(round(ln(((ct + 1) * (S + {n_buckets}))
                       / CAST((cs + 1) * (T + {n_buckets}) AS DOUBLE))
                    * 1000000000) AS BIGINT) AS q9
  FROM prof, tot
),
scored AS (
  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(w.q9) AS BIGINT) AS sq9
  FROM occ o JOIN weights w USING (bucket)
  GROUP BY o.doc_id
)
SELECT d.doc_id, d.source,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       round(COALESCE(s.sq9, 0) / 1e9, 6) AS importance6,
       CASE WHEN s.n_bigrams IS NULL THEN 0.0
            ELSE round((s.sq9 / CAST(s.n_bigrams AS DOUBLE)) / 1e9, 6)
       END AS avg_importance6
FROM documents d LEFT JOIN scored s USING (doc_id)
"""
