"""BM25 keyword retrieval over the documents table — the sparse-lexical
complement to the embedding ANN family (extension operator; together they
are the two halves of standard hybrid search).

BM25(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b + b·dl/avgdl))
with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene/“plus-one” form,
always positive).

Determinism engineering (same discipline as the rest of the engine):
- tf, dl, df, N are exact integers; avgdl = Σdl/N divides two exact longs;
- each per-term contribution is scaled to an exact integer
  (round(score·1e9) as long) BEFORE the per-document sum — summing doubles
  across term rows is order-dependent, summing longs is not;
- the final score rounds to 6 decimals, three orders above the 1e-9
  quantization, and ranks tie-break on doc_id.

Scale (100 TB corpus, ad-hoc queries): the only corpus-wide work is the
token explode feeding two map-side-combined aggregates (dl per doc, tf per
(doc, query-term) — the tf side filters to the query terms INSIDE the
scan, so its aggregate is hit-cardinality); N/avgdl ride in as a broadcast
one-row aggregate and df as a broadcast |terms|-row aggregate. The final
top-k is a TakeOrdered over hit documents, never a global sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bm25_search(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, score6, rank): top-``k`` documents for the bag of query
    ``terms`` under BM25, deterministic to the bit across engines."""
    if not terms:
        raise ValueError("bm25_search needs at least one query term")
    terms = [t.lower() for t in terms]

    occ = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    dl = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        occ.filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
    )
    contrib9 = F.round(idf * tf_part * 1_000_000_000).cast("long")

    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", contrib9.alias("c9"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c9") / 1e9, 6).alias("score6"))
    )
    # top-k via orderBy+limit (plans as TakeOrdered — per-partition heaps,
    # never a single-partition sort of the full hit set); the rank window
    # then runs over exactly k rows, which is bounded by construction
    from pyspark.sql import Window as W

    top = scored.orderBy(F.col("score6").desc(), F.col("doc_id").asc()).limit(k)
    w = W.orderBy(F.col("score6").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def bm25_search_sql(
    terms: Sequence[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB twin: identical integer-scaled per-term contributions."""
    from .oracles import TEXT_TOKENS

    quoted = ", ".join(f"'{t.lower()}'" for t in terms)
    return f"""
WITH occ AS (
  SELECT doc_id, unnest({TEXT_TOKENS}) AS token FROM documents
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM occ GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM dl
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM occ WHERE token IN ({quoted}) GROUP BY 1, 2
),
df_t AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         CAST(round(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * ((t.tf * ({k1} + 1)) / (t.tf + {k1} * (1.0 - {b}
              + {b} * l.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
           * 1000000000) AS BIGINT) AS c9
  FROM tf t
  JOIN df_t d USING (token)
  JOIN dl l USING (doc_id), stats s
),
ranked AS (
  SELECT doc_id, round(CAST(sum(c9) AS DOUBLE) / 1e9, 6) AS score6
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score6, CAST(row_number() OVER (
    ORDER BY score6 DESC, doc_id ASC) AS INT) AS rank
FROM ranked QUALIFY rank <= {k}
"""


def inverted_index(
    docs: DataFrame,
    min_df: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (token, df, postings): the sparse-retrieval building block — one
    row per vocabulary token with its document frequency and the SORTED
    posting list of containing doc ids (deterministic: collect_set
    de-dupes, sort_array fixes the order regardless of partitioning).

    Plan: explode tokens → distinct (token, doc) pairs → ONE hash
    aggregate per token. At 100 TB the postings array of a stopword-scale
    token is corpus-sized — ``max_df`` is the standard guard (drop tokens
    appearing in more than this many docs; they carry no retrieval signal
    and BM25's IDF would near-zero them anyway). ``min_df`` prunes hapax
    noise. The shuffle moves distinct (token, doc) pairs — vocabulary ×
    avg-df cardinality, not token occurrences."""
    pairs = docs.select(
        F.explode(tokens(text_col)).alias("token"),
        F.col(id_col).alias("doc_id"),
    ).distinct()
    idx = pairs.groupBy("token").agg(
        F.sort_array(F.collect_set("doc_id")).alias("postings")
    ).select(
        "token",
        F.size("postings").cast("long").alias("df"),
        "postings",
    )
    out = idx.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out
