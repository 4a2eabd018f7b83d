"""Token-budget shard assignment — the "pack the corpus into training
shards" step of a pretraining pipeline, expressed as a DISTRIBUTED prefix
sum (extension operator, SURVEY §7 M5; the reference has no analog — its
output is a links table, not a corpus).

The operator lays documents out in a deterministic, content-stable global
order (the salted-md5 hash order every sampling operator here already
uses) and assigns each document to shard ``floor(start_offset /
token_budget)`` where ``start_offset`` is the running token total of all
documents before it. Contiguous hash ranges → contiguous shards, so a
shard is reproducible from the corpus alone: re-runs, backfills, and
engines agree, and adding a shard-N reader never needs the rest.

Scale design (100 TB):
- NO global sort. A single-window cumulative sum over the corpus would
  plan as one exchange into ONE partition (Spark's empty
  ``Window.orderBy`` frame) — the classic prefix-sum trap. Instead the
  hash space is cut into ``num_buckets`` contiguous ranges: per-bucket
  token subtotals (one tiny aggregate, map-side combined) give the bucket
  start offsets, which broadcast back and each bucket cumsums its own
  rows independently — two narrow shuffles, both on pruned
  (id, hash, n_tokens) projections, never text.
- The only single-partition step is the offsets window over
  ``num_buckets`` rows (bounded, default 64 — thousands at 100 TB, still
  KB-scale).
- The bucket key is the hash's high bits, so bucket ranges ARE hash-order
  ranges: offset(bucket) + within-bucket cumsum = exact global prefix
  sum, bit-identical to the single-window formulation the DuckDB oracle
  runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import HASH_SPACE, _bucket
from .text import token_count


def assign_shards(
    docs: DataFrame,
    token_budget: int = 4096,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """→ (key, n_tokens, shard): token-budget-balanced contiguous shard
    assignment by distributed prefix sum over salted-hash order.

    A document whose tokens straddle a budget boundary belongs to the
    shard its FIRST token falls in (assignment by start offset) — every
    shard holds ≥ the budget's worth of starts, and the mapping is a pure
    function of (corpus, budget, salt)."""
    if HASH_SPACE % num_buckets:
        raise ValueError(f"num_buckets must divide {HASH_SPACE}: {num_buckets}")
    width = HASH_SPACE // num_buckets

    base = docs.select(
        F.col(key_col),
        _bucket(F.col(key_col), salt).alias("_h"),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).withColumn("_b", F.expr(f"_h div {width}"))

    # bucket subtotals: num_buckets rows — the one place a bare orderBy
    # window is CORRECT (bounded input, single partition by construction)
    offsets = (
        base.groupBy("_b")
        .agg(F.sum("n_tokens").alias("_bt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bt").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_off")
    )

    within = Window.partitionBy("_b").orderBy("_h", key_col)
    return (
        base.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_start", F.col("_off") + F.sum("n_tokens").over(within) - F.col("n_tokens")
        )
        .select(
            key_col,
            "n_tokens",
            F.expr(f"_start div {token_budget}").alias("shard"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, chunk_idx, chunk_text, n_tokens): fixed-size token
    windows with overlap — the "split long documents into training
    sequences" step (every context-length-bounded trainer needs it;
    overlap preserves cross-boundary n-grams for next-token training).

    Chunk i covers tokens [i·step, i·step + chunk_tokens) with
    step = chunk_tokens − overlap; a document yields
    max(1, ceil((n − overlap) / step)) chunks so the last window is never
    an orphaned sub-overlap tail, and an empty document yields one empty
    chunk (the doc is never silently dropped — gates count documents).

    Pure per-row Column work: tokenize once, explode a SEQUENCE of chunk
    indexes, slice the token array per index — no shuffle at all (the
    explode is pipelined into the scan), no Python, output rows ~
    corpus_tokens / step. The whole operator is whole-stage-codegen
    at any scale; it's embarrassingly parallel by construction."""
    from .text import tokens

    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    toks = tokens(text_col)
    n = F.size(F.col("_toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)).cast(
            "long"
        ),
    )
    piece = F.slice(
        F.col("_toks"),
        (F.col("chunk_idx") * step + 1).cast("int"),
        chunk_tokens,
    )
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .select(
            id_col,
            "_toks",
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks - 1)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
    )
