"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark corpus (the standard 13-gram overlap
check of large-LM data pipelines; extension operator, SURVEY §7 M5).

Scale design (100 TB training corpus vs MB-scale benchmark):
- the benchmark side collapses to a DISTINCT n-gram digest set and is
  BROADCAST — benchmark suites are a few MB of text, their digest set a few
  hundred thousand longs; the training corpus is therefore never shuffled
  at all: the overlap join is a scan-side broadcast semi-join, pipelined
  with the n-gram generation inside one stage;
- corpus-side n-grams exist only inside the per-row transform (an array
  expression, whole-stage codegen) and the join probe; nothing document-
  sized crosses the wire;
- digests are 64-bit xxhash64 of the joined n-gram text (or 32-bit md5
  prefixes in oracle-parity mode, the same family every other dedup
  operator uses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: whitespace tokenization shared with llm.text (lower/trim, empty dropped)
_TOKENS = r"filter(split(lower(trim({col})), '\\s+'), t -> t != '')"


def word_ngrams(text_col: str, n: int) -> Column:
    """Word n-grams as space-joined strings — pure array expression
    (sequence + slice + concat_ws under codegen). Texts with fewer than
    ``n`` words yield an empty array."""
    toks = _TOKENS.format(col=text_col)
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({toks}, i, {n})))"
        f" ELSE array() END"
    )


def _digest(gram: Column, oracle_parity: bool) -> Column:
    if oracle_parity:  # 32-bit md5 prefix — bit-identical in DuckDB
        return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
    return F.xxhash64(gram)


def overlap_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    oracle_parity: bool = False,
) -> DataFrame:
    """→ (doc_id, n_hits) for documents with ≥1 shared n-gram ONLY — the
    contamination-cardinality frame (tiny at scale). Pipelines that anti-join
    the dirty set use this directly: it never re-reads the corpus the way
    the all-documents ``decontaminate`` output must."""
    bench_grams = F.broadcast(
        benchmark.select(
            F.explode(word_ngrams(bench_text_col, n)).alias("_g")
        )
        .select(_digest(F.col("_g"), oracle_parity).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(text_col, n))
        ).alias("_g"),
    ).select(F.col(id_col), _digest(F.col("_g"), oracle_parity).alias("g"))

    return (
        doc_grams.join(bench_grams, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    oracle_parity: bool = False,
) -> DataFrame:
    """→ (doc_id, n_hits, contaminated): per document, how many DISTINCT
    word n-grams it shares with the benchmark corpus, and whether that
    reaches ``min_hits``.

    Every document appears in the output (clean docs carry n_hits=0), so a
    decontamination filter is ``filter(~contaminated)`` with no second scan.
    """
    hits = overlap_hits(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col, oracle_parity=oracle_parity,
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
