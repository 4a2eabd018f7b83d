"""Corpus quality filtering: Gopher-style document rules, C4-style
line-level cleaning, and corpus-shape statistics (length histogram,
Zipf fit).

These are the standard pre-training quality gates published in the
Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) and C4 (Raffel et al.
2020, arXiv:1910.10683 §2.2) papers, re-expressed as pure Column
expressions so the 100 TB hot path stays inside whole-stage codegen —
no Python crossing anywhere in this module. Each operator ships its
DuckDB SQL twin for the value-hash correctness gate.

Scale notes:
- ``gopher_quality`` / ``c4_line_filter`` are embarrassingly parallel
  scan-side projections: zero shuffles, filters push to the parquet
  scan when composed upstream of a ``WHERE keep``.
- ``doc_length_histogram`` shuffles only (source, bucket) pairs —
  output cardinality |sources| × ~40 buckets.
- ``zipf_fit`` shuffles token-cardinality data once (the same shape as
  the gated ``top_k_tokens``); the rank assignment deliberately avoids
  a global single-partition window (see the function docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: Gopher's "stop word presence" rule set (the paper requires ≥2 hits
#: from a small common-English list).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the",
    "be",
    "to",
    "of",
    "and",
    "that",
    "have",
    "with",
)

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"

#: Gopher rule thresholds (the paper's values) — single source for
#: gopher_quality, its SQL twin, and dataset_card's keep-rate so the
#: three can never drift apart.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def _gopher_measures(
    c: Column,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    min_alpha_word_frac: float,
    min_stop_hits: int,
) -> dict[str, Column]:
    """The Gopher rule measurements + keep verdict as raw Columns —
    shared by :func:`gopher_quality` (per-doc emission) and
    :func:`dataset_card` (per-source keep-rate aggregation)."""
    toks = tokens(c)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    mean_wl = F.when(n_words > 0, sum_len / n_words)
    sym_ratio = F.when(n_words > 0, (n_hash + n_ell) / n_words)
    alpha_frac = F.when(n_words > 0, n_alpha_words / n_words)
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio < max_symbol_ratio)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return {
        "n_words": n_words,
        "mean_wl": mean_wl,
        "sym_ratio": sym_ratio,
        "alpha_frac": alpha_frac,
        "stop_hits": stop_hits,
        "keep": keep,
    }


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_ratio: float = GOPHER_MAX_SYMBOL_RATIO,
    min_alpha_word_frac: float = GOPHER_MIN_ALPHA_WORD_FRAC,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
) -> DataFrame:
    """Gopher document-quality rules → one row per doc with every rule's
    measured value plus the combined ``keep`` verdict.

    Emitting the raw measurements (not just the boolean) is deliberate:
    threshold tuning on a new corpus is a ``WHERE`` clause over this
    output, not a re-scan. All expressions are JVM Columns; composed
    before a filter the whole thing runs inside one codegen stage over
    the scan.
    """
    m = _gopher_measures(
        _col(text_col),
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        max_symbol_ratio,
        min_alpha_word_frac,
        min_stop_hits,
    )
    n_words = m["n_words"]
    mean_wl = m["mean_wl"]
    sym_ratio = m["sym_ratio"]
    alpha_frac = m["alpha_frac"]
    stop_hits = m["stop_hits"]
    keep = m["keep"]
    return docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 9).alias("mean_word_len9"),
        F.round(sym_ratio, 9).alias("symbol_ratio9"),
        F.round(alpha_frac, 9).alias("alpha_word_frac9"),
        stop_hits.cast("long").alias("stop_hits"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def gopher_quality_sql(
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_ratio: float = GOPHER_MAX_SYMBOL_RATIO,
    min_alpha_word_frac: float = GOPHER_MIN_ALPHA_WORD_FRAC,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
) -> str:
    """DuckDB twin of :func:`gopher_quality` (documents table)."""
    return rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t <> '') AS toks,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         list_aggregate(list_transform(toks, t -> length(t)), 'sum')
           AS sum_len,
         n_hash, n_ell,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
           AS n_alpha_words,
         CAST(len(list_intersect(list_distinct(toks), {_STOP_SQL}))
           AS BIGINT) AS stop_hits
  FROM base
)
SELECT doc_id, n_words,
       round(CASE WHEN n_words > 0 THEN sum_len / n_words END, 9)
         AS mean_word_len9,
       round(CASE WHEN n_words > 0 THEN (n_hash + n_ell) / n_words END, 9)
         AS symbol_ratio9,
       round(CASE WHEN n_words > 0 THEN n_alpha_words / n_words END, 9)
         AS alpha_word_frac9,
       stop_hits,
       coalesce(
         n_words >= {min_words} AND n_words <= {max_words}
         AND sum_len / n_words >= {min_mean_word_len}
         AND sum_len / n_words <= {max_mean_word_len}
         AND (n_hash + n_ell) / n_words < {max_symbol_ratio}
         AND n_alpha_words / n_words >= {min_alpha_word_frac}
         AND stop_hits >= {min_stop_hits},
         false) AS keep
FROM m
"""


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning: a line survives iff it has ≥
    ``min_line_words`` whitespace words, ends in terminal punctuation
    (``.!?"``), and contains neither ``{`` nor the word ``javascript``;
    the document survives iff ≥ ``min_kept_lines`` lines remain and the
    text contains no ``lorem ipsum`` placeholder.

    Output keeps the per-doc line counts and the cleaned text's length
    (the cleaned text itself is reconstructable as
    ``array_join(kept_lines, '\\n')`` — not emitted so the gate hashes
    stay small). Pure Column pipeline over array functions — the
    line-explode never materializes as rows.

    Lines split on ``\\r?\\n`` so CRLF corpora behave identically to LF
    ones on both engines (Java's ``$`` matches before a trailing ``\\r``
    while RE2's does not, and neither engine's trim strips it — splitting
    the ``\\r`` away pins one behavior and keeps ``cleaned_chars`` free
    of carriage returns).
    """
    c = _col(text_col)
    lines = F.split(c, r"\r?\n")

    def _line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        wc = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        return (
            (wc >= min_line_words)
            & t.rlike('[.!?"]$')
            & ~ln.contains("{")
            & ~F.lower(ln).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    keep = (n_kept >= min_kept_lines) & ~F.lower(c).contains("lorem ipsum")
    return docs.select(
        id_col,
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        F.length(F.array_join(kept, "\n")).cast("long").alias("cleaned_chars"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def c4_line_filter_sql(min_line_words: int = 5, min_kept_lines: int = 3) -> str:
    """DuckDB twin of :func:`c4_line_filter` (documents table)."""
    return rf"""
WITH base AS (
  SELECT doc_id, text, string_split_regex(text, '\r?\n') AS lines
  FROM documents
),
k AS (
  SELECT doc_id, text, lines,
         list_filter(lines, ln ->
           len(list_filter(string_split_regex(trim(ln), '\s+'),
                           w -> w <> '')) >= {min_line_words}
           AND regexp_matches(trim(ln), '[.!?"]$')
           AND NOT contains(ln, '{{')
           AND NOT contains(lower(ln), 'javascript')) AS kept
  FROM base
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(coalesce(length(array_to_string(kept, chr(10))), 0) AS BIGINT)
         AS cleaned_chars,
       coalesce(len(kept) >= {min_kept_lines}
                AND NOT contains(lower(text), 'lorem ipsum'),
                false) AS keep
FROM k
"""


def doc_length_histogram(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source log₂-bucketed token-length histogram → (source, bucket,
    n_docs, sum_tokens). ``bucket`` is the bit length of the token count
    (0 tokens → bucket 1, 1 → 1, 2-3 → 2, 4-7 → 3, …), computed as the
    binary-string length so it is INTEGER-exact on both engines — a
    float ``log2`` rounds differently at exact powers of two.

    The shuffle carries only (source, bucket) pairs; output cardinality
    is |sources| × ≤ 40 buckets regardless of corpus size.
    """
    n_tok = F.size(tokens(_col(text_col)))
    bucket = F.length(F.conv(n_tok.cast("string"), 10, 2)).cast("long")
    return (
        docs.select(F.col(group_col).alias("source"),
                    n_tok.cast("long").alias("n_tok"),
                    bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
        )
    )


def doc_length_histogram_sql() -> str:
    """DuckDB twin of :func:`doc_length_histogram` (documents table)."""
    return r"""
WITH t AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              w -> w <> '')) AS BIGINT) AS n_tok
  FROM documents
)
SELECT source, CAST(length(bin(n_tok)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens
FROM t GROUP BY 1, 2
"""


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Least-squares fit of ln(freq) against ln(rank) over the corpus
    vocabulary → one row (n_terms, slope6, intercept6). A healthy
    natural-language corpus sits near slope −1 (Zipf's law); templated
    or synthetic text shows up immediately as a flat or stepped curve —
    this is the cheapest corpus-level pathology detector there is.

    Rank assignment avoids the naive global row_number (a
    single-partition sort of the whole vocabulary): frequencies are
    histogrammed first (|distinct freq| rows — O(√corpus_tokens)-ish,
    tiny), a running offset is computed on THAT table, then broadcast
    back so each term's rank = offset(freq) + row_number within its own
    frequency class (partitioned window, parallel). Ties are ordered by
    token text — fully deterministic on both engines.

    The fit itself is ``regr_slope``/``regr_intercept`` — numerically a
    sum whose accumulation order differs between engines, hence the
    6-dp rounding (vs the house 9-dp for single-division ratios).
    """
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(tokens(_col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    fhist = freq.groupBy("freq").agg(F.count(F.lit(1)).alias("n_terms"))
    w_off = (
        Window.orderBy(F.col("freq").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = fhist.select(
        "freq", F.coalesce(F.sum("n_terms").over(w_off), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("freq").orderBy("token")
    ranked = (
        freq.join(F.broadcast(offsets), "freq")
        .select(
            "freq", (F.col("off") + F.row_number().over(w_in)).alias("rank")
        )
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 6).alias("slope6"),
        F.round(
            F.regr_intercept(F.log("freq"), F.log("rank")), 6
        ).alias("intercept6"),
    )


def zipf_fit_sql() -> str:
    """DuckDB twin of :func:`zipf_fit` (documents table)."""
    return r"""
WITH freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
                                                     '\s+'),
                                  w -> w <> '')) AS token
        FROM documents)
  GROUP BY token
),
ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM freq
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(ln(freq), ln(rank)), 6) AS slope6,
       round(regr_intercept(ln(freq), ln(rank)), 6) AS intercept6
FROM ranked
"""


def dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    lang_col: str = "lang",
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-source dataset-card rollup → (source, n_docs, n_langs,
    total_tokens, total_chars, gopher_keep_rate9, dup_rate9,
    mean_quality9): the one-screen summary a dataset release ships —
    volume, language diversity, quality-gate pass rate, exact-duplicate
    rate, mean heuristic quality.

    One scan computes every per-doc measure (Gopher keep verdict, token
    and char counts, the dedup fingerprint, the scaled quality score);
    one grouped aggregate reduces to |sources| rows. Float discipline:
    every ratio is a single post-aggregation division over exact
    integers (quality is summed as its round-9 value × 1e9 cast to
    long), so value hashes are engine- and partitioning-stable. The
    exact-duplicate rate uses count(distinct fingerprint) — the only
    part of this plan whose shuffle carries doc-cardinality keys (16-byte
    digests; text never moves).

    ``approx_distinct=True`` is the 100 TB path: HyperLogLog++
    (``approx_count_distinct``, rsd 1%) for the fingerprint and language
    cardinalities — a fixed-size sketch per group instead of the exact
    aggregate's per-key state, at the cost of the oracle-exact dup rate
    (the gated query keeps the exact default; a billion-doc card run
    flips this on).
    """
    from .text import document_fingerprint, quality_score

    c = _col(text_col)
    keep = _gopher_measures(
        c,
        GOPHER_MIN_WORDS,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MIN_ALPHA_WORD_FRAC,
        GOPHER_MIN_STOP_HITS,
    )["keep"]
    per_doc = docs.select(
        F.col(group_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.size(tokens(c)).cast("long").alias("n_tok"),
        F.length(c).cast("long").alias("n_chars"),
        F.coalesce(keep, F.lit(False)).cast("int").alias("keep_i"),
        document_fingerprint(c).alias("fp"),
        F.round(quality_score(c) * 1e9).cast("long").alias("q_scaled"),
    )
    if approx_distinct:
        n_langs = F.approx_count_distinct("lang", 0.01)
        # HLL++ can OVERestimate: cap at n_docs so dup_rate9 stays in [0,1]
        n_unique = F.least(
            F.approx_count_distinct("fp", 0.01), F.count(F.lit(1))
        )
    else:
        n_langs = F.count_distinct(F.col("lang"))
        n_unique = F.count_distinct(F.col("fp"))
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_langs.alias("n_langs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("keep_i").alias("n_keep"),
        n_unique.alias("n_unique"),
        F.sum("q_scaled").alias("q_sum"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_langs",
        "total_tokens",
        "total_chars",
        F.round(F.col("n_keep") / F.col("n_docs"), 9).alias(
            "gopher_keep_rate9"
        ),
        F.round(1 - F.col("n_unique") / F.col("n_docs"), 9).alias("dup_rate9"),
        F.round(F.col("q_sum") / F.col("n_docs") / 1e9, 9).alias(
            "mean_quality9"
        ),
    )


def dataset_card_sql() -> str:
    """DuckDB twin of :func:`dataset_card` (documents table)."""
    gopher = gopher_quality_sql()
    return rf"""
WITH g AS ({gopher}),
per_doc AS (
  SELECT d.source, d.lang,
         CAST(len(list_filter(string_split_regex(lower(trim(d.text)), '\s+'),
                              w -> w <> '')) AS BIGINT) AS n_tok,
         CAST(length(d.text) AS BIGINT) AS n_chars,
         CASE WHEN g.keep THEN 1 ELSE 0 END AS keep_i,
         md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS fp,
         CAST(round((
           (CASE WHEN length(d.text) > 0
                 THEN length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
                      / length(d.text) ELSE 0.0 END)
           + least(length(d.text) / 1000.0, 1.0)
           + (CASE WHEN (CASE WHEN n_tok > 0
                              THEN length(d.text) / n_tok ELSE 0.0 END) >= 3
                    AND (CASE WHEN n_tok > 0
                              THEN length(d.text) / n_tok ELSE 0.0 END) <= 12
                   THEN 1.0 ELSE 0.5 END)) / 3.0, 9) * 1e9 AS BIGINT)
           AS q_scaled
  FROM (SELECT *,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               w -> w <> '')) AS BIGINT) AS n_tok
        FROM documents) d
  JOIN g ON g.doc_id = d.doc_id
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         sum(keep_i) AS n_keep,
         count(DISTINCT fp) AS n_unique,
         sum(q_scaled) AS q_sum
  FROM per_doc GROUP BY 1
)
SELECT source, n_docs, n_langs, total_tokens, total_chars,
       round(CAST(n_keep AS DOUBLE) / n_docs, 9) AS gopher_keep_rate9,
       round(1 - CAST(n_unique AS DOUBLE) / n_docs, 9) AS dup_rate9,
       round(CAST(q_sum AS DOUBLE) / n_docs / 1e9, 9) AS mean_quality9
FROM agg
"""


def hashed_classifier_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """→ (id, n_tokens, logit_q4, keep): fastText-style linear quality
    classifier over hashed bag-of-words features (Joulin et al. 2016
    "Bag of tricks for efficient text classification") — the
    model-based quality filter modern curation pipelines run after the
    rule-based gates (the DCLM / FineWeb-Edu shape: score every
    document with a cheap linear model, keep above threshold).

    Each token hashes to one of ``n_buckets`` feature buckets; the
    document's logit is the mean bucket weight. Weights here are
    deterministic pseudo-weights derived from the bucket's md5 (integers
    in [-1000, 1000]) — a stand-in for trained weights so the
    cross-engine gate can replay the arithmetic; a production caller
    broadcasts its trained (bucket, weight) table instead and the plan
    is unchanged (in-scan hash → integer bucket sums → one division).
    ``keep`` thresholds the raw integer weight sum at 0 — the sigmoid
    is monotone, so this IS the classifier's decision with NO float op
    at all; ``logit_q4`` = round(sw·10/n) as a BIGINT (the logit scaled
    by 1e4): one division and one round-to-INTEGER. Integer rounding is
    the engine-safe form — round(x, 4) on doubles diverges cross-engine
    at decimal half boundaries because DuckDB scales by 10^4 internally
    (an extra multiply rounding) while Spark rounds the exact binary
    value; round-to-integer has no internal multiply in either engine
    (measured: the round(·,4) form reddened 2/500 docs at sf0.01).

    Scale (100 TB): embarrassingly parallel scan-side work — text
    collapses to one integer sum per document inside the scan stage,
    nothing shuffles (composed upstream of a ``WHERE keep``, the whole
    classifier pushes into the corpus scan like the Gopher/C4 gates).
    Empty documents keep n_tokens = 0 and a null logit (no class
    evidence), keep = false."""
    w = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.pmod(
                                F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast(
                                    "bigint"
                                ),
                                F.lit(n_buckets),
                            ),
                            F.lit("w"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(2001),
        )
        - 1000
    )
    per_doc = (
        docs.select(F.col(id_col), F.explode_outer(tokens(text_col)).alias("tok"))
        .groupBy(id_col)
        .agg(
            F.count(F.col("tok")).alias("n_tokens"),
            F.sum(F.when(F.col("tok").isNotNull(), w)).alias("sw"),
        )
    )
    logit_q = F.round(F.col("sw") * 10.0 / F.col("n_tokens")).cast("bigint")
    return per_doc.select(
        id_col,
        "n_tokens",
        F.when(F.col("n_tokens") > 0, logit_q).alias("logit_q4"),
        F.coalesce(
            F.when(F.col("n_tokens") > 0, F.col("sw") >= 0), F.lit(False)
        ).alias("keep"),
    )


def hashed_classifier_sql(n_buckets: int = 1 << 16) -> str:
    """DuckDB twin of ``hashed_classifier_scores`` over ``documents`` —
    identical bucket hash, pseudo-weights, and single-division logit."""
    bucket = "(('0x' || substring(md5(tok), 1, 8))::BIGINT % {nb})".format(
        nb=n_buckets
    )
    w = (
        f"((('0x' || substring(md5(CAST({bucket} AS VARCHAR) || '|' || 'w'),"
        f" 1, 8))::BIGINT % 2001) - 1000)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                    t -> t <> '')) AS tok
  FROM documents
),
per_doc AS (
  SELECT d.doc_id,
         CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens,
         t.sw AS sw
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS n, sum({w}) AS sw
             FROM toks GROUP BY doc_id) t USING (doc_id)
)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(round(sw * 10.0 / n_tokens) AS BIGINT) END AS logit_q4,
       COALESCE(CASE WHEN n_tokens > 0 THEN sw >= 0 END,
                FALSE) AS keep
FROM per_doc
"""
