"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure Column expressions (JVM-side, codegen'd) —
the hot path of a 100 TB text pipeline must not cross into Python per row.
Every operator has a DuckDB-expressible twin for the correctness gate."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language marker-word sets for the n-gram/stopword heuristic —
#: deliberately small and deterministic (the contract is the operator shape,
#: not state-of-the-art accuracy; swap in fastText offline models via the
#: multimodal mapInPandas plumbing when available).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "une"),
    "es": ("el", "la", "los", "y", "es", "en", "que", "una"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the lowercased text (empty text → empty array)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish count: splits on whitespace AND letter/digit/punct
    boundaries — a cheap, deterministic stand-in for a BPE tokenizer's token
    count (useful for budget estimates)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.split(
        F.regexp_replace(c, r"([0-9]+|[^\sA-Za-z0-9])", r" $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


def quality_score(text: Column | str) -> Column:
    """Heuristic [0,1] quality score from length / alpha ratio / mean word
    length — each component a single deterministic division (stable for
    cross-engine hashing)."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_tok = token_count(c)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    mean_word = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(1000.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((alpha_ratio + len_score + word_score) / 3.0, 9)


def language_id(text: Column | str) -> Column:
    """Marker-word language ID: language with the highest marker hit count
    wins; ties and zero hits → 'und' (undetermined). Deterministic argmax via
    greatest + case chain."""
    toks = tokens(text)

    def marker_pred(markers: tuple[str, ...]):
        # closure, not a default arg: pyspark binds higher-order-lambda params
        # by arity, so a 2-arg lambda would receive the element index
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed priority: earlier languages win ties (stable order en>de>fr>es)
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def top_k_tokens(docs, k: int = 100, text_col: str = "text"):
    """Corpus vocabulary: the k most frequent whitespace tokens with counts
    and dense rank (ties broken by token text for determinism).

    explode → groupBy(token) → top-k. The aggregate is partial+final hash
    aggregation, so each task pre-counts its own tokens before the exchange
    — the shuffle moves one row per distinct token per task, not one per
    token occurrence (at 100 TB: vocabulary-sized, not corpus-sized). The
    top-k itself is orderBy+limit — Spark's TakeOrdered, a per-partition
    heap + driver merge, never a single-partition global sort; the ranking
    window then runs on the k surviving rows only."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = counts.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return top.select(
        "token",
        "n_occurrences",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def token_idf(docs, text_col: str = "text"):
    """Per-token document frequency and inverse document frequency:
    (token, df, idf = ln(N/df) rounded to 9 decimals).

    Distinct-per-doc explode → partial+final count; the corpus size N joins
    in as a broadcast one-row aggregate instead of a driver-side ``count()``
    (no action, stays one lazy plan). The vocabulary-sized result feeds
    TF-IDF scoring and stopword discovery."""
    tok_docs = docs.select(
        F.explode(F.array_distinct(tokens(text_col))).alias("token")
    )
    counts = tok_docs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token",
        "df",
        F.round(F.log(F.col("n_docs") / F.col("df")), 9).alias("idf"),
    )


def top_docs_per_group(docs, k: int = 5, group_col: str = "source", text_col: str = "text"):
    """Grouped top-k: the k highest-quality documents per group (source,
    domain, shard…), deterministic tiebreak on doc_id.

    Window row_number over the group partition — ONE hash exchange on the
    group key; each group's sort is local and bounded by group size. For
    pathological mega-groups at 100 TB, pre-filter with an approximate
    per-group quality floor before the window; semantics stay identical for
    every group smaller than the pre-filter budget."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "doc_id", F.col(group_col), quality_score(text_col).alias("quality")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def document_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text —
    stable across storage formats and engines (the rolling-hash variant for
    containment checks is simhash/minhash in llm.dedup)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def _word_ngram_strings(text: Column | str, n: int) -> Column:
    """Word n-grams (space-joined) of the whitespace tokens; < n words →
    empty array. Pure array expression under codegen."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_frac(text: Column | str, n: int = 1) -> Column:
    """Fraction of duplicate word n-grams within the text (n=1: words);
    0.0 for texts shorter than n words. Standalone Column so pipelines can
    gate on it inline (see pipeline.curate_v2)."""
    arr = tokens(text) if n == 1 else _word_ngram_strings(text, n)
    sz = F.size(arr)
    return F.when(
        sz > 0,
        F.round((sz - F.size(F.array_distinct(arr))) / sz.cast("double"), 9),
    ).otherwise(F.lit(0.0))


def repetition_score(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Intra-document repetition signals (the Gopher-style quality family):
    fraction of duplicate words / 2-grams / 3-grams within each document —
    near-1 values mark boilerplate, keyword stuffing, and decode loops.

    → (doc_id, n_words, dup_word_frac, dup_2gram_frac, dup_3gram_frac),
    fractions rounded to 9 decimals. All per-ROW array arithmetic
    (size/array_distinct), zero shuffles, zero Python — the cheapest class
    of quality gate a 100 TB pipeline has; composes with quality_score and
    the keep-best window in one Catalyst plan."""
    return docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("n_words"),
        dup_ngram_frac(text_col, 1).alias("dup_word_frac"),
        dup_ngram_frac(text_col, 2).alias("dup_2gram_frac"),
        dup_ngram_frac(text_col, 3).alias("dup_3gram_frac"),
    )


#: scrub patterns chosen from the regex subset with identical semantics in
#: Java regex (Spark) and RE2 (DuckDB) — no lookbehind, no backrefs
SCRUB_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
}


def scrub_expr(text: Column | str) -> Column:
    """The cleaned-text Column alone (fixed email → URL → IP order) — for
    pipelines that inline scrubbing into a larger projection."""
    clean = F.col(text) if isinstance(text, str) else text
    for key in ("email", "url", "ipv4"):
        pat, token = SCRUB_PATTERNS[key]
        clean = F.regexp_replace(clean, pat, token)
    return clean


def scrub_mapped(
    docs, text_col: str = "text", id_col: str = "doc_id", out_col: str = "clean_text"
):
    """Scrubbed text as a MATERIALIZED pipeline stage (Arrow-batched pandas
    str.replace over the same patterns, same order) → (id, out_col).

    Why this exists next to the pure-Column ``scrub_expr``: Catalyst's
    project-collapse inlines a projection into every downstream reference —
    a gate that reads the cleaned text a dozen times (quality + language +
    repetition expressions) re-executes the three regexes a dozen times per
    row (measured 37 s vs 1.6 s for one evaluation at sf0.1). A mapInPandas
    stage is an inlining barrier: the scrub runs exactly once per row, and
    everything downstream references the physical column. Use ``scrub_expr``
    when the cleaned text is consumed once; use this inside multi-consumer
    pipelines (curate_v2). Patterns are the Java ∩ RE2 ∩ Python-re common
    subset, so all three engines agree."""
    import re as _re

    import pandas as pd  # noqa: F401  (mapInPandas contract)

    compiled = [
        (_re.compile(SCRUB_PATTERNS[k][0]), SCRUB_PATTERNS[k][1])
        for k in ("email", "url", "ipv4")
    ]
    id_type = docs.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            s = pdf[text_col]
            for rx, tok in compiled:
                s = s.str.replace(rx, tok, regex=True)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: s})

    from ..scaling import ensure_min_parallelism

    return ensure_min_parallelism(docs.select(id_col, text_col)).mapInPandas(
        kernel, f"{id_col} {id_type}, {out_col} string"
    )


def scrub_pii(docs, text_col: str = "text", id_col: str = "doc_id"):
    """PII/noise scrubbing for pre-training text: emails, URLs, and IPv4
    literals replaced with typed placeholder tokens, with per-document match
    counts for pipeline telemetry (how much was redacted, which docs are
    PII-dense enough to drop outright).

    → (doc_id, clean_text, n_emails, n_urls, n_ips). Pure JVM regexp
    expressions in one projection — no shuffle, no Python; patterns are
    restricted to the Java-regex ∩ RE2 subset so the DuckDB oracle replays
    them verbatim. Order matters and is fixed: emails first (so user@host
    inside a URL query string is still caught by the URL rule, not half
    rewritten), then URLs, then bare IPs."""
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(name)
        for name, (pat, _) in (
            ("n_emails", SCRUB_PATTERNS["email"]),
            ("n_urls", SCRUB_PATTERNS["url"]),
            ("n_ips", SCRUB_PATTERNS["ipv4"]),
        )
    ]
    return docs.select(F.col(id_col), scrub_expr(c).alias("clean_text"), *counts)


def corpus_stats(docs, source_col: str = "source", lang_col: str = "lang"):
    """Corpus inventory at every granularity in ONE pass: per (source,
    lang), per source, and grand total, via ROLLUP grouping sets — Spark
    computes all three levels inside a single hash aggregate (partial
    aggregation upstream, no extra scans), which is the whole point vs
    three separate groupBys at 100 TB.

    Aggregates are engine-exact by construction: counts and token sums are
    integers, and mean quality is derived from an INTEGER sum of the
    round-9 quality scores scaled by 1e9 (float summation order differs
    between engines and across partitionings; summing exact integers makes
    the mean bit-identical everywhere). Rolled-up group keys surface as
    '(all)' — the fixture has no null source/lang, so the marker is
    unambiguous."""
    q9 = F.round(quality_score("text") * 1_000_000_000).cast("long")
    toks = token_count("text")
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(lang_col).alias("lang"),
            toks.alias("_toks"),
            q9.alias("_q9"),
        )
        .rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_toks").alias("total_tokens"),
            F.round(F.sum("_q9") / F.count(F.lit(1)) / 1e9, 9).alias("mean_quality"),
        )
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_docs",
            "total_tokens",
            "mean_quality",
        )
    )


def unigram_surprisal(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document mean unigram surprisal under the corpus's own unigram
    LM → (doc_id, n_tokens, surprisal6). The poor man's perplexity filter:
    documents full of corpus-typical tokens score low, token-soup and
    boilerplate-anomalies score high — the standard cheap proxy where a
    real LM is too expensive to run over 100 TB.

    surprisal = −mean ln(count(token)/total_tokens), where the per-token
    ln values are scaled to exact integers (round(ln·1e9) as long) before
    the per-document sum — summing doubles across rows is order-dependent,
    summing longs is not, so the score is bit-stable across engines and
    partitionings (the final mean is rounded to 6 decimals, three orders
    of margin above the 1e-9 quantization).

    Plan: one token-keyed aggregate builds the vocabulary (map-side
    combined; vocab cardinality, not corpus), the corpus total rides in as
    a broadcast one-row aggregate, and the scoring join shuffles (doc_id,
    token) pairs — never text. At 100 TB the vocab side of the join is the
    small one; Spark broadcasts it when it fits, else AQE picks the
    shuffle join."""
    occ = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    # the vocab table feeds BOTH the corpus total and the scoring join;
    # materialize it once (eager checkpoint, vocab-cardinality) so the
    # corpus is scanned exactly twice — vocab build + scoring join, the
    # floor without materializing exploded text. (Spark does not reuse
    # the subtree across consumers on its own: 3 scans without this.)
    vocab = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    # corpus total from the vocab table, not another pass over occ: the
    # sum of per-token counts IS the occurrence total
    total = vocab.agg(F.sum("cnt").alias("total"))
    q9 = F.round(
        F.log(F.col("cnt") / F.col("total")) * 1_000_000_000
    ).cast("long")
    scored = occ.join(vocab, "token").crossJoin(F.broadcast(total)).select(
        "doc_id", q9.alias("q9")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            -(F.sum("q9") / F.count(F.lit(1))) / 1e9, 6
        ).alias("surprisal6"),
    )


def bigram_surprisal(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document mean bigram surprisal under the corpus's own bigram LM
    → (doc_id, n_bigrams, bigram_surprisal6): −mean ln P(w_i | w_{i−1}),
    with P = count(prev, cur) / count(prev-as-prefix). The second-order
    companion to ``unigram_surprisal`` — word-salad that passes a unigram
    filter (common words, impossible order) scores high here.

    Same exactness recipe as the unigram operator: per-bigram ln values
    quantize to integers (round(ln·1e9) as long) before the per-document
    sum, so scores are bit-stable across engines and partitionings. Every
    observed bigram has count ≥ 1 under its prefix — no smoothing needed.

    Plan: ordered bigrams extract JVM-side (element_at over the token
    array — 1-based, matching DuckDB list indexing); one bigram-keyed
    aggregate builds the LM (bigram-vocabulary cardinality); prefix counts
    derive FROM that table, not a second corpus pass; the scoring join
    ships (doc_id, prev, cur) — never text."""
    pairs_expr = F.when(
        F.size(F.col("_toks")) >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1), "
            "i -> struct(element_at(_toks, i) as prev, "
            "element_at(_toks, i + 1) as cur))"
        ),
    ).otherwise(
        F.array().cast("array<struct<prev:string,cur:string>>")
    )
    occ = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .select("doc_id", F.explode(pairs_expr).alias("bg"))
        .select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )
    # bigram LM feeds prefix totals AND the scoring join — materialize once
    lm = (
        occ.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    prefix = lm.groupBy("prev").agg(F.sum("c2").alias("c1"))
    q9 = F.round(
        F.log(F.col("c2") / F.col("c1")) * 1_000_000_000
    ).cast("long")
    scored = (
        occ.join(lm, ["prev", "cur"])
        .join(prefix, "prev")
        .select("doc_id", q9.alias("q9"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -(F.sum("q9") / F.count(F.lit(1))) / 1e9, 6
        ).alias("bigram_surprisal6"),
    )


def normalize_text(text):
    """Canonical text form for robust dedup keys: lowercase, every
    whitespace run collapsed to one space, leading/trailing runs trimmed.
    Pure Column expression — composes with document_fingerprint and the
    digest dedup family (their normalization superset lives there; this is
    the standalone, oracle-parity surface)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def token_fertility(
    docs, text_col: str = "text", group_col: str = "lang"
):
    """Per-group tokenizer fertility → (lang, n_docs, ws_tokens,
    bpe_tokens, fertility9): the BPE-ish/whitespace token ratio, the
    budget-planning number ("how many model tokens per word does this
    language cost"). Integer sums shuffled at group cardinality; the one
    division happens after aggregation (round-9 hash-stable)."""
    c = F.col(text_col)
    agg = (
        docs.select(
            F.col(group_col).alias("lang"),
            token_count(c).cast("long").alias("ws"),
            bpe_ish_token_count(c).cast("long").alias("bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
        )
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.when(
            F.col("ws_tokens") > 0,
            F.round(F.col("bpe_tokens") / F.col("ws_tokens"), 9),
        ).alias("fertility9"),
    )


def vocab_growth(
    docs: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (bucket, new_types, cum_vocab, n_token_occurrences, cum_tokens):
    the Heaps-law vocabulary growth curve — how fast NEW vocabulary
    appears as the corpus grows in its natural id order (the dataset-card
    companion to ``zipf_fit``'s frequency law; a flattening curve means
    the corpus has stopped contributing new types).

    The naive formulation (cumulative COUNT DISTINCT per prefix) rescans
    the corpus ``n_buckets`` times and keeps vocabulary-scale state per
    prefix. This is ONE pass instead: a type's first appearance is
    ``min(bucket)`` over its occurrences — a map-side-combined aggregate
    on the exploded types — and the growth curve is a cumulative sum of
    first-appearance counts over the ``n_buckets``-row result. Buckets
    come from exact integer arithmetic on the id range
    ((id − min)·B div (max − min + 1), both engines integer-divide), so
    no rank/ntile global sort anywhere. The final cumsum window is a
    single partition of ``n_buckets`` rows — driver-scale by
    construction.

    The "type" is the word BIGRAM (1-based element_at, the same recipe
    as ``bigram_surprisal``'s pair extraction — matches DuckDB list
    indexing): bigram vocabularies keep growing long after the unigram
    vocabulary saturates, which is what makes the curve informative for
    corpus-novelty decisions (and non-degenerate on the fixture, whose
    unigram vocabulary saturates in the first decile)."""
    from pyspark.sql import Window

    bounds = docs.agg(
        F.min(id_col).alias("mn"), F.max(id_col).alias("mx")
    )
    bucketed = docs.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"(({id_col} - mn) * {int(n_buckets)}) div (mx - mn + 1)"
        ).alias("bucket"),
        F.col(text_col).alias("_text"),
    )
    bigrams_expr = F.when(
        F.size(F.col("_toks")) >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1), "
            "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = bucketed.select(
        "bucket", tokens(F.col("_text")).alias("_toks")
    ).select("bucket", F.explode(bigrams_expr).alias("token"))
    occ = exploded.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_token_occurrences")
    )
    news = (
        exploded.groupBy("token")
        .agg(F.min("bucket").alias("first_bucket"))
        .groupBy(F.col("first_bucket").alias("nb_bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        occ.join(
            F.broadcast(news), F.col("bucket") == F.col("nb_bucket"), "left_outer"
        )
        .select(
            "bucket",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
            "n_token_occurrences",
        )
        .withColumn("cum_vocab", F.sum("new_types").over(w))
        .withColumn("cum_tokens", F.sum("n_token_occurrences").over(w))
        .select(
            "bucket", "new_types", "cum_vocab",
            "n_token_occurrences", "cum_tokens",
        )
    )


def doc_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_parity: bool = False,
) -> DataFrame:
    """→ (doc_id, n_ngrams, n_novel, novelty9): the fraction of a
    document's DISTINCT word n-grams making their corpus-wide FIRST
    appearance in this document (first = smallest doc_id carrying the
    gram) — the per-document novelty/memorization signal a curation pass
    ranks crawl batches by (a doc whose grams all appeared earlier adds
    nothing; the per-document complement of the corpus-level Heaps curve
    in ``vocab_growth``, and the intra-corpus analog of
    ``dup_ngram_coverage``, which ignores WHO was first).

    Scale (100 TB): documents become (id, gram-digest) rows once
    (digests 8 bytes, text never leaves the scan; ``localCheckpoint``
    pins the explode for its two consumers); first-appearance is ONE
    map-side-combined min() aggregate at vocabulary cardinality; the
    join back is digest-keyed with AQE absorbing hot boilerplate grams.
    Short documents (< n words) stay in the output with n_ngrams = 0,
    novelty9 = 0.0 — a curation step must account for every input row."""
    from ..scaling import ensure_min_parallelism
    from .contamination import _digest, word_ngrams

    grams = (
        ensure_min_parallelism(
            docs.select(F.col(id_col), F.col(text_col).alias("_text"))
        )
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(word_ngrams("_text", n))).alias("_g"),
        )
        .select(F.col(id_col), _digest(F.col("_g"), oracle_parity).alias("g"))
        .localCheckpoint(eager=True)
    )
    first = grams.groupBy("g").agg(F.min(id_col).alias("_first"))
    per_doc = (
        grams.join(first, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                (F.col(id_col) == F.col("_first")).cast("long")
            ).alias("n_novel"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.round(F.col("n_novel") / F.col("n_ngrams"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty9"),
        )
    )


def hashed_embeddings(
    docs: DataFrame,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id, n_tokens, embedding array<bigint>, sq_norm): feature-hashed
    document embeddings (Weinberger et al. 2009 "Feature hashing for
    large scale multitask learning") — each token occurrence adds ±1 to
    one of ``dim`` cells (index and sign from independent md5 slices).
    This is the signed random projection of the bag-of-words vector:
    inner products approximate token-overlap similarity, so the output
    feeds the repo's ANN/cosine family when no learned embedding exists
    — an in-engine text vectorizer with zero model dependencies.

    All-integer cells (sums of ±1) — bit-exact cross-engine for free;
    ``sq_norm`` is the exact integer ‖v‖² downstream cosines need.
    Empty documents embed as the zero vector (kept — vanishing rows
    break joins against the corpus).

    Scale (100 TB): text collapses IN-SCAN to ``dim`` conditional
    integer sums per document (one hash-aggregate, map-side combined;
    the explode never reaches the wire). The one exchange is keyed by
    doc id and carries dim+2 integers per document — the embedding
    table is ~130 bytes/doc whatever the text size."""
    h_idx = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint"),
        F.lit(dim),
    )
    sign = F.when(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.col("tok"), F.lit("|s"))), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(2),
        )
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    cells = (
        docs.select(F.col(id_col), F.explode_outer(tokens(text_col)).alias("tok"))
        .select(
            id_col,
            F.col("tok"),
            h_idx.alias("i"),
            sign.alias("s"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.col("tok")).alias("n_tokens"),
            *[
                F.coalesce(
                    F.sum(F.when(F.col("i") == d, F.col("s"))), F.lit(0)
                ).alias(f"c{d}")
                for d in range(dim)
            ],
        )
    )
    emb = F.array(*[F.col(f"c{d}") for d in range(dim)])
    sq = None
    for d in range(dim):
        term = F.col(f"c{d}") * F.col(f"c{d}")
        sq = term if sq is None else sq + term
    return cells.select(
        id_col,
        "n_tokens",
        emb.alias("embedding"),
        sq.cast("bigint").alias("sq_norm"),
    )


def hashed_embeddings_sql(dim: int = 16) -> str:
    """DuckDB twin of ``hashed_embeddings`` over ``documents``, in the
    gate's exploded (doc_id, n_tokens, dim_idx, cell, sq_norm) form —
    identical index/sign hashes and integer cells."""
    idx = "(('0x' || substring(md5(tok), 1, 8))::BIGINT % {d})".format(d=dim)
    sgn = (
        "(CASE WHEN ('0x' || substring(md5(tok || '|s'), 1, 8))::BIGINT % 2 = 0"
        " THEN 1 ELSE -1 END)"
    )
    sum_cols = ",\n         ".join(
        f"sum(CASE WHEN {idx} = {d} THEN {sgn} END) AS c{d}"
        for d in range(dim)
    )
    zero_cols = ",\n         ".join(
        f"CAST(COALESCE(a.c{d}, 0) AS BIGINT) AS c{d}" for d in range(dim)
    )
    sq = " + ".join(f"c{d} * c{d}" for d in range(dim))
    unions = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, n_tokens, {d} AS dim_idx, c{d} AS cell,"
        f" CAST({sq} AS BIGINT) AS sq_norm FROM cells"
        for d in range(dim)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                    t -> t <> '')) AS tok
  FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n,
         {sum_cols}
  FROM toks GROUP BY doc_id
),
cells AS (
  SELECT d.doc_id,
         CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
         {zero_cols}
  FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
)
SELECT doc_id, n_tokens, dim_idx, cell, sq_norm FROM (
{unions}
)
"""
