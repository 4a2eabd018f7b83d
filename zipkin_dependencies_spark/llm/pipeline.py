"""Corpus-curation pipeline: the extension operators composed end-to-end —
quality + language gate → keep-best dedup → deterministic sample.

This is the shape a 100 TB pretraining-data job actually runs, and the point
of the module is that the composition stays ONE Catalyst plan: the quality
and language expressions inline into the scan's filter (no materialization
between "steps"), the dedup window is the single text-free shuffle, and the
sample predicate evaluates on the dedup survivors. Every stage is an
operator that also stands alone with its own oracle; the composed query has
its own composed oracle (llm/oracles.py::curation_pipeline_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedupe_keep_best
from .sampling import hash_sample
from .text import language_id, quality_score


def curate(
    docs: DataFrame,
    min_quality: float = 0.4,
    lang: str = "en",
    sample_fraction: float = 0.5,
    salt: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (keep_id, fingerprint, quality, n_copies) of the curated corpus.

    Filter BEFORE dedup: cheaper (the window shuffle sees only survivors)
    and semantically the standard order — a high-quality duplicate of a
    filtered-out document should survive on its own merits."""
    gated = docs.filter(
        (quality_score(text_col) >= min_quality) & (language_id(text_col) == lang)
    )
    best = dedupe_keep_best(gated, text_col=text_col, id_col=id_col)
    return hash_sample(best, sample_fraction, key_col="keep_id", salt=salt)


def curate_v2(
    docs: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.4,
    lang: str = "en",
    max_dup_3gram: float = 0.5,
    decontaminate_n: int = 13,
    split_weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_parity: bool = False,
) -> DataFrame:
    """The full round-3 curation composition — scrub → quality/language/
    repetition gate → benchmark decontamination → keep-best dedup →
    train/val/test split — still ONE logical pipeline:

    - scrubbing and all three gate expressions inline into the scan
      projection (no materialization between "steps");
    - decontamination joins only the CONTAMINATED id set back (broadcast
      anti-join: contamination is rare by construction at scale, the set is
      O(benchmark-overlapping docs), not O(corpus));
    - the keep-best window over the cleaned-text fingerprint is the single
      text-free shuffle, exactly as in v1;
    - the split column is a scan-side hash range on the survivor key.

    → (keep_id, fingerprint, quality, n_copies, split)."""
    from .contamination import overlap_hits
    from .sampling import hash_split
    from .text import dup_ngram_frac, scrub_mapped

    # scrub as a MATERIALIZED stage (mapInPandas barrier), not an inline
    # Column: the three gates below reference the cleaned text ~a dozen
    # times, and project-collapse would re-run the regexes per reference
    # (measured 37 s vs 1.6 s at sf0.1 — see scrub_mapped's docstring)
    cleaned = scrub_mapped(docs, text_col=text_col, id_col=id_col, out_col="_clean")
    # materialize-once (r10, guide §2.4): the gated survivor frame feeds
    # TWO join sides below (the contamination probe and the anti-join) and
    # scrub_mapped is only an INLINING barrier, not a materialization —
    # without the checkpoint the Python scrub pass + all three gate
    # expressions execute twice over the corpus
    gated = cleaned.filter(
        (quality_score("_clean") >= min_quality)
        & (language_id("_clean") == lang)
        & (dup_ngram_frac("_clean", 3) <= max_dup_3gram)
    ).localCheckpoint(eager=True)
    bench_clean = scrub_mapped(
        benchmark, text_col=text_col, id_col=id_col, out_col="_clean"
    )
    dirty = overlap_hits(
        gated, bench_clean, n=decontaminate_n,
        text_col="_clean", id_col=id_col,
        bench_text_col="_clean", oracle_parity=oracle_parity,
    ).select(id_col)
    kept = gated.join(F.broadcast(dirty), id_col, "left_anti")
    best = dedupe_keep_best(kept, text_col="_clean", id_col=id_col)
    return hash_split(
        best,
        split_weights or {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col="keep_id",
    )


def curate_v3(
    docs: DataFrame,
    benchmark: DataFrame,
    lang: str = "en",
    decontaminate_n: int = 13,
    split_weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_parity: bool = False,
    **gopher_thresholds,
) -> DataFrame:
    """v2's composition with the heuristic quality gate replaced by the
    GOPHER RULE SET (llm/quality.py) — the paper-faithful pre-training
    gate, still one logical pipeline:

    scrub → Gopher keep + language gate → benchmark decontamination →
    keep-best dedup (quality-score election, as in v2) → hash split.

    ``gopher_thresholds`` forwards to :func:`quality._gopher_measures`
    (min_words, max_words, min_mean_word_len, max_mean_word_len,
    max_symbol_ratio, min_alpha_word_frac, min_stop_hits) — corpora and
    thresholds vary, the composition doesn't. Same plan discipline as
    v2: the scrub is the one materialized barrier, the Gopher Columns
    inline into the scan above it, decontamination broadcasts only the
    contaminated id set, and the keep-best window is the single
    text-free shuffle. → (keep_id, fingerprint, quality, n_copies,
    split)."""
    from .contamination import overlap_hits
    from .quality import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_WORD_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        _gopher_measures,
    )
    from .sampling import hash_split
    from .text import scrub_mapped

    th = {
        "min_words": GOPHER_MIN_WORDS,
        "max_words": GOPHER_MAX_WORDS,
        "min_mean_word_len": GOPHER_MIN_MEAN_WORD_LEN,
        "max_mean_word_len": GOPHER_MAX_MEAN_WORD_LEN,
        "max_symbol_ratio": GOPHER_MAX_SYMBOL_RATIO,
        "min_alpha_word_frac": GOPHER_MIN_ALPHA_WORD_FRAC,
        "min_stop_hits": GOPHER_MIN_STOP_HITS,
    }
    unknown = set(gopher_thresholds) - set(th)
    if unknown:
        raise ValueError(f"curate_v3: unknown gopher thresholds {sorted(unknown)}")
    th.update(gopher_thresholds)

    cleaned = scrub_mapped(docs, text_col=text_col, id_col=id_col, out_col="_clean")
    keep = _gopher_measures(
        F.col("_clean"),
        th["min_words"],
        th["max_words"],
        th["min_mean_word_len"],
        th["max_mean_word_len"],
        th["max_symbol_ratio"],
        th["min_alpha_word_frac"],
        th["min_stop_hits"],
    )["keep"]
    # materialize-once — same two-join-side shape as curate_v2 above
    gated = cleaned.filter(
        F.coalesce(keep, F.lit(False)) & (language_id("_clean") == lang)
    ).localCheckpoint(eager=True)
    bench_clean = scrub_mapped(
        benchmark, text_col=text_col, id_col=id_col, out_col="_clean"
    )
    dirty = overlap_hits(
        gated, bench_clean, n=decontaminate_n,
        text_col="_clean", id_col=id_col,
        bench_text_col="_clean", oracle_parity=oracle_parity,
    ).select(id_col)
    kept = gated.join(F.broadcast(dirty), id_col, "left_anti")
    best = dedupe_keep_best(kept, text_col="_clean", id_col=id_col)
    return hash_split(
        best,
        split_weights or {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col="keep_id",
    )
