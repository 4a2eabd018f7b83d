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
