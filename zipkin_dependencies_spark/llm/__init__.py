"""LLM-data-pipeline extension operators (SURVEY §7 M5) — beyond reference
parity: dedup, similarity search, text analysis, multimodal columns. Same
contract discipline as the core: explicit schemas, DuckDB-or-pure-Python
oracles, 100 TB-first design notes on every operator."""

from .dedup import (
    char_shingles,
    dedupe_exact,
    embedding_near_dup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import cosine_topk, hyperplane_signature, hyperplane_weights, lsh_cosine_topk
from .text import (
    bpe_ish_token_count,
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "char_shingles",
    "dedupe_exact",
    "embedding_near_dup",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "hyperplane_signature",
    "hyperplane_weights",
    "lsh_cosine_topk",
    "bpe_ish_token_count",
    "document_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
]
