"""LLM-data-pipeline extension operators (SURVEY §7 M5) — beyond reference
parity: dedup, similarity search, text analysis, multimodal columns. Same
contract discipline as the core: explicit schemas, DuckDB-or-pure-Python
oracles, 100 TB-first design notes on every operator."""

from .cluster import connected_components, near_dup_clusters
from .dedup import (
    char_shingles,
    dedupe_exact,
    dedupe_keep_best,
    embedding_near_dup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .pipeline import curate
from .sampling import hash_sample, hash_split, stratified_hash_sample
from .similarity import cosine_topk, hyperplane_signature, hyperplane_weights, lsh_cosine_topk
from .text import (
    bpe_ish_token_count,
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
    token_idf,
    top_docs_per_group,
    top_k_tokens,
)

__all__ = [
    "char_shingles",
    "connected_components",
    "curate",
    "dedupe_exact",
    "dedupe_keep_best",
    "embedding_near_dup",
    "hash_sample",
    "hash_split",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "simhash",
    "stratified_hash_sample",
    "cosine_topk",
    "hyperplane_signature",
    "hyperplane_weights",
    "lsh_cosine_topk",
    "bpe_ish_token_count",
    "document_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
    "token_idf",
    "top_docs_per_group",
    "top_k_tokens",
]
