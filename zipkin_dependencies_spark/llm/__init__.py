"""LLM-data-pipeline extension operators (SURVEY §7 M5) — beyond reference
parity: dedup, similarity/retrieval search, clustering, text analysis,
sampling/packing, multimodal columns. Same contract discipline as the
core: explicit schemas, DuckDB-or-pure-Python oracles, 100 TB-first design
notes on every operator."""

from .cluster import (
    connected_components,
    connected_components_star,
    dedupe_near_keep_best,
    lsh_verified_pairs,
    near_dup_clusters,
)
from .contamination import decontaminate, overlap_hits, word_ngrams
from .dedup import (
    char_shingles,
    corpus_diff,
    dedupe_against,
    dedupe_exact,
    dedupe_keep_best,
    embedding_near_dup,
    embedding_near_dup_lsh,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .kmeans import kmeans_assign
from .packing import assign_shards
from .pipeline import curate, curate_v2
from .retrieval import bm25_search
from .sampling import (
    group_hash_topn,
    hash_sample,
    hash_split,
    quantile_gate,
    stratified_hash_sample,
)
from .similarity import (
    cosine_topk,
    hyperplane_signature,
    hyperplane_weights,
    ivf_cosine_topk,
    label_centroids,
    lsh_cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from .quality import (
    c4_line_filter,
    doc_length_histogram,
    gopher_quality,
    zipf_fit,
)
from .text import (
    bpe_ish_token_count,
    corpus_stats,
    document_fingerprint,
    dup_ngram_frac,
    language_id,
    quality_score,
    repetition_score,
    scrub_pii,
    token_count,
    token_fertility,
    token_idf,
    top_docs_per_group,
    top_k_tokens,
    unigram_surprisal,
)

__all__ = [
    "assign_shards",
    "bm25_search",
    "bpe_ish_token_count",
    "c4_line_filter",
    "char_shingles",
    "connected_components",
    "connected_components_star",
    "corpus_diff",
    "corpus_stats",
    "cosine_topk",
    "curate",
    "curate_v2",
    "decontaminate",
    "dedupe_against",
    "dedupe_exact",
    "dedupe_keep_best",
    "dedupe_near_keep_best",
    "doc_length_histogram",
    "document_fingerprint",
    "dup_ngram_frac",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "gopher_quality",
    "group_hash_topn",
    "hash_sample",
    "hash_split",
    "hyperplane_signature",
    "hyperplane_weights",
    "ivf_cosine_topk",
    "kmeans_assign",
    "label_centroids",
    "language_id",
    "lsh_cosine_topk",
    "lsh_verified_pairs",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "overlap_hits",
    "quality_score",
    "quantile_gate",
    "quantize_embeddings",
    "quantized_cosine_topk",
    "repetition_score",
    "scrub_pii",
    "simhash",
    "stratified_hash_sample",
    "token_count",
    "token_fertility",
    "token_idf",
    "top_docs_per_group",
    "top_k_tokens",
    "unigram_surprisal",
    "word_ngrams",
    "zipf_fit",
]
