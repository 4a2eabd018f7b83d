"""Session-scoped subtree memos — the multi-consumer-subtree house rule
(SCALING.md): when several same-session consumers layer on one expensive
intermediate table (near-dup components, trace paths), the builder
localCheckpoints it once under an explicit caller-provided key and later
consumers reuse it verbatim. Opt-in per call site (no key → no caching),
exact by determinism (cached vs recomputed are byte-equal), invalidated
when the owning SparkSession changes.

Every memo dict registers here so benchmarks can reset ALL of them at a
measurement-pass boundary with one call — a repeat pass must re-pay the
pipelines; the memo's purpose is intra-pass sharing between consumers,
not making repeat passes measure a dict lookup.
"""

from __future__ import annotations

_REGISTRY: list[dict] = []


def corpus_token(path: str) -> str:
    """Filesystem snapshot token for a corpus directory (or single file):
    a hash over every data file's relative name, size, and mtime_ns.

    INVALIDATION CONTRACT: a memo key MUST change whenever the data it was
    built from changes. Keys derived from a *path alone* violate this in
    any long-lived session whose backing store is mutable — a re-written
    parquet under the same path would serve the stale table. Callers keying
    by path must therefore embed this token (all in-repo call sites do);
    callers holding a DataFrame with no stable provenance must pass
    memo_key=None and forgo the memo rather than invent a key. Cost: one
    driver-side directory walk of stat calls — metadata-only, no data read,
    negligible against the pipeline the memo saves."""
    import hashlib
    import os

    h = hashlib.sha256()
    if os.path.isdir(path):
        for root, dirs, files in sorted(os.walk(path)):
            dirs.sort()
            for fn in sorted(files):
                if fn.startswith((".", "_")):  # _SUCCESS, .crc, ...
                    continue
                st = os.stat(os.path.join(root, fn))
                rel = os.path.relpath(os.path.join(root, fn), path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}\n".encode())
    else:
        st = os.stat(path)
        h.update(f"{path}:{st.st_size}:{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def register_memo(memo: dict) -> dict:
    """Track a memo dict for global clearing; returns it for inline use."""
    _REGISTRY.append(memo)
    return memo


def clear_all_memos() -> None:
    """Drop every registered memo's entries (bench pass boundaries).

    Persisted entries are explicitly unpersisted first: ``df.persist``
    pins an InMemoryRelation in Spark's CacheManager that outlives the
    Python reference (unlike localCheckpoint blocks, which the
    ContextCleaner frees once the RDD reference is GC'd) — clearing the
    dict alone would leak executor memory across bench passes or a
    long-lived session's corpus switches."""
    for m in _REGISTRY:
        for v in m.values():
            unpersist = getattr(v, "unpersist", None)
            if unpersist is not None:
                try:
                    unpersist(False)
                except Exception:
                    pass  # session already stopped / never persisted
        m.clear()
