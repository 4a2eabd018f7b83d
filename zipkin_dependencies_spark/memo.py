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


def register_memo(memo: dict) -> dict:
    """Track a memo dict for global clearing; returns it for inline use."""
    _REGISTRY.append(memo)
    return memo


def clear_all_memos() -> None:
    """Drop every registered memo's entries (bench pass boundaries)."""
    for m in _REGISTRY:
        m.clear()
