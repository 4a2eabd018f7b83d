"""URL canonicalization + registered-domain dedup (the Dolma / CCNet
web-curation stage: canonicalize URL → collapse exact-URL replicas →
cap documents per registered domain, by rows or by token budget).

Public provenance: the stage mirrors what the Dolma toolkit (Soldaini et
al. 2024) and CCNet (Wenzek et al. 2020) describe for Common-Crawl
curation — URL-keyed exact dedup of recrawls/mirrors, then per-domain
caps so boilerplate-heavy domains can't dominate the corpus. Registered
domain ("example.co.uk" from "m.example.co.uk") follows the public
suffix list (publicsuffix.org): rules load from the shipped snapshot
``data/public_suffix_snapshot.dat`` (a curated subset in PSL text
format — drop a full publicsuffix.org snapshot over it to widen
coverage; the loader accepts the full format, skipping the wildcard/
exception rules it does not model). ``MULTI_LEVEL_SUFFIXES`` remains as
the no-data-file fallback. Reference parity: the zipkin reference has
no web-curation operators (SURVEY §2 — trace aggregator); extension
surface (SURVEY §6).

Percent-escape semantics (r10.5): unreserved escapes (RFC 3986 §2.3 —
ALPHA / DIGIT / ``-._~``) decode before the regex chain, in both hex
spellings, so recrawls differing only by escape spelling collapse;
reserved escapes (``%2F`` ``%3F`` …) stay encoded — they are data, not
spelling. A URL containing ANY malformed ``%`` sequence skips decoding
entirely (``PERCENT_GATE_RE``): decoding malformed input can fabricate
escapes ("%4%31" → "%41"), which would break the pinned idempotence
property.

Query-string semantics (r09 advisor note): canonicalization no longer
drops the whole query — it drops only known tracker parameters
(``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid``, ``igshid``;
lowercase keys, the form trackers emit) and keeps the remaining
parameters SORTED, so ``?b=2&a=1`` and ``?a=1&b=2`` collapse while
``?id=1`` and ``?id=2`` stay distinct pages. Whitespace/control bytes
are stripped up front on both engines, which also removes the Java-``$``
vs RE2-``$`` end-anchor divergence on newline-bearing input (the other
r09 advisor note): with no newlines left, ``$`` means end-of-text in
both regex dialects.

Character-set contract: hosts are treated as ASCII (the form real crawl
URLs arrive in — internationalized domain names are punycoded on the
wire). The engines' ``lower()`` functions differ on full-vs-simple
Unicode case mapping (Spark maps ``İ`` → ``i`` + combining dot and
applies final-sigma context; DuckDB folds simply), so a raw non-ASCII
host canonicalizes engine-dependently — punycode upstream, as crawlers
do. Pinned by the printable-ASCII hypothesis property sweep in
tests/test_llm.py (arbitrary garbage, not just URL-shaped strings,
agrees cross-engine and is idempotent).

Scale shape: canonicalization and domain extraction are pure JVM-side
Column expressions (regex + split + array HOFs on the tiny param list —
the corpus never shuffles for them; the PSL membership tests compile to
InSet hash probes inside whole-stage codegen, no join). URL-level dedup
is one hash exchange keyed on the canonical URL (replica groups are
crawl-duplicate-sized, tiny); the per-domain cap is a grouped top-k —
one exchange on the registered domain + a local per-group sort (same
shape as `top_docs_per_source`). The mega-domain skew worry (10⁹ pages
on one domain at 100 TB) is already answered by the measured plan
(PLANS.md `url_domain_dedup`): Spark plans BOTH rank filters as
WindowGroupLimit Partial→Exchange→Final, i.e. every map task trims to
its local top-k (1 for the URL collapse, cap for the domain cap) BEFORE
the shuffle — the two-phase trim, planner-applied; the exchange carries
at most (tasks × cap) rows per domain, never the domain's page count.
The token-budget variant (`url_domain_token_cap`) keeps that trim by
requiring an explicit row cap alongside the budget: the running token
sum only ever runs over the ≤cap rank survivors.
"""

from __future__ import annotations

import os
import string
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Two-label public suffixes used when the PSL snapshot data file is
#: missing (lowercase). The snapshot supersedes this table; it survives
#: only as the zero-data-file fallback so the operator degrades to the
#: pre-r10 heuristic instead of failing.
MULTI_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "co.in", "co.za", "com.ar",
)

#: Tracker query parameters dropped by canonicalization (anchored match
#: against one `key=value` parameter; lowercase keys — the form trackers
#: emit). Everything else is kept, sorted.
TRACKER_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$"
)

#: Gate for the percent-decoding pass: decode only when EVERY ``%`` in
#: the (whitespace-stripped) URL heads a well-formed two-hex-digit
#: escape. Decoding a malformed string can FABRICATE an escape
#: ("%4%31" → replace %31→'1' → "%41" → a second pass would decode to
#: "A"), breaking the pinned idempotence property; well-formed strings
#: are closed under the decode (decoded chars are unreserved — never
#: '%' — and retained escapes keep their own two hex digits), so on the
#: gated domain decode-once == decode-twice. Pure alternation/class
#: regex — identical semantics in Java regex and RE2 (anchored, so
#: partial-match engines agree too).
PERCENT_GATE_RE = r"^([^%]|%[0-9A-Fa-f]{2})*$"


@lru_cache(maxsize=1)
def percent_pairs() -> tuple[tuple[str, str], ...]:
    """(escape-spelling, decoded-char) pairs for every RFC 3986 §2.3
    UNRESERVED percent-escape — ALPHA / DIGIT / ``-`` ``.`` ``_``
    ``~`` — in both hex spellings where the low nibble is a letter
    (``%2E`` and ``%2e`` both mean ``.``; the high nibble is always a
    digit for this set). Reserved escapes (``%2F`` ``%3A`` ``%3F`` …)
    and non-ASCII bytes stay encoded: they are DATA, not alternate
    spellings — decoding them would change which character delimits
    path/query/host. The DuckDB twin consumes this same table, so both
    engines decode the identical spelling set in the identical order
    (order is immaterial on the gated domain, but identical is
    identical)."""
    chars = string.ascii_uppercase + string.ascii_lowercase
    chars += string.digits + "-._~"
    out: list[tuple[str, str]] = []
    for ch in chars:
        hh = f"{ord(ch):02X}"
        out.append((f"%{hh}", ch))
        if hh != hh.lower():  # second hex digit A-F: add the lowercase
            out.append((f"%{hh.lower()}", ch))
    return tuple(out)


_PSL_SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_snapshot.dat",
)


@lru_cache(maxsize=4)
def psl_rules(path: str | None = None) -> tuple[frozenset, frozenset]:
    """(two-label, three-label) public-suffix rule sets from the PSL
    snapshot file (publicsuffix.org text format: one rule per line,
    ``//`` comments, blank lines). Wildcard (``*.``) and exception
    (``!``) rules are skipped — the snapshot ships none and the
    longest-match CASE below does not model them; single-label rules
    are implicit (every TLD registers at two labels by default) and
    rules deeper than three labels are skipped, both documented
    limitations. Falls back to ``MULTI_LEVEL_SUFFIXES`` when the file
    is absent."""
    p = path or _PSL_SNAPSHOT
    if not os.path.exists(p):
        return frozenset(MULTI_LEVEL_SUFFIXES), frozenset()
    two, three = set(), set()
    with open(p, encoding="utf-8") as fh:
        for line in fh:
            rule = line.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("*.") or rule.startswith("!"):
                continue  # not modeled (see docstring)
            n = rule.count(".") + 1
            if n == 2:
                two.add(rule)
            elif n == 3:
                three.add(rule)
    return frozenset(two), frozenset(three)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL: whitespace/control bytes stripped,
    UNRESERVED percent-escapes decoded (``%41`` → ``A``, ``%7e`` →
    ``~`` — recrawls that differ only by escape spelling collapse;
    reserved escapes like ``%2F`` stay encoded, and a URL with ANY
    malformed ``%`` sequence skips decoding entirely — see
    ``PERCENT_GATE_RE`` for why that gate is what keeps the canonical
    form a fixed point), fragment stripped, tracker query params
    dropped and the remaining params sorted (see ``TRACKER_PARAM_RE``),
    scheme stripped (any `scheme://`), userinfo stripped, host
    lowercased with a leading `www.` / trailing dot / `:port` removed,
    trailing slashes trimmed from the path. Patterns live in the
    Java-regex ∩ RE2 subset so the DuckDB twin replays them verbatim
    (the scrub_pii rule); the leading `[\\x00-\\x20]+` strip removes
    every newline, after which `$` means end-of-text in both
    dialects."""
    u = F.col(url) if isinstance(url, str) else url
    # control bytes + spaces can't appear literally in a valid URL
    # (they'd be %-encoded) — stripping them first is both a data-hygiene
    # rule and the cross-engine $-anchor fix (module docstring)
    u = F.regexp_replace(u, r"[\x00-\x20]+", "")
    # unreserved-escape decode, single-pass HOF form: split on '%' —
    # behind the gate every piece after the first starts with exactly
    # two hex digits — and decode each piece's leading byte numerically
    # (conv base-16 → char), keeping it only when the code point is
    # RFC 3986 §2.3 unreserved (48–57 / 65–90 / 97–122 / -._~). One
    # split + ~10 expression nodes instead of the 84-replace chain the
    # first cut used (which cost ~3 s of codegen compile per session
    # and ~2× canonicalization wall — measured, see BASELINE.md r10.5
    # note); `percent_pairs()` remains the SPEC of the spelling set and
    # the unit suite pins this decoder against it pair by pair. The
    # contains-% pre-guard short-circuits the (overwhelmingly common)
    # escape-free row; the well-formedness gate preserves idempotence
    # on malformed input (PERCENT_GATE_RE docstring).
    def _decode_piece(p: Column) -> Column:
        n = F.conv(p.substr(1, 2), 16, 10).cast("int")
        unreserved = (
            n.between(48, 57)
            | n.between(65, 90)
            | n.between(97, 122)
            | n.isin(45, 46, 95, 126)
        )
        rest = p.substr(F.lit(3), F.length(p) - 2)
        return F.when(
            unreserved, F.concat(F.char(n), rest)
        ).otherwise(F.concat(F.lit("%"), p))

    parts = F.split(u, "%")
    decoded = F.concat(
        F.get(parts, 0),
        F.array_join(
            F.transform(
                F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
                _decode_piece,
            ),
            "",
        ),
    )
    u = F.when(
        u.contains("%") & u.rlike(PERCENT_GATE_RE), decoded
    ).otherwise(u)
    u = F.regexp_replace(u, r"#.*$", "")                 # fragment
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    u = F.regexp_replace(u, r"\?.*$", "")                # raw query off
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")  # scheme
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    path = F.regexp_replace(u, r"^[^/]*", "")
    # userinfo ends at the LAST @ (WHATWG URL §host parsing; '@' in
    # userinfo should be %-encoded but garbage input has it literally —
    # the non-greedy [^@]*@ left an '@' behind and broke idempotence,
    # caught by the hypothesis sweep)
    host = F.regexp_replace(host, r"^.*@", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")       # port
    host = F.regexp_replace(host, r"\.$", "")            # trailing dot
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(path, r"/+$", "")            # trailing slashes
    # tracker-filtered, sorted param remainder (tiny per-row list — the
    # interpreted HOF path is fine on a linear stage, the r08 rule)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKER_PARAM_RE),
        )
    )
    qcanon = F.array_join(params, "&")
    return F.concat(
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_host(canonical: Column) -> Column:
    """Host part of a `canonicalize_url` result (everything before the
    first slash or query)."""
    return F.regexp_extract(canonical, r"^([^/?]*)", 1)


def registered_domain(
    host: Column, rules: tuple[frozenset, frozenset] | None = None
) -> Column:
    """Registered (pay-level) domain of a lowercase host, by
    longest-match against the PSL snapshot: the last FOUR labels when
    the trailing three form a known three-label suffix (act.edu.au,
    s3.amazonaws.com), else the last THREE when the trailing two form a
    known two-label suffix (co.uk, github.io, com.tw), else the last
    two labels (the PSL's implicit default rule). Single-label hosts
    (and hosts that ARE a public suffix) pass through unchanged."""
    r2, r3 = rules if rules is not None else psl_rules()
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # F.get (0-based, null-safe) instead of element_at: out-of-range
    # probes on short hosts return NULL (concat_ws skips them) instead
    # of an ANSI error — the llm/bpe.py empty-accumulator idiom
    last2 = F.concat_ws(
        ".", F.get(labels, n - 2), F.get(labels, n - 1)
    )
    last3 = F.concat_ws(".", F.get(labels, n - 3), last2)
    last4 = F.concat_ws(".", F.get(labels, n - 4), last3)
    out = F.when(n >= 2, last2).otherwise(host)
    if r2:
        out = F.when((n >= 3) & last2.isin(*sorted(r2)), last3).otherwise(out)
    if r3:
        out = F.when((n >= 4) & last3.isin(*sorted(r3)), last4).otherwise(out)
    return out


def _url_base(
    df: DataFrame,
    url_col: str,
    id_col: str,
    quality_col: str | None,
    token_col: str | None = None,
) -> DataFrame:
    """Shared stage-0/1 prep: canonicalize, extract registered domain,
    null-url drop — all scan-local codegen. Projects to exactly the
    columns the dedup stages use (id, q, canonical_url,
    registered_domain[, _tok])."""
    q = (
        F.col(quality_col)
        if quality_col is not None
        else F.lit(0).cast("long")
    )
    extras = (
        [F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("_tok")]
        if token_col is not None
        else []
    )
    return (
        df.where(F.col(url_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            q.alias("q"),
            canonicalize_url(url_col).alias("canonical_url"),
            *extras,
        )
        .withColumn(
            "registered_domain",
            registered_domain(url_host(F.col("canonical_url"))),
        )
    )


def _url_winners(base: DataFrame) -> DataFrame:
    """Stage 1: exact-URL collapse — documents sharing a canonical URL
    (recrawls, mirrors, tracker-tagged copies) keep ONE representative:
    highest quality, then lowest id. Plans as WindowGroupLimit (map-side
    top-1 trim before the shuffle)."""
    w_url = Window.partitionBy("canonical_url").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    return (
        base.withColumn("rn", F.row_number().over(w_url))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def url_domain_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    per_domain_cap: int = 3,
) -> DataFrame:
    """Two-stage web-curation dedup → (id, canonical_url,
    registered_domain, domain_rank), one row per KEPT document:

    1. exact-URL collapse: documents sharing a canonical URL (recrawls,
       mirrors, tracker-tagged copies) keep ONE representative — highest
       quality, then lowest id (deterministic; `max(struct(quality,
       -id))`-shaped via a window over the canonical URL).
    2. domain cap: among URL-winners, at most ``per_domain_cap`` docs
       per registered domain, best-first by (quality desc, id asc);
       ``domain_rank`` is the doc's 1-based rank within its domain.

    ``quality_col=None`` ranks by id alone (keep-first). Rows with a
    NULL url drop (no provenance → no curation decision)."""
    winners = _url_winners(_url_base(df, url_col, id_col, quality_col))
    w_dom = Window.partitionBy("registered_domain").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    return (
        winners.withColumn("domain_rank", F.row_number().over(w_dom))
        .where(F.col("domain_rank") <= per_domain_cap)
        .select(
            "id",
            "canonical_url",
            "registered_domain",
            F.col("domain_rank").cast("long").alias("domain_rank"),
        )
    )


def url_domain_token_cap(
    df: DataFrame,
    token_budget: int,
    per_domain_cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    token_col: str = "n_tokens",
) -> DataFrame:
    """Token-BUDGETED per-domain cap → (id, canonical_url,
    registered_domain, domain_rank, cum_tokens), one row per KEPT doc:
    after the same exact-URL collapse as `url_domain_dedup`, each
    registered domain keeps its best docs (quality desc, id asc) WHILE
    the running token total stays ≤ ``token_budget`` — the budget form
    of domain capping a token-accounted pretraining mix uses (a domain
    contributes at most N tokens, not at most N documents). A doc whose
    tokens would push the running total past the budget is dropped, and
    so is everything ranked after it within reach of the budget rule
    (greedy prefix — the deterministic, engine-agreeable reading).

    ``per_domain_cap`` is REQUIRED and applied first: it is the hard
    row cap that keeps the plan's map-side WindowGroupLimit trim (the
    mega-domain skew answer — the running sum only ever runs over ≤cap
    rank survivors, so no task windows over a whole mega-domain). Pick
    it generously: any value ≥ budget/min_doc_tokens makes the row cap
    semantically inert and purely a physical bound.

    ``cum_tokens`` is the running total INCLUDING the row (≤ budget by
    construction). NULL token counts count as 0 (SUM semantics on both
    engines). Token counts must be ≥ 0 (they are counts): the budget
    filter equals the greedy PREFIX only because the running total is
    monotone — a negative count would re-admit later rows (the filter
    semantics both engines compute, but no longer a prefix)."""
    winners = _url_winners(
        _url_base(df, url_col, id_col, quality_col, token_col=token_col)
    )
    w_dom = Window.partitionBy("registered_domain").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    capped = (
        winners.withColumn("domain_rank", F.row_number().over(w_dom))
        .where(F.col("domain_rank") <= per_domain_cap)
    )
    # same partition + order ⇒ Catalyst reuses the exchange AND the sort
    # from the rank window: the running sum is a second Window node on
    # already-partitioned, already-sorted data, not a second shuffle
    w_run = w_dom.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        capped.withColumn("cum_tokens", F.sum("_tok").over(w_run))
        .where(F.col("cum_tokens") <= F.lit(int(token_budget)))
        .select(
            "id",
            "canonical_url",
            "registered_domain",
            F.col("domain_rank").cast("long").alias("domain_rank"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


def url_domain_token_cap_carryover(
    df: DataFrame,
    state: DataFrame,
    token_budget: int,
    per_domain_cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    token_col: str = "n_tokens",
    state_domain_col: str = "registered_domain",
    state_used_col: str = "tokens_used",
) -> DataFrame:
    """Cross-EPOCH token-budgeted per-domain cap — the incremental form
    of `url_domain_token_cap` an ongoing crawl ingestion runs: the
    budget is a property of the DOMAIN ACROSS EPOCHS, so this epoch's
    admissions start from what previous epochs already consumed.
    ``state`` is (``state_domain_col``, ``state_used_col``) — one row
    per domain seen before, tokens already consumed (absent domain =
    0); build it from the previous run's output as
    ``max(cum_tokens) + carried_tokens`` per domain, which makes the
    operator COMPOSABLE: epoch N's output is epoch N+1's state, and the
    invariant ``Σ admitted tokens across epochs ≤ token_budget`` holds
    per domain. Earlier epochs have priority by construction — that is
    the semantics of an ongoing ingestion (NOT equivalent to one run
    over the union, which would rank all epochs' docs together).

    Semantics: identical ranking and row-cap as `url_domain_token_cap`
    (quality desc, id asc; ``per_domain_cap`` applied first — it keeps
    the map-side WindowGroupLimit trim, the mega-domain skew answer),
    then admit while ``carried + running ≤ token_budget``. A domain
    whose state already meets the budget admits only zero-token rows
    (degenerate but well-defined on both engines).

    Scale shape: the state join lands AFTER the rank filter, so it
    touches at most ``tasks × per_domain_cap`` rows per domain, and the
    join key is the registered domain — state is domain-cardinality
    (orders of magnitude below corpus-cardinality); AQE picks broadcast
    when it fits, shuffled-hash otherwise. Everything upstream reuses
    the token_cap plan verbatim (same windows, same exchange reuse).

    Output adds ``carried_tokens`` (state tokens for the domain, 0 when
    new); ``cum_tokens`` stays THIS-epoch-only so downstream state
    building composes as documented above."""
    winners = _url_winners(
        _url_base(df, url_col, id_col, quality_col, token_col=token_col)
    )
    w_dom = Window.partitionBy("registered_domain").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    capped = (
        winners.withColumn("domain_rank", F.row_number().over(w_dom))
        .where(F.col("domain_rank") <= per_domain_cap)
    )
    w_run = w_dom.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    st = state.select(
        F.col(state_domain_col).alias("_st_domain"),
        F.coalesce(F.col(state_used_col).cast("long"), F.lit(0)).alias(
            "carried_tokens"
        ),
    )
    return (
        capped.withColumn("cum_tokens", F.sum("_tok").over(w_run))
        .join(st, F.col("registered_domain") == F.col("_st_domain"), "left")
        .withColumn(
            "carried_tokens", F.coalesce(F.col("carried_tokens"), F.lit(0))
        )
        .where(
            F.col("carried_tokens") + F.col("cum_tokens")
            <= F.lit(int(token_budget))
        )
        .select(
            "id",
            "canonical_url",
            "registered_domain",
            F.col("domain_rank").cast("long").alias("domain_rank"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            F.col("carried_tokens").cast("long").alias("carried_tokens"),
        )
    )
