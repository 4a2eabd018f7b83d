"""URL canonicalization + registered-domain dedup (the Dolma / CCNet
web-curation stage: canonicalize URL → collapse exact-URL replicas →
cap documents per registered domain).

Public provenance: the stage mirrors what the Dolma toolkit (Soldaini et
al. 2024) and CCNet (Wenzek et al. 2020) describe for Common-Crawl
curation — URL-keyed exact dedup of recrawls/mirrors, then per-domain
caps so boilerplate-heavy domains can't dominate the corpus. Registered
domain ("example.co.uk" from "m.example.co.uk") follows the public
suffix list idea (publicsuffix.org); shipping the full PSL is a data
file concern, so this implements the standard heuristic with a literal
multi-level-suffix table — swap `MULTI_LEVEL_SUFFIXES` for a PSL load in
production. Reference parity: the zipkin reference has no web-curation
operators (SURVEY §2 — trace aggregator); extension surface (SURVEY §6).

Scale shape: canonicalization and domain extraction are pure JVM-side
Column expressions (regex + split, whole-stage codegen — the corpus
never shuffles for them). URL-level dedup is one hash exchange keyed on
the canonical URL (replica groups are crawl-duplicate-sized, tiny);
the per-domain cap is a grouped top-k — one exchange on the registered
domain + a local per-group sort (same shape as `top_docs_per_source`).
The mega-domain skew worry (10⁹ pages on one domain at 100 TB) is
already answered by the measured plan (PLANS.md `url_domain_dedup`):
Spark plans BOTH rank filters as WindowGroupLimit Partial→Exchange→
Final, i.e. every map task trims to its local top-k (1 for the URL
collapse, cap for the domain cap) BEFORE the shuffle — the two-phase
trim, planner-applied; the exchange carries at most
(tasks × cap) rows per domain, never the domain's page count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Two-label public suffixes the registered-domain heuristic recognizes
#: (lowercase). "example.co.uk" → registered "example.co.uk" needs three
#: labels; anything not listed registers at two labels. Literal table —
#: see module note on the public suffix list.
MULTI_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "co.in", "co.za", "com.ar",
)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL: fragment and query stripped, scheme
    stripped (any `scheme://`), userinfo stripped, host lowercased with
    a leading `www.` / trailing dot / `:port` removed, trailing slashes
    trimmed from the path. Patterns live in the Java-regex ∩ RE2 subset
    so the DuckDB twin replays them verbatim (the scrub_pii rule)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                 # fragment
    u = F.regexp_replace(u, r"\?.*$", "")                # query
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")  # scheme
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    path = F.regexp_replace(u, r"^[^/]*", "")
    host = F.regexp_replace(host, r"^[^@]*@", "")        # userinfo
    host = F.regexp_replace(host, r":[0-9]+$", "")       # port
    host = F.regexp_replace(host, r"\.$", "")            # trailing dot
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(path, r"/+$", "")            # trailing slashes
    return F.concat(host, path)


def url_host(canonical: Column) -> Column:
    """Host part of a `canonicalize_url` result (everything before the
    first slash)."""
    return F.regexp_extract(canonical, r"^([^/]*)", 1)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a lowercase host: the last two
    labels, or the last three when the final two form a known two-label
    public suffix (`MULTI_LEVEL_SUFFIXES`). Single-label hosts (and
    empties) pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*MULTI_LEVEL_SUFFIXES)
    return (
        F.when(n >= 3, F.when(is_multi, last3).otherwise(last2))
        .when(n == 2, last2)
        .otherwise(host)
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
       mirrors, utm-tagged copies) keep ONE representative — highest
       quality, then lowest id (deterministic; `max(struct(quality,
       -id))`-shaped via a window over the canonical URL).
    2. domain cap: among URL-winners, at most ``per_domain_cap`` docs
       per registered domain, best-first by (quality desc, id asc);
       ``domain_rank`` is the doc's 1-based rank within its domain.

    ``quality_col=None`` ranks by id alone (keep-first). Rows with a
    NULL url drop (no provenance → no curation decision)."""
    q = (
        F.col(quality_col)
        if quality_col is not None
        else F.lit(0).cast("long")
    )
    base = (
        df.where(F.col(url_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            q.alias("q"),
            canonicalize_url(url_col).alias("canonical_url"),
        )
        .withColumn(
            "registered_domain", registered_domain(url_host(F.col("canonical_url")))
        )
    )
    w_url = Window.partitionBy("canonical_url").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    winners = (
        base.withColumn("rn", F.row_number().over(w_url))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
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
