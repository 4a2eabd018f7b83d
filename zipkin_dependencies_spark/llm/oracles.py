"""DuckDB oracle SQL generators for the LLM-pipeline operators (llm/*).

Each generator emits ANSI-ish SQL that DuckDB runs over the same parquet
views the Spark queries read, computing the SAME values the Spark operators
produce — including float arithmetic order (sequential folds ⇔ ordered sums)
and hash choices (md5 variants, identical in both engines), so the driver's
value-hash gate can CONFIRM rather than merely row-count these operators.

All SQL is built from trusted compile-time ints/floats only (no user input).
"""

from __future__ import annotations

from .similarity import hyperplane_weights


def _shingles_cte(k: int = 3, where: str = "") -> str:
    """Distinct char k-grams per doc; texts shorter than k → empty list
    (DuckDB range(1, n<=0) is already empty — mirrors the Spark guard)."""
    return f"""
sh AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(range(1, greatest(length(text) - {k - 1}, 0) + 1),
                       i -> substring(text, CAST(i AS INT), {k}))) AS shingles
  FROM documents {where}
)"""


def dedupe_exact_sql() -> str:
    return """
SELECT md5(text) AS text_hash,
       min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
"""


def dedupe_against_sql(new_mod: int = 3, new_rem: int = 1) -> str:
    """Oracle for llm/dedup.py::dedupe_against with the driver fixture's
    corpus split: "new" = doc_id % new_mod = new_rem, "existing" = the rest."""
    return f"""
SELECT n.doc_id, n.text, n.lang, n.source, n.n_chars, md5(n.text) AS text_hash
FROM documents n
WHERE n.doc_id % {new_mod} = {new_rem}
  AND md5(n.text) NOT IN (
    SELECT DISTINCT md5(text) FROM documents
    WHERE doc_id % {new_mod} <> {new_rem}
  )
"""


def ngram_jaccard_sql(k: int = 3, threshold: float = 0.5, id_mod: int = 5) -> str:
    return f"""
WITH {_shingles_cte(k, f"WHERE doc_id % {id_mod} = 0").strip()},
ex AS (SELECT id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, n_inter, CAST(n_a AS INT) AS n_a, CAST(n_b AS INT) AS n_b,
       n_inter / (n_a + n_b - n_inter) AS jaccard
FROM inter WHERE n_inter / (n_a + n_b - n_inter) >= {threshold}
"""


def ngram_containment_sql(
    k: int = 3, threshold: float = 0.8, id_mod: int = 5
) -> str:
    """Twin of llm/dedup.py::ngram_containment_pairs — same shingle
    explode/self-join, containment = n_inter / min(n_a, n_b)."""
    return f"""
WITH {_shingles_cte(k, f"WHERE doc_id % {id_mod} = 0").strip()},
ex AS (SELECT id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, n_inter, CAST(n_a AS INT) AS n_a, CAST(n_b AS INT) AS n_b,
       n_inter / least(n_a, n_b) AS containment
FROM inter WHERE n_inter / least(n_a, n_b) >= {threshold}
"""


def prefix_filter_pairs_sql(
    k: int = 3, threshold: float = 0.6, id_mod: int = 5
) -> str:
    """Twin of llm/dedup.py::prefix_filter_pairs. The operator's
    exact-recall guarantee (no qualifying pair missed — SSJoin prefix
    filtering) makes the oracle the FULL all-pairs digest join: the twin
    deliberately omits the prefix optimization, so green proves both the
    Jaccard arithmetic AND that the prefix pruning dropped nothing."""
    return f"""
WITH {_shingles_cte(k, f"WHERE doc_id % {id_mod} = 0").strip()},
shx AS (
  SELECT id,
         list_distinct(list_transform(
           shingles, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT)) AS xs
  FROM sh WHERE len(shingles) > 0
),
ex AS (SELECT id, len(xs) AS n, unnest(xs) AS x FROM shx),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n AS n_a, b.n AS n_b,
         count(*) AS n_inter
  FROM ex a JOIN ex b ON a.x = b.x AND a.id < b.id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, CAST(n_inter AS INT) AS n_inter,
       CAST(n_a AS INT) AS n_a, CAST(n_b AS INT) AS n_b,
       round(n_inter / (n_a + n_b - n_inter), 9) AS jaccard9
FROM inter
WHERE round(n_inter / (n_a + n_b - n_inter), 9) >= {threshold}
"""


def inverted_index_sql(min_df: int = 20, max_df: int = 200) -> str:
    """Twin of llm/retrieval.py::inverted_index exploded to scalar rows:
    distinct (token, doc) pairs -> per-token df + doc's 0-based position in
    the doc_id-sorted posting list."""
    return f"""
WITH pairs AS (
  SELECT DISTINCT token, doc_id
  FROM (SELECT unnest({TEXT_TOKENS}) AS token, doc_id FROM documents)
),
idx AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) - 1 AS pos,
         count(*) OVER (PARTITION BY token) AS df
  FROM pairs
)
SELECT token, CAST(df AS BIGINT) AS df, CAST(pos AS INT) AS pos, doc_id
FROM idx WHERE df BETWEEN {min_df} AND {max_df}
"""


def _sig_cte(num_hashes: int, k: int, where: str) -> str:
    """Affine MinHash (shared constants with llm.dedup.affine_params):
    digest each shingle once (md5 → low 32 bits), then num_hashes affine
    maps (a·x + b) mod P with min-fold — the exact arithmetic the Spark
    'affine' path runs."""
    from .dedup import AFFINE_PRIME, affine_params

    elems = ", ".join(
        f"list_aggregate(list_transform(xs, x -> ({a} * x + {b}) % {AFFINE_PRIME}), 'min')"
        for a, b in affine_params(num_hashes)
    )
    return f"""{_shingles_cte(k, where).strip()},
shx AS (
  SELECT id,
         list_transform(shingles, s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS xs
  FROM sh WHERE len(shingles) > 0
),
sigt AS (
  SELECT id, [{elems}] AS sig
  FROM shx
)"""


def minhash_signatures_sql(num_hashes: int = 16, k: int = 3) -> str:
    return f"""
WITH {_sig_cte(num_hashes, k, "")}
SELECT id, CAST(u.j AS INT) AS hash_idx, sig[CAST(u.j AS INT) + 1] AS minhash
FROM sigt, (SELECT unnest(range(0, {num_hashes})) AS j) u
"""


def minhash_lsh_sql(
    num_hashes: int = 16, bands: int = 4, k: int = 3, id_mod: int = 5
) -> str:
    rpb = num_hashes // bands
    bucket = " || '|' || ".join(
        f"CAST(sig[b * {rpb} + {r + 1}] AS VARCHAR)" for r in range(rpb)
    )
    return f"""
WITH {_sig_cte(num_hashes, k, f"WHERE doc_id % {id_mod} = 0")},
buckets AS (
  SELECT id, sig, CAST(u.b AS INT) AS band, md5({bucket}) AS bucket
  FROM sigt, (SELECT unnest(range(0, {bands})) AS b) u
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sig_a, b.sig AS sig_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT id_a, id_b,
       len(list_filter(range(1, {num_hashes + 1}),
           i -> sig_a[CAST(i AS INT)] = sig_b[CAST(i AS INT)])) / {float(num_hashes)}
         AS est_jaccard
FROM pairs
"""


def simhash_sql() -> str:
    return r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                t -> t <> '')) AS tok
  FROM documents
),
hv AS (SELECT id, ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS h FROM toks),
votes AS (
  SELECT id, CAST(b.i AS INT) AS i,
         sum(CASE WHEN (h >> CAST(b.i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hv, (SELECT unnest(range(0, 64)) AS i) b
  GROUP BY 1, 2
),
sig AS (
  SELECT id,
         sum(CASE WHEN v > 0 THEN CAST(1::UBIGINT << i AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS s
  FROM votes GROUP BY 1
)
SELECT d.doc_id AS id,
       CAST(coalesce(
         CASE WHEN s.s >= 9223372036854775808 THEN s.s - 18446744073709551616
              ELSE s.s END, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sig s ON s.id = d.doc_id
"""


def simhash_band_candidates_sql(max_hamming: int = 3, n_bands: int = 4) -> str:
    """Twin of llm/dedup.py::simhash_band_candidates: the simhash_sql
    signature computation, then band split / band-equality self-join /
    popcount verify. DuckDB's ``>>`` on BIGINT is arithmetic like
    Spark's shiftright — masking after the shift makes the sign-fill
    bits irrelevant on both engines."""
    width = 64 // int(n_bands)
    mask = (1 << width) - 1
    return f"""
WITH sigs AS ({simhash_sql().strip()}),
bands AS (
  SELECT id, simhash, CAST(b.i AS INT) AS band,
         (simhash >> (CAST(b.i AS INT) * {width})) & {mask} AS band_key
  FROM sigs, (SELECT unnest(range(0, {int(n_bands)})) AS i) b
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {int(max_hamming)}
"""


def simhash_permuted_sql(max_hamming: int = 2) -> str:
    """EXACT-RECALL twin of llm/dedup.py::simhash_permuted_candidates:
    the brute-force all-pairs Hamming join over the simhash_sql
    signatures. Deliberately NOT a structural mirror of the 28-table
    permuted-prefix machinery — the operator's contract is exact recall
    at Hamming ≤ d, so output equality against the quadratic ground
    truth is the strongest possible check (the prefix_filter_pairs
    precedent)."""
    return f"""
WITH sigs AS ({simhash_sql().strip()})
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {int(max_hamming)}
"""


TEXT_TOKENS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"


def text_stats_sql() -> str:
    langs = {
        "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
        "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
        "fr": ("le", "la", "les", "et", "est", "dans", "que", "une"),
        "es": ("el", "la", "los", "y", "es", "en", "que", "una"),
    }
    score = {
        lang: "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in ms)
        + "], t)))"
        for lang, ms in langs.items()
    }
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    lang_case = (
        "CASE "
        + " ".join(f"WHEN best > 0 AND s_{lang} = best THEN '{lang}'" for lang in langs)
        + " ELSE 'und' END"
    )
    return rf"""
WITH base AS (
  SELECT doc_id, text, {TEXT_TOKENS} AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
),
scored AS (
  SELECT doc_id, text, n_chars, n_alpha,
         CAST(len(toks) AS INT) AS n_tokens,
         {", ".join(f"{sql} AS s_{lang}" for lang, sql in score.items())}
  FROM base
),
best AS (SELECT *, {best} AS best FROM scored)
SELECT doc_id,
       n_tokens,
       CAST(len(list_filter(string_split_regex(
         regexp_replace(text, '([0-9]+|[^\sA-Za-z0-9])', ' \1 ', 'g'), '\s+'),
         t -> t <> '')) AS INT) AS n_bpe_tokens,
       round(((CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
            + least(n_chars / 1000.0, 1.0)
            + (CASE WHEN (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) >= 3
                     AND (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) <= 12
                    THEN 1.0 ELSE 0.5 END)) / 3.0, 9) AS quality,
       {lang_case} AS lang,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM best
"""


def _flat_cte(dim: int, extra_where: str = "") -> str:
    return f"""
flat AS (
  SELECT vec_id AS id, CAST(u.i AS INT) AS i,
         CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) u
  {extra_where}
),
nrm AS (SELECT id, sqrt(sum(x * x ORDER BY i)) AS norm FROM flat GROUP BY 1)"""


def cosine_topk_sql(k: int = 5, dim: int = 64, query_max_id: int = 32) -> str:
    return f"""
WITH {_flat_cte(dim).strip()},
dots AS (
  SELECT a.id AS query_id, b.id AS neighbor_id, sum(a.x * b.x ORDER BY a.i) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.id <> b.id
  WHERE a.id < {query_max_id}
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / (qa.norm * qb.norm), 9) AS cosine
  FROM dots d
  JOIN nrm qa ON qa.id = d.query_id AND qa.norm > 0
  JOIN nrm qb ON qb.id = d.neighbor_id AND qb.norm > 0
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def quantized_cosine_topk_sql(
    k: int = 5, dim: int = 64, query_max_id: int = 32, levels: int = 127
) -> str:
    """Oracle for llm/similarity.py::quantized_cosine_topk: the same
    symmetric int8 quantization (scale = max|x|/levels, q = round(x/scale))
    then cosine on pure INTEGER dots — scales cancel, so the only float op
    is the final division and both engines agree to the last bit (integer
    sums are order-free; no fold-order caveat needed)."""
    return f"""
WITH {_flat_cte(dim).strip()},
scl AS (
  SELECT id, max(abs(x)) / {levels}.0 AS scale FROM flat GROUP BY 1
  HAVING max(abs(x)) > 0
),
qf AS (
  SELECT f.id, f.i, CAST(round(f.x / s.scale) AS BIGINT) AS q
  FROM flat f JOIN scl s USING (id)
),
qn AS (SELECT id, sum(q * q) AS n2 FROM qf GROUP BY 1 HAVING sum(q * q) > 0),
dots AS (
  SELECT a.id AS query_id, b.id AS neighbor_id, sum(a.q * b.q) AS dot
  FROM qf a JOIN qf b ON a.i = b.i AND a.id <> b.id
  WHERE a.id < {query_max_id}
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 9) AS cosine
  FROM dots d
  JOIN qn na ON na.id = d.query_id
  JOIN qn nb ON nb.id = d.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ivf_cosine_topk_sql(
    k: int = 5,
    centroid_stride: int = 97,
    n_probe: int = 4,
    dim: int = 64,
    query_max_id: int = 32,
) -> str:
    """Oracle for llm/similarity.py::ivf_cosine_topk: same deterministic
    centroid sample (id % stride = 0), same ordered-fold cosine arithmetic,
    same (negcos, cid) lexicographic assignment/probing."""
    return f"""
WITH {_flat_cte(dim).strip()},
cent AS (SELECT id FROM nrm WHERE id % {centroid_stride} = 0 AND norm > 0),
cd AS (
  SELECT a.id AS vid, b.id AS cid, sum(a.x * b.x ORDER BY a.i) AS dot
  FROM flat a JOIN flat b ON a.i = b.i JOIN cent ct ON b.id = ct.id
  GROUP BY 1, 2
),
cscore AS (
  SELECT cd.vid, cd.cid, -(cd.dot / (nv.norm * nc.norm)) AS negcos
  FROM cd
  JOIN nrm nv ON nv.id = cd.vid AND nv.norm > 0
  JOIN nrm nc ON nc.id = cd.cid
),
cells AS (
  SELECT vid, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY negcos, cid) AS rn
    FROM cscore
  ) WHERE rn = 1
),
probes AS (
  SELECT vid AS qid, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY negcos, cid) AS rn
    FROM cscore WHERE vid < {query_max_id}
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.qid, c.vid AS nid
  FROM probes p JOIN cells c ON c.cell = p.cell AND c.vid <> p.qid
),
dots AS (
  SELECT a.id AS qid, b.id AS nid, sum(a.x * b.x ORDER BY a.i) AS dot
  FROM flat a JOIN flat b ON a.i = b.i
  JOIN cand ON cand.qid = a.id AND cand.nid = b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.qid AS query_id, d.nid AS neighbor_id,
         round(d.dot / (na.norm * nb.norm), 9) AS cosine
  FROM dots d
  JOIN nrm na ON na.id = d.qid
  JOIN nrm nb ON nb.id = d.nid
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def embedding_near_dup_sql(threshold: float, dim: int = 64) -> str:
    return f"""
WITH {_flat_cte(dim).strip()},
dots AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.x * b.x ORDER BY a.i) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.id < b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.id_a, d.id_b, d.dot / (na.norm * nb.norm) AS cosine
  FROM dots d
  JOIN nrm na ON na.id = d.id_a AND na.norm > 0
  JOIN nrm nb ON nb.id = d.id_b AND nb.norm > 0
)
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM scored WHERE cosine >= {threshold}
"""


def embedding_near_dup_lsh_sql(
    threshold: float, n_planes: int = 8, dim: int = 64
) -> str:
    """Oracle for the LSH-bucketed near-dup (llm/dedup.py
    embedding_near_dup_lsh): identical hyperplane literals and fold order as
    the Spark side (shared with lsh_cosine_topk_sql), candidates = Hamming ≤ 1
    signature pairs, cosine verified on candidates only."""
    weights = hyperplane_weights(n_planes, dim)
    plane_dots = ", ".join(
        "sum(x * (CASE i "
        + " ".join(f"WHEN {i + 1} THEN {weights[p][i]!r}" for i in range(dim))
        + " END) ORDER BY i) AS d_{p}".format(p=p)
        for p in range(n_planes)
    )
    sig = " + ".join(f"(CASE WHEN d_{p} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(n_planes))
    probes = ", ".join(["CAST(sig AS INT)"] + [f"CAST(xor(sig, {1 << p}) AS INT)" for p in range(n_planes)])
    return f"""
WITH {_flat_cte(dim).strip()},
planes AS (
  SELECT id, {plane_dots}
  FROM flat GROUP BY id
),
sigs AS (SELECT id, CAST({sig} AS INT) AS sig FROM planes),
corpus AS (
  SELECT s.id, s.sig, n.norm FROM sigs s JOIN nrm n ON n.id = s.id AND n.norm > 0
),
probes AS (
  SELECT c.id, unnest([{probes}]) AS probe FROM corpus c
),
cand AS (
  SELECT DISTINCT p.id AS id_a, c.id AS id_b
  FROM probes p JOIN corpus c ON p.probe = c.sig AND p.id < c.id
),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.x * b.x ORDER BY a.i) AS dot
  FROM flat a JOIN flat b ON a.i = b.i
  JOIN cand ON cand.id_a = a.id AND cand.id_b = b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.id_a, d.id_b, d.dot / (na.norm * nb.norm) AS cosine
  FROM dots d
  JOIN nrm na ON na.id = d.id_a
  JOIN nrm nb ON nb.id = d.id_b
)
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM scored WHERE cosine >= {threshold}
"""


def decontaminate_sql(n: int = 13, min_hits: int = 1, bench_mod: int = 97) -> str:
    """Oracle for llm/contamination.py::decontaminate with the benchmark
    stand-in = documents where doc_id % bench_mod = 0 (same deterministic
    subset the Spark query uses). Digests are the shared 32-bit md5-prefix
    family (oracle_parity=True on the Spark side)."""
    grams = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n} + 2),"
        f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' '))"
        f" ELSE [] END"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {TEXT_TOKENS} AS toks FROM documents
),
grams AS (
  SELECT doc_id, {grams} AS gs FROM tok
),
bench AS (
  SELECT DISTINCT ('0x' || substring(md5(g.g), 1, 8))::BIGINT AS g
  FROM grams, unnest(gs) AS g(g) WHERE doc_id % {bench_mod} = 0
),
doc_grams AS (
  SELECT doc_id, ('0x' || substring(md5(g.g), 1, 8))::BIGINT AS g
  FROM (SELECT doc_id, list_distinct(gs) AS gs FROM grams), unnest(gs) AS g(g)
),
hits AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM doc_grams d JOIN bench b ON d.g = b.g
  GROUP BY 1
)
SELECT doc.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) >= {min_hits} AS contaminated
FROM documents doc LEFT JOIN hits h ON h.doc_id = doc.doc_id
"""


def repetition_score_sql() -> str:
    def grams(n: int) -> str:
        return (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"list_transform(range(1, len(toks) - {n} + 2),"
            f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' '))"
            f" ELSE [] END"
        )

    def dup_frac(arr: str) -> str:
        return (
            f"CASE WHEN len({arr}) > 0 THEN "
            f"round((len({arr}) - len(list_distinct({arr}))) / CAST(len({arr}) AS DOUBLE), 9) "
            f"ELSE 0.0 END"
        )

    return f"""
WITH tok AS (
  SELECT doc_id, {TEXT_TOKENS} AS toks FROM documents
),
g AS (
  SELECT doc_id, toks, {grams(2)} AS g2, {grams(3)} AS g3 FROM tok
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_words,
       {dup_frac('toks')} AS dup_word_frac,
       {dup_frac('g2')} AS dup_2gram_frac,
       {dup_frac('g3')} AS dup_3gram_frac
FROM g
"""


def scrub_pii_sql() -> str:
    """Oracle for llm/text.py::scrub_pii — identical patterns (Java-regex ∩
    RE2 subset), identical replacement order."""
    from .text import SCRUB_PATTERNS

    email, e_tok = SCRUB_PATTERNS["email"]
    url, u_tok = SCRUB_PATTERNS["url"]
    ipv4, i_tok = SCRUB_PATTERNS["ipv4"]
    clean = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{email}', '{e_tok}', 'g'), "
        f"'{url}', '{u_tok}', 'g'), "
        f"'{ipv4}', '{i_tok}', 'g')"
    )
    return f"""
SELECT doc_id,
       {clean} AS clean_text,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{url}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ips
FROM documents
"""


MEDIA_CTE = """
media AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         text,
         octet_length(encode(text)) AS nb
  FROM documents
)"""


def media_stats_sql(frame_bytes: int = 100) -> str:
    return f"""
WITH {MEDIA_CTE.strip()}
SELECT media_id, kind,
       CAST(nb AS INT) AS n_bytes,
       md5(text) AS digest,
       CAST(nb % 640 AS INT) AS width,
       CAST(nb % 480 AS INT) AS height,
       CAST(nb // {frame_bytes} AS INT) AS n_frames
FROM media
"""


def media_frames_sql(frame_bytes: int = 100, max_frames: int = 128) -> str:
    """Byte-slicing in the Spark stub == char-slicing here: the documents
    fixture is pure ASCII (asserted by test_llm_multimodal)."""
    return f"""
WITH {MEDIA_CTE.strip()},
f AS (
  SELECT media_id, CAST(u.i AS INT) AS frame_idx,
         substring(text, CAST(u.i AS INT) * {frame_bytes} + 1, {frame_bytes}) AS chunk
  FROM media, (SELECT unnest(range(0, {max_frames})) AS i) u
  WHERE u.i < nb // {frame_bytes}
)
SELECT media_id, frame_idx, md5(chunk) AS frame_digest,
       CAST(octet_length(encode(chunk)) AS INT) AS n_bytes
FROM f
"""


def media_features_sql(dim: int = 8) -> str:
    return f"""
WITH {MEDIA_CTE.strip()}
SELECT media_id, CAST(u.j AS INT) AS dim_idx,
       CAST(('0x' || substring(md5(CAST(u.j AS VARCHAR) || ':' || text), 1, 2))::INT
            / 255.0 AS REAL) AS value
FROM media, (SELECT unnest(range(0, {dim})) AS j) u
"""


def lsh_cosine_topk_sql(
    k: int = 5, n_planes: int = 8, dim: int = 64, query_max_id: int = 32
) -> str:
    """Oracle for the LSH-bucketed ANN: the hyperplane weights are the SAME
    decimal literals the Spark side ships (hyperplane_weights), and the dot
    folds run in the same element order, so signatures (sign decisions
    included) reproduce bit-for-bit."""
    weights = hyperplane_weights(n_planes, dim)
    plane_dots = ", ".join(
        "sum(x * (CASE i "
        + " ".join(f"WHEN {i + 1} THEN {weights[p][i]!r}" for i in range(dim))
        + " END) ORDER BY i) AS d_{p}".format(p=p)
        for p in range(n_planes)
    )
    sig = " + ".join(f"(CASE WHEN d_{p} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(n_planes))
    probes = ", ".join(["CAST(sig AS INT)"] + [f"CAST(xor(sig, {1 << p}) AS INT)" for p in range(n_planes)])
    return f"""
WITH {_flat_cte(dim).strip()},
planes AS (
  SELECT id, {plane_dots}
  FROM flat GROUP BY id
),
sigs AS (SELECT id, CAST({sig} AS INT) AS sig FROM planes),
corpus AS (
  SELECT s.id, s.sig, n.norm FROM sigs s JOIN nrm n ON n.id = s.id AND n.norm > 0
),
probes AS (
  SELECT c.id, c.norm, unnest([{probes}]) AS probe
  FROM corpus c WHERE c.id < {query_max_id}
),
cand AS (
  SELECT DISTINCT p.id AS query_id, c.id AS neighbor_id
  FROM probes p JOIN corpus c ON p.probe = c.sig AND p.id <> c.id
),
dots AS (
  SELECT a.id AS query_id, b.id AS neighbor_id, sum(a.x * b.x ORDER BY a.i) AS dot
  FROM flat a JOIN flat b ON a.i = b.i
  JOIN cand ON cand.query_id = a.id AND cand.neighbor_id = b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / (na.norm * nb.norm), 9) AS cosine
  FROM dots d
  JOIN nrm na ON na.id = d.query_id
  JOIN nrm nb ON nb.id = d.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# --- sampling / keep-best dedup / vocabulary ---------------------------------

SAMPLE_BUCKET = "('0x' || substr(md5(CAST({key} AS VARCHAR) || '{salt}'), 1, 8))::BIGINT"


def hash_sample_sql(fraction: float, salt: str = "") -> str:
    threshold = int(fraction * (1 << 32))
    bucket = SAMPLE_BUCKET.format(key="doc_id", salt=salt)
    return f"SELECT * FROM documents WHERE {bucket} < {threshold}"


def mixing_plan_sql(weights: dict[str, float], token_budget: int) -> str:
    """Twin of llm/sampling.py::mixing_plan — same integer token sums, the
    same single multiply/divide, round-9."""
    cases = " ".join(
        f"WHEN '{v}' THEN CAST({float(w)} AS DOUBLE)"
        for v, w in sorted(weights.items())
    )
    return f"""
WITH agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({TEXT_TOKENS})) AS BIGINT) AS n_tokens,
         CASE source {cases} ELSE NULL END AS weight
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens, weight,
       CAST(floor(weight * {int(token_budget)}) AS BIGINT) AS target_tokens,
       round(CAST(floor(weight * {int(token_budget)}) AS DOUBLE) / n_tokens, 9)
         AS epochs9,
       round(least(1.0,
             CAST(floor(weight * {int(token_budget)}) AS DOUBLE) / n_tokens), 9)
         AS keep_fraction9
FROM agg WHERE weight IS NOT NULL
"""


def stratified_hash_sample_sql(
    fractions: dict[str, float],
    strata_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> str:
    bucket = SAMPLE_BUCKET.format(key="doc_id", salt=salt)
    cases = " ".join(
        f"WHEN {strata_col} = '{value}' THEN {int(fraction * (1 << 32))}"
        for value, fraction in sorted(fractions.items())
    )
    default = int(default_fraction * (1 << 32))
    return f"SELECT * FROM documents WHERE {bucket} < (CASE {cases} ELSE {default} END)"


def hash_split_sql(weights: dict[str, float], salt: str = "split") -> str:
    total = sum(weights.values())
    bucket = SAMPLE_BUCKET.format(key="doc_id", salt=salt)
    names = sorted(weights)
    cases, upper = [], 0.0
    for name in names[:-1]:
        upper += weights[name] / total
        cases.append(f"WHEN {bucket} < {int(upper * (1 << 32))} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"SELECT *, {case} AS split FROM documents"


def dedupe_keep_best_sql() -> str:
    # fingerprint + quality formulas mirror text_stats_sql / llm.text exactly
    return r"""
WITH scored AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
         round(((CASE WHEN length(text) > 0
                      THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           / length(text) ELSE 0.0 END)
              + least(length(text) / 1000.0, 1.0)
              + (CASE WHEN (CASE WHEN len(""" + TEXT_TOKENS + r""") > 0
                            THEN length(text) / len(""" + TEXT_TOKENS + r""")
                            ELSE 0.0 END) BETWEEN 3 AND 12
                      THEN 1.0 ELSE 0.5 END)) / 3.0, 9) AS quality
  FROM documents
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY quality DESC, doc_id ASC) AS rank,
         count(*) OVER (PARTITION BY fingerprint) AS n_copies
  FROM scored
)
SELECT doc_id AS keep_id, fingerprint, quality,
       CAST(n_copies AS BIGINT) AS n_copies
FROM ranked WHERE rank = 1
"""


def top_k_tokens_sql(k: int = 100) -> str:
    return f"""
WITH tok AS (
  SELECT unnest({TEXT_TOKENS}) AS token FROM documents
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM tok GROUP BY token
)
SELECT token, n_occurrences,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS BIGINT)
         AS rank
FROM counts
ORDER BY rank LIMIT {k}
"""


def curation_pipeline_sql(
    min_quality: float = 0.4,
    lang: str = "en",
    sample_fraction: float = 0.5,
    salt: str = "",
) -> str:
    """Composed oracle for llm/pipeline.py::curate — the text_stats quality /
    language formulas, the keep-best window, and the sampling bucket chained
    in one statement (formulas kept in lockstep with the standalone oracles)."""
    langs = {
        "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
        "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
        "fr": ("le", "la", "les", "et", "est", "dans", "que", "une"),
        "es": ("el", "la", "los", "y", "es", "en", "que", "una"),
    }
    score = {
        lg: "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in ms)
        + "], t)))"
        for lg, ms in langs.items()
    }
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    lang_case = (
        "CASE "
        + " ".join(f"WHEN best > 0 AND s_{lg} = best THEN '{lg}'" for lg in langs)
        + " ELSE 'und' END"
    )
    threshold = int(sample_fraction * (1 << 32))
    bucket = SAMPLE_BUCKET.format(key="keep_id", salt=salt)
    return rf"""
WITH base AS (
  SELECT doc_id, text, {TEXT_TOKENS} AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
scored0 AS (
  SELECT doc_id, fingerprint, n_chars, n_alpha,
         CAST(len(toks) AS INT) AS n_tokens,
         {", ".join(f"{sql} AS s_{lg}" for lg, sql in score.items())}
  FROM base
),
bested AS (SELECT *, {best} AS best FROM scored0),
scored AS (
  SELECT doc_id, fingerprint,
         round(((CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
              + least(n_chars / 1000.0, 1.0)
              + (CASE WHEN (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) >= 3
                       AND (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) <= 12
                      THEN 1.0 ELSE 0.5 END)) / 3.0, 9) AS quality,
         {lang_case} AS lang_id
  FROM bested
),
gated AS (
  SELECT * FROM scored WHERE quality >= {min_quality} AND lang_id = '{lang}'
),
ranked AS (
  SELECT doc_id, fingerprint, quality,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY quality DESC, doc_id ASC) AS rank,
         count(*) OVER (PARTITION BY fingerprint) AS n_copies
  FROM gated
),
kept AS (
  SELECT doc_id AS keep_id, fingerprint, quality,
         CAST(n_copies AS BIGINT) AS n_copies
  FROM ranked WHERE rank = 1
)
SELECT * FROM kept WHERE {bucket} < {threshold}
"""


def curate_v2_sql(
    min_quality: float = 0.4,
    lang: str = "en",
    max_dup_3gram: float = 0.5,
    n: int = 13,
    bench_mod: int = 97,
    weights: dict[str, float] | None = None,
) -> str:
    """Composed oracle for llm/pipeline.py::curate_v2: scrub → quality/
    language/repetition gate → decontamination anti-join → keep-best window
    → hash split, all formulas kept in lockstep with the standalone
    oracles (scrub_pii_sql, text_stats_sql, repetition_score_sql,
    decontaminate_sql, dedupe_keep_best_sql, hash_split_sql)."""
    from .text import SCRUB_PATTERNS

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    email, e_tok = SCRUB_PATTERNS["email"]
    url, u_tok = SCRUB_PATTERNS["url"]
    ipv4, i_tok = SCRUB_PATTERNS["ipv4"]
    clean = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{email}', '{e_tok}', 'g'), "
        f"'{url}', '{u_tok}', 'g'), "
        f"'{ipv4}', '{i_tok}', 'g')"
    )
    langs = {
        "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
        "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
        "fr": ("le", "la", "les", "et", "est", "dans", "que", "une"),
        "es": ("el", "la", "los", "y", "es", "en", "que", "una"),
    }
    score = {
        lg: "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in ms)
        + "], t)))"
        for lg, ms in langs.items()
    }
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    lang_case = (
        "CASE "
        + " ".join(f"WHEN best > 0 AND s_{lg} = best THEN '{lg}'" for lg in langs)
        + " ELSE 'und' END"
    )
    g3 = (
        f"CASE WHEN len(toks) >= 3 THEN "
        f"list_transform(range(1, len(toks) - 1),"
        f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 2 AS INT)), ' '))"
        f" ELSE [] END"
    )
    gn = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n} + 2),"
        f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' '))"
        f" ELSE [] END"
    )
    dup3 = (
        "CASE WHEN len(g3) > 0 THEN "
        "round((len(g3) - len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE), 9) "
        "ELSE 0.0 END"
    )
    split_bucket = SAMPLE_BUCKET.format(key="keep_id", salt="split")
    total = sum(weights.values())
    names = sorted(weights)
    cases, upper = [], 0.0
    for name in names[:-1]:
        upper += weights[name] / total
        cases.append(f"WHEN {split_bucket} < {int(upper * (1 << 32))} THEN '{name}'")
    split_case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return rf"""
WITH dc AS (
  SELECT doc_id, {clean} AS text FROM documents
),
base AS (
  SELECT doc_id, text, {TEXT_TOKENS} AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM dc
),
scored0 AS (
  SELECT doc_id, text, toks, n_chars, n_alpha,
         CAST(len(toks) AS INT) AS n_tokens,
         {g3} AS g3,
         {", ".join(f"{sql} AS s_{lg}" for lg, sql in score.items())}
  FROM base
),
bested AS (SELECT *, {best} AS best FROM scored0),
gated AS (
  SELECT doc_id, text, toks,
         round(((CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
              + least(n_chars / 1000.0, 1.0)
              + (CASE WHEN (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) >= 3
                       AND (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) <= 12
                      THEN 1.0 ELSE 0.5 END)) / 3.0, 9) AS quality
  FROM bested
  WHERE round(((CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
              + least(n_chars / 1000.0, 1.0)
              + (CASE WHEN (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) >= 3
                       AND (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) <= 12
                      THEN 1.0 ELSE 0.5 END)) / 3.0, 9) >= {min_quality}
    AND {lang_case} = '{lang}'
    AND {dup3} <= {max_dup_3gram}
),
bench_grams AS (
  SELECT DISTINCT ('0x' || substring(md5(g.g), 1, 8))::BIGINT AS g
  FROM (SELECT {gn} AS gs
        FROM (SELECT {TEXT_TOKENS} AS toks FROM dc
              WHERE doc_id % {bench_mod} = 0)) b,
       unnest(b.gs) AS g(g)
),
dirty AS (
  SELECT DISTINCT gt.doc_id
  FROM (SELECT doc_id, list_distinct({gn}) AS gs FROM gated) gt,
       unnest(gt.gs) AS g(g)
  WHERE ('0x' || substring(md5(g.g), 1, 8))::BIGINT IN (SELECT g FROM bench_grams)
),
kept AS (
  SELECT g.* FROM gated g LEFT JOIN dirty d ON d.doc_id = g.doc_id
  WHERE d.doc_id IS NULL
),
ranked AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
         quality,
         row_number() OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
           ORDER BY quality DESC, doc_id ASC) AS rank,
         count(*) OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
         ) AS n_copies
  FROM kept
),
bestrows AS (
  SELECT doc_id AS keep_id, fingerprint, quality,
         CAST(n_copies AS BIGINT) AS n_copies
  FROM ranked WHERE rank = 1
)
SELECT keep_id, fingerprint, quality, n_copies, {split_case} AS split
FROM bestrows
"""


def near_dup_clusters_lsh_sql(
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    id_mod: int = 5,
) -> str:
    """Oracle for the LSH-routed clustering (llm/cluster.py
    near_dup_clusters(candidates='lsh')): affine-MinHash banding proposes
    candidate pairs (same arithmetic as minhash_lsh_sql), exact Jaccard via
    list_intersect verifies ONLY those pairs, recursive transitive closure
    assigns component = min reachable id. Matches the Spark plan stage for
    stage, so the value-hash gate confirms the composition end to end."""
    rpb = num_hashes // bands
    bucket = " || '|' || ".join(
        f"CAST(sig[b * {rpb} + {r + 1}] AS VARCHAR)" for r in range(rpb)
    )
    return f"""
WITH RECURSIVE {_sig_cte(num_hashes, k, f"WHERE doc_id % {id_mod} = 0")},
buckets AS (
  SELECT id, CAST(u.b AS INT) AS band, md5({bucket}) AS bucket
  FROM sigt, (SELECT unnest(range(0, {bands})) AS b) u
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
dig AS (
  -- the verify side intersects the SAME 32-bit shingle digests the
  -- signature CTE derives (list_distinct: set semantics, as Spark's
  -- array_intersect/array_distinct)
  SELECT id, list_distinct(xs) AS xs FROM shx
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN dig sa ON sa.id = c.id_a
  JOIN dig sb ON sb.id = c.id_b
  WHERE len(list_intersect(sa.xs, sb.xs))
        / (len(sa.xs) + len(sb.xs) - len(list_intersect(sa.xs, sb.xs)))
          >= {threshold}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM verified
  UNION ALL
  SELECT id_b, id_a FROM verified
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT d.doc_id AS id, coalesce(c.component, d.doc_id) AS component
FROM (SELECT doc_id FROM documents WHERE doc_id % {id_mod} = 0) d
LEFT JOIN comp c ON c.id = d.doc_id
"""


def near_dup_clusters_sql(k: int = 3, threshold: float = 0.5, id_mod: int = 5) -> str:
    """Recursive transitive closure over the exact-Jaccard pair graph;
    component = min reachable id (incl. self). Pair CTEs mirror
    ngram_jaccard_sql exactly."""
    return f"""
WITH RECURSIVE {_shingles_cte(k, f"WHERE doc_id % {id_mod} = 0").strip()},
ex AS (SELECT id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2, 3, 4
),
pairs AS (
  SELECT id_a, id_b FROM inter
  WHERE n_inter / (n_a + n_b - n_inter) >= {threshold}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT d.doc_id AS id, coalesce(c.component, d.doc_id) AS component
FROM (SELECT doc_id FROM documents WHERE doc_id % {id_mod} = 0) d
LEFT JOIN comp c ON c.id = d.doc_id
"""


QUALITY_SQL = r"""round(((CASE WHEN length(text) > 0
                      THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           / length(text) ELSE 0.0 END)
              + least(length(text) / 1000.0, 1.0)
              + (CASE WHEN (CASE WHEN len(""" + TEXT_TOKENS + r""") > 0
                            THEN length(text) / len(""" + TEXT_TOKENS + r""")
                            ELSE 0.0 END) BETWEEN 3 AND 12
                      THEN 1.0 ELSE 0.5 END)) / 3.0, 9)"""


def quantile_gate_sql(p: float = 0.75, group_col: str = "source") -> str:
    """Oracle for llm/sampling.py::quantile_gate (exact mode): DuckDB's
    ``quantile_cont`` is the same linear-interpolation percentile as
    Spark's ``percentile``, over the identical round-9 quality scores."""
    return f"""
WITH scored AS (
  SELECT doc_id, {group_col}, {QUALITY_SQL} AS score FROM documents
),
thr AS (
  SELECT {group_col}, quantile_cont(score, {p}) AS threshold
  FROM scored GROUP BY {group_col}
)
SELECT s.doc_id, s.{group_col}, s.score, round(t.threshold, 9) AS threshold
FROM scored s JOIN thr t USING ({group_col})
WHERE s.score >= t.threshold
"""


def group_hash_topn_sql(n: int, group_col: str = "source", salt: str = "") -> str:
    """Oracle for llm/sampling.py::group_hash_topn: row_number over the
    identical salted-md5 order."""
    bucket = SAMPLE_BUCKET.format(key="doc_id", salt=salt)
    return f"""
WITH ranked AS (
  SELECT doc_id, {group_col},
         CAST(row_number() OVER (PARTITION BY {group_col}
              ORDER BY {bucket}, doc_id) AS INT) AS sample_rank
  FROM documents
)
SELECT doc_id, {group_col}, sample_rank FROM ranked WHERE sample_rank <= {n}
"""


def label_centroids_sql(scale_bits: int = 20, dim: int = 64) -> str:
    """Oracle for llm/similarity.py::label_centroids: the same integer
    scaling (round(x·2^bits) summed exactly) over the unnested embedding."""
    scale = 1 << scale_bits
    return f"""
WITH flat AS (
  SELECT label, CAST(u.i - 1 AS INT) AS i,
         CAST(round(CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) * {scale}.0)
              AS BIGINT) AS qx
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) u
)
SELECT label,
       i,
       round((CAST(sum(qx) AS DOUBLE) / count(*)) / {scale}.0, 9) AS c,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM flat GROUP BY label, i
"""


def unigram_surprisal_sql() -> str:
    """Oracle for llm/text.py::unigram_surprisal: identical integer-scaled
    ln sums (ln parity with Spark's F.log established by token_idf)."""
    return f"""
WITH occ AS (
  SELECT doc_id, unnest({TEXT_TOKENS}) AS token FROM documents
),
vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY 1),
total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
scored AS (
  SELECT o.doc_id,
         CAST(round(ln(v.cnt / CAST(t.total AS DOUBLE)) * 1000000000)
              AS BIGINT) AS q9
  FROM occ o JOIN vocab v USING (token), total t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(-(CAST(sum(q9) AS DOUBLE) / count(*)) / 1e9, 6) AS surprisal6
FROM scored GROUP BY doc_id
"""


def bigram_surprisal_sql() -> str:
    """Oracle for llm/text.py::bigram_surprisal: identical 1-based bigram
    extraction (DuckDB list indexing == Spark element_at), identical
    integer-scaled ln sums."""
    return f"""
WITH toked AS (SELECT doc_id, {TEXT_TOKENS} AS t FROM documents),
occ AS (
  SELECT doc_id, u.bg['prev'] AS prev, u.bg['cur'] AS cur
  FROM toked,
       unnest(list_transform(range(1, len(t)),
              i -> {{'prev': t[i], 'cur': t[i + 1]}})) AS u(bg)
),
lm AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM occ GROUP BY 1, 2),
prefix AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM lm GROUP BY 1),
scored AS (
  SELECT o.doc_id,
         CAST(round(ln(l.c2 / CAST(p.c1 AS DOUBLE)) * 1000000000)
              AS BIGINT) AS q9
  FROM occ o JOIN lm l USING (prev, cur) JOIN prefix p USING (prev)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-(CAST(sum(q9) AS DOUBLE) / count(*)) / 1e9, 6)
         AS bigram_surprisal6
FROM scored GROUP BY doc_id
"""


def normalized_text_sql() -> str:
    """Oracle for llm/text.py::normalize_text surfaced as digests."""
    return r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
       CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
            AS BIGINT) AS n_chars_norm
FROM documents
"""


def corpus_stats_sql() -> str:
    """Oracle for llm/text.py::corpus_stats: GROUP BY ROLLUP with the same
    integer-scaled quality sum (float sums are order-dependent; the scaled
    long sum is exact in both engines)."""
    return f"""
WITH base AS (
  SELECT source, lang,
         CAST(len({TEXT_TOKENS}) AS BIGINT) AS toks,
         CAST(round({QUALITY_SQL} * 1000000000) AS BIGINT) AS q9
  FROM documents
)
SELECT coalesce(source, '(all)') AS source,
       coalesce(lang, '(all)') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       round(CAST(sum(q9) AS DOUBLE) / count(*) / 1e9, 9) AS mean_quality
FROM base
GROUP BY ROLLUP (source, lang)
"""


def top_docs_per_group_sql(k: int = 5, group_col: str = "source") -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, {group_col}, {QUALITY_SQL} AS quality FROM documents
)
SELECT doc_id, {group_col}, quality, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY {group_col}
            ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def token_idf_sql() -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({TEXT_TOKENS})) AS token
  FROM documents
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       round(ln((SELECT count(*) FROM documents) / CAST(count(*) AS DOUBLE)), 9)
         AS idf
FROM tok GROUP BY token
"""


def dup_ngram_coverage_sql(n: int = 5) -> str:
    """Oracle for llm/dedup.py::dup_ngram_coverage (oracle_parity=True):
    distinct word n-grams per doc, 32-bit md5-prefix digests, per-gram doc
    counts, per-doc duplicated fraction."""
    grams = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n} + 2),"
        f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' '))"
        f" ELSE [] END"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {TEXT_TOKENS} AS toks FROM documents
),
dg AS (
  SELECT doc_id, ('0x' || substring(md5(g.g), 1, 8))::BIGINT AS g
  FROM (SELECT doc_id, list_distinct({grams}) AS gs FROM tok), unnest(gs) AS g(g)
),
cnt AS (
  SELECT g, count(*) AS n_docs FROM dg GROUP BY 1
),
per AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
  FROM dg d JOIN cnt c ON d.g = c.g
  GROUP BY 1
)
SELECT doc.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_dup_grams, 0) AS n_dup_grams,
       CASE WHEN coalesce(p.n_grams, 0) > 0
            THEN round(p.n_dup_grams / CAST(p.n_grams AS DOUBLE), 9)
            ELSE 0.0 END AS dup_frac
FROM documents doc LEFT JOIN per p ON p.doc_id = doc.doc_id
"""


def doc_novelty_sql(n: int = 3) -> str:
    """Oracle for llm/text.py::doc_novelty (oracle_parity=True): distinct
    word n-grams per doc, 32-bit md5-prefix digests, per-gram FIRST
    appearance = min doc_id, per-doc novel fraction."""
    grams = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n} + 2),"
        f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' '))"
        f" ELSE [] END"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {TEXT_TOKENS} AS toks FROM documents
),
dg AS (
  SELECT doc_id, ('0x' || substring(md5(g.g), 1, 8))::BIGINT AS g
  FROM (SELECT doc_id, list_distinct({grams}) AS gs FROM tok), unnest(gs) AS g(g)
),
first AS (
  SELECT g, min(doc_id) AS first_id FROM dg GROUP BY 1
),
per AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(CASE WHEN d.doc_id = f.first_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM dg d JOIN first f ON d.g = f.g
  GROUP BY 1
)
SELECT doc.doc_id,
       coalesce(p.n_ngrams, 0) AS n_ngrams,
       coalesce(p.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(p.n_ngrams, 0) > 0
            THEN round(p.n_novel / CAST(p.n_ngrams AS DOUBLE), 9)
            ELSE 0.0 END AS novelty9
FROM documents doc LEFT JOIN per p ON p.doc_id = doc.doc_id
"""


def packed_chunk_spans_sql(capacity: int = 256) -> str:
    """Oracle for q_packed_chunk_spans — the naive SINGLE-window global
    prefix sum the distributed two-phase operator must equal."""
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len({TEXT_TOKENS}) AS BIGINT) AS n_tokens
  FROM documents
),
ps AS (
  -- CAST the windowed sum: DuckDB widens sum(BIGINT) OVER to HUGEINT,
  -- which the driver's value hasher represents differently than Spark's
  -- LONG (the r07 red row). assign_shards_sql has always cast this; the
  -- //-derived chunk columns inherit int128 too, so cast all three.
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM base
)
SELECT doc_id, n_tokens, cum_before,
       CASE WHEN n_tokens > 0
            THEN CAST(cum_before // {capacity} AS BIGINT) END AS start_chunk,
       CASE WHEN n_tokens > 0
            THEN CAST((cum_before + n_tokens - 1) // {capacity} AS BIGINT)
            END AS end_chunk
FROM ps
"""


def semantic_dedup_sql(
    threshold: float = 0.8,
    rounds: int = 2,
    stride: int | None = None,
    scale_bits: int = 20,
    dim: int = 64,
) -> str:
    """Oracle for llm/dedup.py::semantic_dedup: the kmeans_assign twin as
    a subquery CTE, then within-cluster ordered-sum cosine on id-ordered
    pairs, drop = exists lower-id in-cluster neighbor with cos9 ≥ t.
    ``stride=None`` mirrors the Spark auto_stride default — the SQL
    derives ceil(sqrt(count(*))) itself (bit-identical for N < 2^52,
    see kmeans.auto_stride)."""
    from .kmeans import kmeans_assign_sql

    stride_sql: int | str = (
        stride
        if stride is not None
        else "(SELECT GREATEST(1, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))"
        " FROM embeddings)"
    )
    return f"""
WITH assign AS (
  {kmeans_assign_sql(rounds=rounds, stride=stride_sql, scale_bits=scale_bits, dim=dim)}
),
flat AS (
  SELECT vec_id AS id, CAST(u.i AS INT) - 1 AS i,
         CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) u
),
norms AS (
  SELECT id, sqrt(sum(x * x ORDER BY i)) AS nrm FROM flat GROUP BY id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
cos AS (
  SELECT p.id_a, p.id_b,
         round(sum(fa.x * fb.x ORDER BY fa.i) / (na.nrm * nb.nrm), 9) AS c9
  FROM pairs p
  JOIN flat fa ON fa.id = p.id_a
  JOIN flat fb ON fb.id = p.id_b AND fb.i = fa.i
  -- norm > 0 mirrors the Spark side's _with_norm filter: zero-norm
  -- vectors never enter pair scoring (r06-advice: an unguarded 0-norm
  -- divides to NaN/inf here and can flip keep between engines)
  JOIN norms na ON na.id = p.id_a AND na.nrm > 0
  JOIN norms nb ON nb.id = p.id_b AND nb.nrm > 0
  GROUP BY p.id_a, p.id_b, na.nrm, nb.nrm
),
dup AS (
  SELECT id_b AS vec_id, max(c9) AS max_cos9
  FROM cos WHERE c9 >= {threshold}
  GROUP BY 1
)
SELECT a.vec_id, a.cluster, d.max_cos9 IS NULL AS keep, d.max_cos9
FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id
"""


def assign_shards_sql(token_budget: int = 4096, salt: str = "shard") -> str:
    """Oracle for llm/packing.py::assign_shards — the SINGLE-window global
    prefix-sum formulation (fine in DuckDB at oracle scale; the Spark side
    decomposes it into bucket offsets + per-bucket windows, bit-identical
    because bucket ranges are hash-order ranges)."""
    h = SAMPLE_BUCKET.format(key="doc_id", salt=salt)
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({TEXT_TOKENS}) AS BIGINT) AS n_tokens,
         {h} AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS s
  FROM t
)
SELECT doc_id, n_tokens, CAST(s // {token_budget} AS BIGINT) AS shard FROM c
"""


def dedupe_near_keep_best_sql(
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    id_mod: int = 5,
) -> str:
    """Oracle for llm/cluster.py::dedupe_near_keep_best — the full
    LSH-routed clustering oracle as a subquery, then one election per
    component (highest quality, ties → smallest id) via a window."""
    inner = near_dup_clusters_lsh_sql(
        num_hashes=num_hashes, bands=bands, k=k, threshold=threshold, id_mod=id_mod
    )
    return f"""
WITH comp AS ({inner}),
q AS (
  SELECT doc_id AS id, {QUALITY_SQL} AS q
  FROM documents WHERE doc_id % {id_mod} = 0
),
j AS (
  SELECT c.component, c.id, q.q FROM comp c JOIN q ON q.id = c.id
),
r AS (
  SELECT component, id, q,
         row_number() OVER (PARTITION BY component ORDER BY q DESC, id ASC) AS rn,
         count(*) OVER (PARTITION BY component) AS n_members
  FROM j
)
SELECT component, id AS keep_id, CAST(n_members AS BIGINT) AS n_members,
       q AS quality
FROM r WHERE rn = 1
"""


def token_fertility_sql() -> str:
    """DuckDB twin of text.token_fertility (documents table, lang group)."""
    return rf"""
WITH t AS (
  SELECT lang,
         CAST(len({TEXT_TOKENS}) AS BIGINT) AS ws,
         CAST(len(list_filter(string_split_regex(
           regexp_replace(text, '([0-9]+|[^\sA-Za-z0-9])', ' \1 ', 'g'),
           '\s+'), x -> x <> '')) AS BIGINT) AS bpe
  FROM documents
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS ws_tokens,
         CAST(sum(bpe) AS BIGINT) AS bpe_tokens
  FROM t GROUP BY 1
)
SELECT lang, n_docs, ws_tokens, bpe_tokens,
       CASE WHEN ws_tokens > 0
            THEN round(CAST(bpe_tokens AS DOUBLE) / ws_tokens, 9) END
         AS fertility9
FROM agg
"""


def language_confusion_sql() -> str:
    """DuckDB twin of the language-ID confusion matrix (labeled ``lang``
    column vs the marker-word ``language_id`` prediction). The predictor
    SQL is the same construction text_stats_sql uses — kept in lockstep
    with text.LANG_MARKERS."""
    from .text import LANG_MARKERS

    score = {
        lang: "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in ms)
        + "], t)))"
        for lang, ms in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN best > 0 AND s_{lang} = best THEN '{lang}'"
            for lang in LANG_MARKERS
        )
        + " ELSE 'und' END"
    )
    return rf"""
WITH base AS (
  SELECT lang AS lang_label, {TEXT_TOKENS} AS toks FROM documents
),
scored AS (
  SELECT lang_label,
         {", ".join(f"{sql} AS s_{lang}" for lang, sql in score.items())}
  FROM base
),
best AS (SELECT *, {best} AS best FROM scored)
SELECT lang_label, {lang_case} AS lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs
FROM best GROUP BY 1, 2
"""


def curate_v3_sql(
    lang: str = "en",
    n: int = 13,
    bench_mod: int = 97,
    weights: dict[str, float] | None = None,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    """Composed oracle for llm/pipeline.py::curate_v3 — curate_v2_sql's
    structure with the heuristic gate swapped for the Gopher rule set
    (kept in lockstep with quality.gopher_quality_sql)."""
    from .quality import _STOP_SQL as stop_sql
    from .text import SCRUB_PATTERNS

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    email, e_tok = SCRUB_PATTERNS["email"]
    url, u_tok = SCRUB_PATTERNS["url"]
    ipv4, i_tok = SCRUB_PATTERNS["ipv4"]
    clean = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{email}', '{e_tok}', 'g'), "
        f"'{url}', '{u_tok}', 'g'), "
        f"'{ipv4}', '{i_tok}', 'g')"
    )
    from .text import LANG_MARKERS

    score = {
        lg: "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in ms)
        + "], t)))"
        for lg, ms in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in LANG_MARKERS) + ")"
    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN best > 0 AND s_{lg} = best THEN '{lg}'"
            for lg in LANG_MARKERS
        )
        + " ELSE 'und' END"
    )
    # NOTE lockstep hazard (three curate oracles share this skeleton):
    # the scrub chain, n-gram digest ('0x'||substring(md5...)), fingerprint
    # expression, and split-bucket CASE below also appear in
    # curation_pipeline_sql and curate_v2_sql — a fix to any shared piece
    # must land in all three (each is pinned by its own gated query, so a
    # drift fails the replica gate, but fix them together).
    gn = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n} + 2),"
        f" i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {n - 1} AS INT)), ' '))"
        f" ELSE [] END"
    )
    split_bucket = SAMPLE_BUCKET.format(key="keep_id", salt="split")
    total = sum(weights.values())
    names = sorted(weights)
    cases, upper = [], 0.0
    for name in names[:-1]:
        upper += weights[name] / total
        cases.append(f"WHEN {split_bucket} < {int(upper * (1 << 32))} THEN '{name}'")
    split_case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return rf"""
WITH dc AS (
  SELECT doc_id, {clean} AS text FROM documents
),
base AS (
  SELECT doc_id, text, {TEXT_TOKENS} AS toks,
         length(text) AS n_chars,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
  FROM dc
),
m AS (
  SELECT doc_id, text, toks, n_chars,
         CAST(len(toks) AS BIGINT) AS n_words,
         list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS sum_len,
         n_hash, n_ell,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha_words,
         CAST(len(list_intersect(list_distinct(toks), {stop_sql})) AS BIGINT)
           AS stop_hits,
         {", ".join(f"{sql} AS s_{lg}" for lg, sql in score.items())}
  FROM base
),
bested AS (SELECT *, {best} AS best FROM m),
gated AS (
  SELECT doc_id, text, toks
  FROM bested
  WHERE coalesce(
          n_words >= {min_words} AND n_words <= {max_words}
          AND sum_len / n_words >= {min_mean_word_len}
          AND sum_len / n_words <= {max_mean_word_len}
          AND (n_hash + n_ell) / n_words < {max_symbol_ratio}
          AND n_alpha_words / n_words >= {min_alpha_word_frac}
          AND stop_hits >= {min_stop_hits},
          false)
    AND {lang_case} = '{lang}'
),
bench_grams AS (
  SELECT DISTINCT ('0x' || substring(md5(g.g), 1, 8))::BIGINT AS g
  FROM (SELECT {gn} AS gs
        FROM (SELECT {TEXT_TOKENS} AS toks FROM dc
              WHERE doc_id % {bench_mod} = 0)) b,
       unnest(b.gs) AS g(g)
),
dirty AS (
  SELECT DISTINCT gt.doc_id
  FROM (SELECT doc_id, list_distinct({gn}) AS gs FROM gated) gt,
       unnest(gt.gs) AS g(g)
  WHERE ('0x' || substring(md5(g.g), 1, 8))::BIGINT IN (SELECT g FROM bench_grams)
),
kept AS (
  SELECT g.doc_id, g.text,
         length(g.text) AS n_chars,
         length(regexp_replace(g.text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         CAST(len(g.toks) AS INT) AS n_tokens
  FROM gated g LEFT JOIN dirty d ON d.doc_id = g.doc_id
  WHERE d.doc_id IS NULL
),
scored AS (
  SELECT doc_id, text,
         round(((CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
              + least(n_chars / 1000.0, 1.0)
              + (CASE WHEN (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) >= 3
                       AND (CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END) <= 12
                      THEN 1.0 ELSE 0.5 END)) / 3.0, 9) AS quality
  FROM kept
),
ranked AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
         quality,
         row_number() OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
           ORDER BY quality DESC, doc_id ASC) AS rank,
         count(*) OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
         ) AS n_copies
  FROM scored
),
bestrows AS (
  SELECT doc_id AS keep_id, fingerprint, quality,
         CAST(n_copies AS BIGINT) AS n_copies
  FROM ranked WHERE rank = 1
)
SELECT keep_id, fingerprint, quality, n_copies, {split_case} AS split
FROM bestrows
"""


def dedupe_near_against_sql(
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    new_mod: int = 7,
    new_rem: int = 2,
    negate_new: bool = False,
) -> str:
    """Oracle for dedup.dedupe_near_against: affine-MinHash banding over
    BOTH corpora, candidates restricted to new×corpus (never corpus×
    corpus), digest-array Jaccard verify, per-new-doc match aggregate.

    ``negate_new`` flips the split: the SCORED side is the complement of
    the modulus slice — the fuzzy-decontamination composition (score the
    big train side against the small benchmark slice)."""
    rpb = num_hashes // bands
    bucket = " || '|' || ".join(
        f"CAST(sig[b * {rpb} + {r + 1}] AS VARCHAR)" for r in range(rpb)
    )
    eq, ne = ("<>", "=") if negate_new else ("=", "<>")
    new_pred_n = f"n.id % {new_mod} {eq} {new_rem}"
    corpus_pred_c = f"c.id % {new_mod} {ne} {new_rem}"
    new_pred_doc = f"doc_id % {new_mod} {eq} {new_rem}"
    return f"""
WITH {_sig_cte(num_hashes, k, "")},
buckets AS (
  SELECT id, CAST(u.b AS INT) AS band, md5({bucket}) AS bucket
  FROM sigt, (SELECT unnest(range(0, {bands})) AS b) u
),
cand AS (
  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
  FROM buckets n JOIN buckets c
    ON n.band = c.band AND n.bucket = c.bucket
  WHERE {new_pred_n} AND {corpus_pred_c}
),
dig AS (SELECT id, list_distinct(xs) AS xs FROM shx),
verified AS (
  SELECT c.new_id,
         len(list_intersect(dn.xs, dc.xs))
         / (len(dn.xs) + len(dc.xs) - len(list_intersect(dn.xs, dc.xs)))
           AS jaccard
  FROM cand c
  JOIN dig dn ON dn.id = c.new_id
  JOIN dig dc ON dc.id = c.corpus_id
),
agg AS (
  SELECT new_id, CAST(count(*) AS BIGINT) AS n_matches,
         round(max(jaccard), 9) AS max_jaccard9
  FROM verified WHERE jaccard >= {threshold}
  GROUP BY 1
)
SELECT d.doc_id, coalesce(a.n_matches, 0) AS n_matches, a.max_jaccard9,
       coalesce(a.n_matches, 0) = 0 AS keep
FROM (SELECT doc_id FROM documents WHERE {new_pred_doc}) d
LEFT JOIN agg a ON a.new_id = d.doc_id
"""


def temperature_resample_sql(tau: float = 0.5, salt: str = "temp") -> str:
    """Twin of llm/sampling.py::temperature_resample — same exact-integer
    token sums, same single divide+pow per source (round-9 before the
    threshold multiply, so a last-ULP pow difference between engines
    cannot flip a keep decision), same salted-md5 bucket."""
    bucket = SAMPLE_BUCKET.format(key="doc_id", salt=salt)
    return f"""
WITH agg AS (
  SELECT source, CAST(sum(len({TEXT_TOKENS})) AS BIGINT) AS n
  FROM documents GROUP BY source
),
fr AS (
  SELECT source,
         round(least(1.0,
               pow(CAST(n AS DOUBLE) / (SELECT min(n) FROM agg),
                   {float(tau)} - 1.0)), 9) AS keep_fraction9
  FROM agg
)
SELECT d.doc_id, d.source, f.keep_fraction9
FROM documents d JOIN fr f USING (source)
WHERE {bucket} < CAST(floor(f.keep_fraction9 * {1 << 32}) AS BIGINT)
"""


def chunk_documents_sql(chunk_tokens: int = 128, overlap: int = 16) -> str:
    """Twin of llm/packing.py::chunk_documents — same tokenizer, same
    window arithmetic (1-based inclusive list slice clamps at the array
    end exactly like Spark's slice(arr, start, length))."""
    step = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT doc_id, {TEXT_TOKENS} AS toks FROM documents
),
c AS (
  SELECT doc_id, toks,
         greatest(1, (len(toks) - {overlap} + {step - 1}) // {step})
           AS n_chunks
  FROM t
),
e AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM c
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(toks[chunk_idx * {step} + 1 :
                            chunk_idx * {step} + {chunk_tokens}], ' ')
         AS chunk_text,
       CAST(len(toks[chunk_idx * {step} + 1 :
                     chunk_idx * {step} + {chunk_tokens}]) AS BIGINT)
         AS n_tokens
FROM e
"""


def vocab_growth_sql(n_buckets: int = 10) -> str:
    """Twin of llm/text.py::vocab_growth: same exact integer id-range
    bucketing, same 1-based bigram extraction as bigram_surprisal_sql,
    type first appearance = min(bucket), cumulative sums over the
    n_buckets-row curve."""
    return f"""
WITH bounds AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
b AS (
  SELECT ((doc_id - mn) * {int(n_buckets)}) // (mx - mn + 1) AS bucket,
         {TEXT_TOKENS} AS t
  FROM documents, bounds
),
ex AS (
  SELECT bucket, u.token
  FROM b,
       unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])) AS u(token)
),
occ AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_token_occurrences
  FROM ex GROUP BY 1
),
firsts AS (SELECT token, min(bucket) AS first_bucket FROM ex GROUP BY 1),
news AS (
  SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS new_types
  FROM firsts GROUP BY 1
)
SELECT o.bucket,
       CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(coalesce(n.new_types, 0))
            OVER (ORDER BY o.bucket) AS BIGINT) AS cum_vocab,
       o.n_token_occurrences,
       CAST(sum(o.n_token_occurrences)
            OVER (ORDER BY o.bucket) AS BIGINT) AS cum_tokens
FROM occ o LEFT JOIN news n ON o.bucket = n.bucket
"""


def _bpe_stages(
    n_merges: int,
    eow: str,
    carry_word: bool,
    pretokenizer: str = "char",
    source: str = "documents",
) -> list[str]:
    """Shared CTE-stage builder for the BPE twins: w0/v0 (weighted word
    vocab → symbol lists) then per-merge (p{i} pair counts, b{i} argmax,
    v{i} fold-applied vocab). With ``carry_word`` each v{i} keeps the
    word key so a downstream encode stage can join words back — the
    train twin drops it (one fewer column through 8 stages).
    ``pretokenizer`` mirrors llm/bpe.py::_pretok_syms ('char' = unicode
    chars, 'byte' = UTF-8 bytes as uppercase hex pairs — DuckDB's
    hex(encode(w)) is the exact Spark hex(encode(w,'UTF-8')) twin);
    ``source`` lets a gate swap in a transformed-documents subquery
    (aliased) for the fixture-differentiation text."""
    wsel = "w, " if carry_word else ""
    syms0 = (
        "regexp_extract_all(w, '.')"
        if pretokenizer == "char"
        else "regexp_extract_all(hex(encode(w)), '..')"
    )
    stages = [
        f"""w0 AS (
  SELECT t AS w, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({TEXT_TOKENS}) AS t FROM {source})
  -- exclude tokens containing the fold delimiters (chr(1)/chr(2)) —
  -- the SAME filter the Spark side applies (llm/bpe.py), making the
  -- operator well-defined on binary-garbage corpora where the string
  -- accumulator would otherwise split inside a symbol
  WHERE NOT contains(t, chr(1)) AND NOT contains(t, chr(2))
  GROUP BY 1
),
v0 AS (
  SELECT {wsel}wc, list_append({syms0}, '{eow}') AS syms
  FROM w0
)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        stages.append(
            f"""p{i} AS (
  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(wc) AS BIGINT) AS cnt
  FROM (SELECT wc, unnest(list_zip(syms[1:len(syms)-1], syms[2:])) AS pr
        FROM v{p} WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
v{i} AS (
  SELECT {wsel}wc,
         string_split(
           list_reduce(list_prepend(chr(2), syms), (acc, x) ->
             CASE WHEN x = m.b AND ends_with(acc, chr(1) || m.a)
                  THEN left(acc, length(acc) - length(m.a) - 1)
                       || chr(1) || m.a || m.b
                  ELSE acc || chr(1) || x END),
           chr(1))[2:] AS syms
  FROM v{p}, b{i} m
)"""
        )
        # the last stage's v{i} is unconsumed in the train twin; harmless
        # (CTEs are lazy) — the encode twin joins against it
    return stages


def bpe_train_sql(n_merges: int = 8, eow: str = "</w>") -> str:
    """Twin of llm/bpe.py::bpe_train: the identical iterative computation
    unrolled into n_merges CTE stages. Each stage's merge-apply is a
    list_reduce fold over a chr(1)-delimited string accumulator (DuckDB's
    reduce seeds the accumulator with the FIRST element, so a chr(2)
    sentinel is prepended — every real symbol then carries a chr(1)
    prefix and `ends_with(acc, chr(1) || a)` tests exactly "last symbol
    == a", multi-character symbols included). Fold semantics equal the
    Spark array fold equal sequential greedy BPE apply — see the
    equivalence note in llm/bpe.py."""
    stages = _bpe_stages(n_merges, eow, carry_word=False)
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, a AS left_sym,"
        f" b AS right_sym, a || b AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(stages) + "\n" + union


def bpe_encode_sql(n_merges: int = 8, eow: str = "</w>") -> str:
    """Twin of llm/bpe.py::bpe_encode with merges learned in-query: the
    train stages (carrying the word key) replay training, then the final
    vocab v{n} — every distinct word with ALL n merges fold-applied — IS
    the word→encoding table; one join on the positional token explode
    and one ordered reassembly per doc rebuild the encoded stream.
    Assumes the corpus yields all n_merges merges (true for every gated
    fixture; the Spark operator itself handles early-stop corpora —
    pytest-covered — but an unrolled SQL twin cannot branch on it)."""
    stages = _bpe_stages(n_merges, eow, carry_word=True)
    stages.append(
        f"""wp AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, toks[CAST(u.pos AS INT)] AS w
  FROM (SELECT doc_id, {TEXT_TOKENS} AS toks FROM documents) d,
       UNNEST(generate_series(1, len(toks))) AS u(pos)
)"""
    )
    # the delimiter-domain filter mirrors training: excluded words leave
    # positional gaps but never reorder (positions precede the filter)
    return (
        "WITH "
        + ",\n".join(stages)
        + f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(syms)) AS BIGINT) AS n_tokens,
       array_to_string(flatten(list(syms ORDER BY pos)), ' ') AS encoded
FROM (SELECT * FROM wp
      WHERE NOT contains(w, chr(1)) AND NOT contains(w, chr(2))) t
JOIN v{n_merges} USING (w)
GROUP BY doc_id
"""
    )


def bpe_roundtrip_sql(
    n_merges: int = 8,
    eow: str = "</w>",
    pretokenizer: str = "char",
    source: str = "documents",
) -> str:
    """Twin of llm/bpe.py::bpe_encode_ids with merges learned in-query:
    the carry-word train stages replay training (same as bpe_encode_sql),
    then (1) the symbol table assigns contiguous ids — base chars in
    binary order, EOW, merges in rank order, duplicate strings keeping
    the earliest tier/rank (mirrors bpe_symbol_table; for single chars
    binary UTF-8 order == the Spark side's codepoint order); (2) each
    vocab word encodes to its ordered id list; (3) the DECODE path joins
    ids back through the table's inverse, strips EOW, and the per-doc
    reassembly compares decoded text against the normalized original —
    the encode∘decode identity, computed independently per engine.
    Window-free id assignment is a Spark-side scale choice (two-phase
    rank); the oracle's one tiny ORDER BY window is the usual
    naive-twin contract.

    ``pretokenizer="byte"`` mirrors the GPT-2 byte-level form: tier 0
    reserves ALL 256 byte symbols (hex pairs, byte order — fixed-width
    uppercase hex makes ORDER BY sym equal byte order, matching the
    Spark side's conv(sym,16,10) rank value), and the decode direction
    ends with unhex → UTF-8 decode."""
    n = int(n_merges)
    stages = _bpe_stages(
        n, eow, carry_word=True, pretokenizer=pretokenizer, source=source
    )
    merge_union = "\nUNION ALL\n".join(
        f"SELECT a || b AS merged, CAST({i} AS BIGINT) AS rnk FROM b{i}"
        for i in range(1, n + 1)
    )
    stages.append(
        f"""mrg AS (
  SELECT merged, rnk FROM (
    SELECT merged, rnk,
           row_number() OVER (PARTITION BY merged ORDER BY rnk) AS rn
    FROM ({merge_union})
  ) WHERE rn = 1 AND merged <> '{eow}'
)"""
    )
    if pretokenizer == "byte":
        base_cte = (
            "base AS (\n"
            "  SELECT lpad(hex(CAST(u.i AS INT)), 2, '0') AS sym\n"
            "  FROM UNNEST(generate_series(0, 255)) AS u(i)\n"
            ")"
        )
        dec_expr = (
            f"decode(unhex(replace(string_agg(sym, '' ORDER BY j), "
            f"'{eow}', '')))"
        )
    else:
        base_cte = (
            "base AS (\n"
            "  SELECT DISTINCT unnest(regexp_extract_all(w, '.')) AS sym"
            " FROM w0\n)"
        )
        dec_expr = f"replace(string_agg(sym, '' ORDER BY j), '{eow}', '')"
    stages.append(
        f"""{base_cte},
symtab AS (
  SELECT sym,
         CAST(row_number() OVER (ORDER BY tier, rnk, sym) AS BIGINT)
           AS sym_id
  FROM (
    SELECT sym, 0 AS tier, CAST(0 AS BIGINT) AS rnk FROM base
    UNION ALL SELECT '{eow}', 1, 0
    UNION ALL SELECT merged, 2, rnk FROM mrg
  )
),
wsym AS (
  SELECT w, CAST(u.i AS BIGINT) AS i, syms[CAST(u.i AS INT)] AS sym
  FROM v{n}, UNNEST(generate_series(1, len(syms))) AS u(i)
),
wids AS (
  SELECT w, list(sym_id ORDER BY i) AS ids
  FROM wsym JOIN symtab USING (sym) GROUP BY w
),
wflat AS (
  SELECT w, CAST(u.j AS BIGINT) AS j, ids[CAST(u.j AS INT)] AS sym_id
  FROM wids, UNNEST(generate_series(1, len(ids))) AS u(j)
),
dec AS (
  SELECT w, {dec_expr} AS w_dec
  FROM wflat JOIN symtab USING (sym_id) GROUP BY w
),
wp AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, toks[CAST(u.pos AS INT)] AS w
  FROM (SELECT doc_id, {TEXT_TOKENS} AS toks FROM {source}) d,
       UNNEST(generate_series(1, len(toks))) AS u(pos)
)"""
    )
    return (
        "WITH "
        + ",\n".join(stages)
        + f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(ids)) AS BIGINT) AS n_ids,
       array_to_string(flatten(list(ids ORDER BY pos)), ' ') AS ids_str,
       (string_agg(w_dec, ' ' ORDER BY pos)
        = string_agg(w, ' ' ORDER BY pos)) AS roundtrip_ok
FROM (SELECT * FROM wp
      WHERE NOT contains(w, chr(1)) AND NOT contains(w, chr(2))) t
JOIN wids USING (w) JOIN dec USING (w)
GROUP BY doc_id
"""
    )


def ks_drift_sql(split_epoch_us: int) -> str:
    """Twin of operators/stats.py::ks_statistic over the events table,
    sample A = events strictly before split_epoch_us. Same distinct-value
    collapse, same DECIMAL(38,0) cross-multiplied integer gap, same
    single double divide + 1e-6 quantization. Windowed sums CAST to
    DECIMAL(38,0) explicitly (DuckDB widens sum(BIGINT) to HUGEINT, whose
    driver-side dtype differs — the packed_chunk_spans lesson)."""
    return f"""
WITH tagged AS (
  SELECT CAST(round(value * 1e6) AS BIGINT) AS v,
         CASE WHEN epoch_us(ts) < {int(split_epoch_us)} THEN 1 ELSE 0 END AS ga
  FROM events
  -- ts IS NOT NULL mirrors the Spark side exactly: a NULL split
  -- predicate drops the row from BOTH samples there (ks_statistic
  -- filters NULL membership), so the oracle must not default it to B
  WHERE value IS NOT NULL AND ts IS NOT NULL
),
per_v AS (
  SELECT v, CAST(sum(ga) AS BIGINT) AS ca,
         CAST(sum(1 - ga) AS BIGINT) AS cb
  FROM tagged GROUP BY 1
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
         CAST(count(*) AS BIGINT) AS nv
  FROM per_v
),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS DECIMAL(38,0)) AS cum_a,
         CAST(sum(cb) OVER (ORDER BY v) AS DECIMAL(38,0)) AS cum_b
  FROM per_v
),
g AS (
  SELECT v, abs(cum_a * CAST(nb AS DECIMAL(38,0))
              - cum_b * CAST(na AS DECIMAL(38,0))) AS gap
  FROM cum, tot
)
SELECT na AS n_a, nb AS n_b, nv AS n_vals,
       (SELECT v FROM g ORDER BY gap DESC, v LIMIT 1) AS at_v,
       CAST(round(1e6 * CAST((SELECT max(gap) FROM g) AS DOUBLE)
                  / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT)
         AS ks_q6
FROM tot
"""


def url_canonical_sql(url_expr: str) -> str:
    """DuckDB expression: canonical form of ``url_expr`` — the exact
    regex chain of llm/urls.py::canonicalize_url. The leading
    whitespace/control strip uses the 'g' (replace-all) flag — the one
    multi-match pattern; every later pattern is anchored (single-match),
    so DuckDB's first-match regexp_replace equals Spark's replace-all
    (and with whitespace gone, `$` means end-of-text in both dialects —
    the r09 advisor's newline-anchor gap). Tracker params drop and the
    remainder is kept sorted, mirroring TRACKER_PARAM_RE. Shared by the
    url_domain_dedup / url_domain_token_cap oracles and the randomized
    cross-engine sweep in tests/test_llm.py. The unreserved
    percent-escape decode is the same single-pass split-on-% HOF as the
    Spark side (llm/urls.py::canonicalize_url — every piece after the
    first starts with two hex digits behind the gate; decode the byte
    numerically via the proven '0x'||hex cast idiom and keep it only
    for RFC 3986 unreserved code points), behind the same
    well-formedness gate (PERCENT_GATE_RE — malformed ``%`` sequences
    skip decoding so the canonical form stays a fixed point on both
    engines). llm/urls.py::percent_pairs is the pinned SPEC of the
    spelling set."""
    from .urls import PERCENT_GATE_RE, TRACKER_PARAM_RE

    ws = f"regexp_replace({url_expr}, '[\\x00-\\x20]+', '', 'g')"
    npc = "(('0x' || substr(p, 1, 2))::INT)"
    unres = (
        f"({npc} BETWEEN 48 AND 57 OR {npc} BETWEEN 65 AND 90 "
        f"OR {npc} BETWEEN 97 AND 122 OR {npc} IN (45, 46, 95, 126))"
    )
    piece = (
        f"CASE WHEN {unres} THEN chr({npc}) || substr(p, 3) "
        f"ELSE '%' || p END"
    )
    dec = (
        f"(string_split({ws}, '%')[1] || coalesce(array_to_string("
        f"list_transform(string_split({ws}, '%')[2:], p -> {piece}), "
        f"''), ''))"
    )
    pd = (
        f"(CASE WHEN strpos({ws}, '%') > 0 "
        f"AND regexp_matches({ws}, '{PERCENT_GATE_RE}') "
        f"THEN {dec} ELSE {ws} END)"
    )
    nofrag = f"regexp_replace({pd}, '#.*$', '')"
    # COALESCE: DuckDB regexp_extract yields NULL on no match where
    # Spark yields '' — a query-less URL must not null the whole chain
    query = f"coalesce(regexp_extract({nofrag}, '\\?(.*)$', 1), '')"
    stripped = (
        f"regexp_replace(regexp_replace({nofrag}, "
        f"'\\?.*$', ''), '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    )
    host = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"lower(regexp_extract({stripped}, '^([^/]*)', 1)), "
        f"'^.*@', ''), ':[0-9]+$', ''), '\\.$', ''), '^www\\.', '')"
    )
    path = (
        f"regexp_replace(regexp_replace({stripped}, '^[^/]*', ''), "
        f"'/+$', '')"
    )
    # outer COALESCE: DuckDB array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — an all-tracker/empty param list must yield
    # the no-query canonical form, not NULL
    qcanon = (
        f"coalesce(array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKER_PARAM_RE}'))), "
        f"'&'), '')"
    )
    return (
        f"({host} || {path} || "
        f"(CASE WHEN {qcanon} = '' THEN '' ELSE '?' || {qcanon} END))"
    )


def url_registered_domain_sql(host_expr: str) -> str:
    """DuckDB expression: registered domain of a lowercase host — the
    exact longest-match CASE of llm/urls.py::registered_domain, with IN
    lists generated from the SAME PSL snapshot (llm/urls.py::psl_rules),
    so both engines resolve github.io / com.tw / act.edu.au-class
    suffixes identically."""
    from .urls import psl_rules

    r2, r3 = psl_rules()
    in2 = ", ".join(f"'{s}'" for s in sorted(r2))
    labels = f"string_split({host_expr}, '.')"
    last2 = f"({labels})[-2] || '.' || ({labels})[-1]"
    last3 = f"({labels})[-3] || '.' || {last2}"
    last4 = f"({labels})[-4] || '.' || {last3}"
    branches = ""
    if r3:
        in3 = ", ".join(f"'{s}'" for s in sorted(r3))
        branches += (
            f"WHEN len({labels}) >= 4 AND ({last3}) IN ({in3}) "
            f"THEN {last4} "
        )
    branches += (
        f"WHEN len({labels}) >= 3 AND ({last2}) IN ({in2}) THEN {last3} "
    )
    return (
        f"(CASE {branches}"
        f"WHEN len({labels}) >= 2 THEN {last2} "
        f"ELSE {host_expr} END)"
    )


def exact_substr_spans_sql(k: int = 8, scope: str = "cross_doc") -> str:
    """Shared twin of llm/dedup.py::exact_substr_spans — the oracle groups
    sliding k-gram TEXT directly (digests are a Spark-side shuffle-width
    choice, not semantics); islands break when pos > prev + k; window-sum
    island ids and count(*) CAST to BIGINT (the packed_chunk_spans
    HUGEINT lesson). ``scope`` selects the dup predicate exactly as the
    Spark operator's validated enum does (r09 advisor note: the former
    raw ``dup_having`` SQL knob let a typo produce a silently different
    oracle): the cross-doc predicate or the self-repeat-inclusive paper
    semantics — the ONE line the two registered twins differ by (r09
    review: single source for the tokenize/gram/island/span SQL)."""
    havings = {
        "cross_doc": "min(doc_id) < max(doc_id)",
        "any": "count(*) >= 2",
    }
    if scope not in havings:
        raise ValueError(
            f"scope must be one of {sorted(havings)}, got {scope!r}"
        )
    dup_having = havings[scope]
    k = int(k)
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
         array_to_string(
           list_slice(toks, CAST(u.pos AS INT), CAST(u.pos AS INT) + {k - 1}),
           ' ') AS gram
  FROM tk, UNNEST(generate_series(1, len(toks) - {k - 1})) AS u(pos)
  WHERE len(toks) >= {k}
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING {dup_having}),
h AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
m AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS brk
  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
i AS (
  SELECT doc_id, pos,
         CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM m
)
SELECT doc_id,
       min(pos) AS span_start,
       CAST(max(pos) + {k - 1} AS BIGINT) AS span_end,
       CAST(max(pos) + {k} - min(pos) AS BIGINT) AS span_len,
       CAST(count(*) AS BIGINT) AS n_dup_grams
FROM i GROUP BY doc_id, island
"""


def exact_substr_cut_sql(k: int = 8, scope: str = "cross_doc") -> str:
    """Twin of llm/dedup.py::exact_substr_cut — same tokenize/gram/dup
    SQL as `exact_substr_spans_sql` (grams group by TEXT, the digest is
    a Spark shuffle-width choice), then the as-of coverage window
    (union tokens with dup-gram starts, running max-of-start, covered
    iff a start lies within the trailing k-window) and the ordered
    FILTERed reassembly. COALESCE on the reassembly: an all-cut doc's
    filtered list aggregate is NULL in DuckDB where Spark's
    collect_list is an empty array."""
    havings = {
        "cross_doc": "min(doc_id) < max(doc_id)",
        "any": "count(*) >= 2",
    }
    if scope not in havings:
        raise ValueError(
            f"scope must be one of {sorted(havings)}, got {scope!r}"
        )
    dup_having = havings[scope]
    k = int(k)
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
         array_to_string(
           list_slice(toks, CAST(u.pos AS INT), CAST(u.pos AS INT) + {k - 1}),
           ' ') AS gram
  FROM tk, UNNEST(generate_series(1, len(toks) - {k - 1})) AS u(pos)
  WHERE len(toks) >= {k}
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING {dup_having}),
starts AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
tox AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
         toks[CAST(u.pos AS INT)] AS tok
  FROM tk, UNNEST(generate_series(1, len(toks))) AS u(pos)
  WHERE len(toks) >= 1
),
ev AS (
  SELECT doc_id, pos, tok, 0 AS m FROM tox
  UNION ALL
  SELECT doc_id, pos, NULL AS tok, 1 AS m FROM starts
),
cov AS (
  SELECT *, max(CASE WHEN m = 1 THEN pos END) OVER (
    PARTITION BY doc_id ORDER BY pos, m DESC
    ROWS UNBOUNDED PRECEDING) AS last_start
  FROM ev
),
flagged AS (
  SELECT doc_id, pos, tok,
         (last_start IS NOT NULL AND last_start >= pos - {k - 1}) AS cut
  FROM cov WHERE m = 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cut,
       coalesce(
         array_to_string(list(tok ORDER BY pos) FILTER (WHERE NOT cut),
                         ' '),
         '') AS text_clean
FROM flagged GROUP BY doc_id
"""
