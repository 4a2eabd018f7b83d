"""Semantic tests for the corpus-quality operators (Gopher rules, C4
line filter, length histogram, Zipf fit) and the path-latency analytic —
rule-boundary and hand-computed cases the fixture-corpus hash gate can't
exercise (the sf corpus is single-line word soup, so e.g. every C4 line
predicate branch needs crafted docs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from zipkin_dependencies_spark.llm.quality import (
    c4_line_filter,
    doc_length_histogram,
    gopher_quality,
    zipf_fit,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s") for i, t in enumerate(texts)]
    )


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away today "
    * 5
)  # 65 words, all alpha, has the/and/over... stopwords


def test_gopher_rules_each_boundary(spark):
    texts = [
        GOOD,                                   # 0: passes every rule
        "the and of short",                     # 1: too few words
        GOOD + " " + "#tag " * 20,              # 2: symbol ratio too high
        ("zq wv xk " * 30).strip(),             # 3: no stopwords, short words
        GOOD.replace("the", "12345").replace("and", "67890"),  # 4: alpha frac + stopwords
    ]
    rows = {r.doc_id: r for r in gopher_quality(_docs(spark, texts)).collect()}
    assert rows[0].keep
    assert not rows[1].keep and rows[1].n_words == 4
    assert not rows[2].keep and rows[2].symbol_ratio9 > 0.1
    assert not rows[3].keep and rows[3].stop_hits == 0
    assert not rows[4].keep
    # measurements, not just verdicts: mean word length of doc 0 is exact
    words = GOOD.split()
    assert rows[0].mean_word_len9 == round(
        sum(len(w) for w in words) / len(words), 9
    )


def test_gopher_empty_doc_keep_false_not_null(spark):
    r = gopher_quality(_docs(spark, [""])).collect()[0]
    assert r.keep is False and r.n_words == 0
    assert r.mean_word_len9 is None and r.symbol_ratio9 is None


def test_c4_line_predicates(spark):
    line_ok = "this line has enough words to survive the filter."
    doc = "\n".join(
        [
            line_ok,                       # kept
            "too short.",                  # < 5 words
            "no terminal punctuation here at all",   # no [.!?"] ending
            "curly { brace means code so this dies.",  # contains {
            "the word javascript kills this line too.",  # javascript
            line_ok + "!",                 # kept (bang terminal)
            'he said "quoted line with five words."',  # kept (quote terminal)
        ]
    )
    r = c4_line_filter(_docs(spark, [doc])).collect()[0]
    assert r.n_lines == 7 and r.n_kept_lines == 3 and r.keep
    kept_text = "\n".join([line_ok, line_ok + "!",
                           'he said "quoted line with five words."'])
    assert r.cleaned_chars == len(kept_text)


def test_c4_doc_level_kills(spark):
    line_ok = "this line has enough words to survive the filter."
    two_lines = "\n".join([line_ok, line_ok])          # below min_kept_lines=3
    lorem = "\n".join([line_ok] * 3) + "\nLorem Ipsum dolor."
    rows = {r.doc_id: r for r in
            c4_line_filter(_docs(spark, [two_lines, lorem])).collect()}
    assert not rows[0].keep and rows[0].n_kept_lines == 2
    assert not rows[1].keep and rows[1].n_kept_lines == 3  # lorem kill


def test_doc_length_histogram_bucket_edges(spark):
    # bit-length bucketing must be integer-exact at powers of two
    texts = ["", "w", "w w", "w w w", "w w w w", "w " * 7, "w " * 8]
    out = doc_length_histogram(_docs(spark, texts)).collect()
    by_bucket = {r.bucket: r for r in out}
    # n_tok: 0,1,2,3,4,7,8 → buckets 1,1,2,2,3,3,4
    assert by_bucket[1].n_docs == 2 and by_bucket[1].sum_tokens == 1
    assert by_bucket[2].n_docs == 2 and by_bucket[2].sum_tokens == 5
    assert by_bucket[3].n_docs == 2 and by_bucket[3].sum_tokens == 11
    assert by_bucket[4].n_docs == 1 and by_bucket[4].sum_tokens == 8


def test_zipf_slope_on_constructed_power_law(spark):
    # freq(rank) = 64 >> (rank-1): exact slope -ln2 per rank-doubling is
    # not linear in ln(rank), but the fit must be negative and steep;
    # also n_terms counts the vocabulary exactly.
    texts = []
    vocab = [("alpha", 64), ("beta", 32), ("gamma", 16), ("delta", 8),
             ("epsil", 4), ("zeta", 2), ("eta", 1)]
    body = " ".join(w for w, n in vocab for _ in range(n))
    r = zipf_fit(_docs(spark, [body])).collect()[0]
    assert r.n_terms == 7
    assert r.slope6 < -1.0
    # closed-form check: regr_slope over the exact (ln rank, ln freq) pairs
    pts = [(math.log(i + 1), math.log(n)) for i, (_, n) in enumerate(vocab)]
    mx = sum(x for x, _ in pts) / len(pts)
    my = sum(y for _, y in pts) / len(pts)
    slope = sum((x - mx) * (y - my) for x, y in pts) / sum(
        (x - mx) ** 2 for x, _ in pts
    )
    assert r.slope6 == pytest.approx(slope, abs=2e-6)


def test_zipf_rank_assignment_partition_invariant(spark):
    texts = [f"tok{i % 13} tok{i % 7} tok{i % 3}" for i in range(300)]
    df = _docs(spark, texts)
    a = zipf_fit(df.repartition(1)).collect()[0]
    b = zipf_fit(df.repartition(17)).collect()[0]
    assert (a.n_terms, a.slope6, a.intercept6) == (b.n_terms, b.slope6, b.intercept6)


def test_path_latencies_hand_computed(spark):
    from zipkin_dependencies_spark.operators.paths import path_latencies
    from zipkin_dependencies_spark.schemas import LINK_INPUT_SCHEMA

    # trace t1: root(ts 100) -> a(ts 150) -> leaf b(ts 400); also leaf
    # c(ts 250) under root. trace t2: same shape as t1's long chain but
    # faster, sharing the path string root->a->b.
    rows = [
        ("t1", None, "r", "SERVER", "root", None, False, False, 100),
        ("t1", "r", "a", "CLIENT", "a", None, False, False, 150),
        ("t1", "a", "b", "CLIENT", "b", None, False, False, 400),
        ("t1", "r", "c", "CLIENT", "c", None, False, False, 250),
        ("t2", None, "r", "SERVER", "root", None, False, False, 1000),
        ("t2", "r", "a", "CLIENT", "a", None, False, False, 1010),
        ("t2", "a", "b", "CLIENT", "b", None, False, False, 1200),
    ]
    norm = spark.createDataFrame(rows, schema=LINK_INPUT_SCHEMA)
    got = {r.path: r for r in path_latencies(norm, k=10).collect()}
    assert got["root->a->b"].n_leaves == 2
    assert got["root->a->b"].max_lag_us == 300   # t1: 400-100
    assert got["root->a->b"].sum_lag_us == 500   # 300 + (1200-1000)
    assert got["root->c"].max_lag_us == 150
    assert got["root->a->b"].rank == 1 and got["root->c"].rank == 2


@pytest.mark.parametrize("seed", [11, 47])
def test_path_latencies_matches_python_reference_on_random_forests(spark, seed):
    """Randomized soundness: path_latencies must equal a plain-Python
    walk + per-path aggregate on arbitrary forests with random integer
    timestamps (cycles dropped, dangling chains truncated — the
    trace_paths semantics — then lag = leaf_ts − min trace ts)."""
    import random

    from zipkin_dependencies_spark.operators.paths import path_latencies
    from zipkin_dependencies_spark.schemas import LINK_INPUT_SCHEMA

    rng = random.Random(seed)
    rows = []
    for t in range(50):
        tk = f"pl{seed}-{t}"
        n = rng.randint(1, 10)
        ids = [f"s{i}" for i in range(n)]
        for sid in ids:
            parent = rng.choice([None, "dangling", *ids])
            if parent == sid:
                parent = None
            rows.append(
                (tk, parent, sid, "SERVER",
                 rng.choice([None, "a", "b", "c"]), None, False, False,
                 rng.randint(0, 10_000))
            )

    norm = spark.createDataFrame(rows, schema=LINK_INPUT_SCHEMA)
    got = {
        r.path: (r.n_leaves, r.max_lag_us, r.sum_lag_us)
        for r in path_latencies(norm, k=10_000).collect()
    }

    bytrace: dict = {}
    tmin: dict = {}
    for tk, parent, sid, _k, svc, _r, _s, _e, ts in rows:
        bytrace.setdefault(tk, {})[sid] = (parent, svc or "(unknown)", ts)
        tmin[tk] = min(tmin.get(tk, ts), ts)
    agg: dict = {}
    for tk, nodes in bytrace.items():
        parent_vals = {p for p, _, _ in nodes.values() if p is not None}
        for leaf in nodes:
            if leaf in parent_vals:
                continue
            path, seen, cur, ok = [], set(), leaf, True
            while True:
                if cur in seen:
                    ok = False
                    break
                seen.add(cur)
                p, svc, _ = nodes[cur]
                path.append(svc)
                if p is None or p not in nodes:
                    break
                cur = p
            if ok:
                key = "->".join(reversed(path))
                lag = nodes[leaf][2] - tmin[tk]
                n, mx, sm = agg.get(key, (0, None, 0))
                agg[key] = (n + 1, lag if mx is None else max(mx, lag),
                            sm + lag)
    assert got == agg


def test_error_paths_attribution_and_zero_rate_rows(spark):
    from zipkin_dependencies_spark.operators.paths import error_paths
    from zipkin_dependencies_spark.schemas import LINK_INPUT_SCHEMA

    rows = [
        ("t1", None, "r", "SERVER", "root", None, False, False, 1),
        ("t1", "r", "a", "CLIENT", "a", None, False, True, 2),   # error leaf
        ("t1", "r", "b", "CLIENT", "b", None, False, False, 3),  # clean leaf
        ("t2", None, "r", "SERVER", "root", None, False, False, 1),
        ("t2", "r", "a", "CLIENT", "a", None, False, None, 2),   # null error
    ]
    norm = spark.createDataFrame(rows, schema=LINK_INPUT_SCHEMA)
    got = {r.path: r for r in error_paths(norm, k=10).collect()}
    assert got["root->a"].n_leaves == 2 and got["root->a"].n_error_leaves == 1
    assert got["root->a"].err_rate9 == 0.5
    # zero-error chains still appear (the contrast row), ranked after
    assert got["root->b"].n_error_leaves == 0 and got["root->b"].rank == 2


def test_token_fertility_grouped_ratio(spark):
    from zipkin_dependencies_spark.llm.text import token_fertility

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="hello world", lang="en", source="s"),
            Row(doc_id=1, text="don't stop", lang="en", source="s"),
            Row(doc_id=2, text="", lang="xx", source="s"),
        ]
    )
    got = {r.lang: r for r in token_fertility(df).collect()}
    # en: ws 2+2=4; bpe "hello world"=2, "don ' t stop"=4 → 6/4 = 1.5
    assert got["en"].ws_tokens == 4 and got["en"].bpe_tokens == 6
    assert got["en"].fertility9 == 1.5
    assert got["xx"].ws_tokens == 0 and got["xx"].fertility9 is None


def test_dataset_card_exact_dup_and_keep_rates(spark):
    from zipkin_dependencies_spark.llm.quality import dataset_card

    rows = [
        Row(doc_id=0, text=GOOD, lang="en", source="a"),        # keeps
        Row(doc_id=1, text=GOOD, lang="en", source="a"),        # exact dup
        Row(doc_id=2, text="tiny doc.", lang="de", source="a"), # fails gate
        Row(doc_id=3, text="other corpus.", lang="fr", source="b"),
    ]
    got = {r.source: r for r in
           dataset_card(spark.createDataFrame(rows)).collect()}
    a = got["a"]
    assert a.n_docs == 3 and a.n_langs == 2
    assert a.gopher_keep_rate9 == round(2 / 3, 9)
    assert a.dup_rate9 == round(1 - 2 / 3, 9)   # 2 unique fingerprints of 3
    b = got["b"]
    assert b.n_docs == 1 and b.dup_rate9 == 0.0 and b.gopher_keep_rate9 == 0.0


@pytest.mark.parametrize("seed", [3, 91])
def test_gopher_matches_python_reference_on_random_docs(spark, seed):
    """Randomized soundness: the Column-expression Gopher rules must
    equal a plain-Python implementation on random ascii docs mixing
    words, numbers, symbols, stopwords, and whitespace runs."""
    import random
    import re as _re

    from zipkin_dependencies_spark.llm.quality import GOPHER_STOPWORDS

    rng = random.Random(seed)
    pieces = ["the", "and", "with", "word", "a", "#", "...", "12345",
              "longish-token", "zq", "  ", "\t", "Mixed", "CASE"]
    texts = [
        " ".join(rng.choice(pieces) for _ in range(rng.randint(0, 120)))
        for _ in range(150)
    ]
    got = {r.doc_id: r for r in
           gopher_quality(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        toks = [w for w in _re.split(r"\s+", t.lower().strip()) if w]
        n = len(toks)
        r = got[i]
        assert r.n_words == n
        if n == 0:
            assert r.keep is False
            continue
        mean_wl = sum(len(w) for w in toks) / n
        n_hash = t.count("#")
        n_ell = (len(t) - len(t.replace("...", ""))) / 3
        sym = (n_hash + n_ell) / n
        alpha = sum(1 for w in toks if _re.search("[a-z]", w)) / n
        stop = len(set(toks) & set(GOPHER_STOPWORDS))
        assert r.mean_word_len9 == round(mean_wl, 9)
        assert r.symbol_ratio9 == round(sym, 9)
        assert r.alpha_word_frac9 == round(alpha, 9)
        assert r.stop_hits == stop
        expect = (50 <= n <= 100_000 and 3 <= mean_wl <= 10 and sym < 0.1
                  and alpha >= 0.8 and stop >= 2)
        assert r.keep == expect, (i, t[:80])


@pytest.mark.parametrize("seed", [7, 58])
def test_c4_matches_python_reference_on_random_docs(spark, seed):
    import random
    import re as _re

    rng = random.Random(seed)
    line_pieces = ["five words are here now", "short one", "ends well.",
                   "question marks work fine huh?", "has a { brace",
                   "JavaScript mention inside line.", 'a "quote"',
                   "lorem ipsum", "plenty of words without terminal punct"]
    texts = [
        "\n".join(rng.choice(line_pieces)
                  for _ in range(rng.randint(0, 8)))
        for _ in range(120)
    ]
    got = {r.doc_id: r for r in
           c4_line_filter(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [
            ln for ln in lines
            if len([w for w in _re.split(r"\s+", ln.strip()) if w]) >= 5
            and _re.search(r'[.!?"]$', ln.strip())
            and "{" not in ln
            and "javascript" not in ln.lower()
        ]
        r = got[i]
        assert r.n_lines == len(lines) and r.n_kept_lines == len(kept)
        assert r.cleaned_chars == len("\n".join(kept))
        assert r.keep == (len(kept) >= 3 and "lorem ipsum" not in t.lower())


def test_c4_crlf_equals_lf(spark):
    """CRLF documents must behave exactly like their LF twins (the
    \\r?\\n split — Java and RE2 disagree on `$` before a trailing \\r,
    so the \\r must never reach the line predicate or cleaned_chars)."""
    line_ok = "this line has enough words to survive the filter."
    lf = "\n".join([line_ok] * 3)
    crlf = "\r\n".join([line_ok] * 3)
    rows = {r.doc_id: r for r in
            c4_line_filter(_docs(spark, [lf, crlf])).collect()}
    a, b = rows[0], rows[1]
    assert (a.n_lines, a.n_kept_lines, a.cleaned_chars, a.keep) == \
           (b.n_lines, b.n_kept_lines, b.cleaned_chars, b.keep)
    assert a.keep and a.cleaned_chars == len(lf)


def test_curate_v3_gate_composition(spark):
    from zipkin_dependencies_spark.llm.pipeline import curate_v3

    good = GOOD  # 65 words, English, all alpha — passes relaxed Gopher
    rows = [
        Row(doc_id=0, text=good, lang="en", source="s"),
        Row(doc_id=1, text=good, lang="en", source="s"),      # dup of 0
        Row(doc_id=2, text="zq wv " * 40, lang="en", source="s"),  # no stopwords
        Row(doc_id=3, text="der die das und ist nicht mit ein " * 8,
            lang="de", source="s"),                           # German: lang gate
    ]
    docs = spark.createDataFrame(rows)
    bench = docs.filter(F.col("doc_id") < 0)  # empty benchmark
    out = curate_v3(
        docs, bench, lang="en", min_words=30, min_stop_hits=1,
        oracle_parity=True,
    ).collect()
    assert len(out) == 1                      # dup folded, 2 and 3 gated out
    assert out[0].keep_id == 0 and out[0].n_copies == 2

    with pytest.raises(ValueError, match="unknown gopher thresholds"):
        curate_v3(docs, bench, bogus_threshold=1)


def test_dataset_card_approx_distinct_close_to_exact(spark):
    from zipkin_dependencies_spark.llm.quality import dataset_card

    rows = [
        Row(doc_id=i, text=f"document number {i % 40} body", lang="en",
            source="s")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    exact = dataset_card(df).collect()[0]
    approx = dataset_card(df, approx_distinct=True).collect()[0]
    assert exact.n_docs == approx.n_docs == 200
    # HLL++ at rsd 1% on 40 distinct digests: allow a small band
    assert abs(approx.dup_rate9 - exact.dup_rate9) < 0.05
    assert approx.n_langs >= 1
