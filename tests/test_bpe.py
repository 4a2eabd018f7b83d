"""bpe_train vs a sequential pure-Python BPE reference (Sennrich 2016
semantics: pair counts weighted by word frequency, argmax with (count
desc, pair asc) tie-break, greedy left-to-right non-overlapping apply)."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from zipkin_dependencies_spark.llm.bpe import EOW, bpe_train


def _ref_apply(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(texts: list[str], n_merges: int):
    words: Counter[str] = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                words[w] += 1
    vocab = [([*w, EOW], c) for w, c in words.items()]
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter[tuple[str, str]] = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        vocab = [(_ref_apply(s, a, b), c) for s, c in vocab]
    return merges


def _spark_bpe(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bpe_train(docs, n_merges=n_merges).collect()
    return sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in rows
    )


def test_worked_example(spark):
    # classic Sennrich-style toy: 'low' x5, 'lower' x2, 'newest' x6
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6]
    got = _spark_bpe(spark, texts, 4)
    want = _ref_bpe(texts, 4)
    assert got == sorted(want)
    # first merge is (w,e): 6x in 'newest' + 2x in 'lower' = 8
    assert got[0][1:] == ("w", "e", "we", 8)


def test_early_stop_on_collapsed_vocab(spark):
    # one 1-char word: [x, </w>] merges once, then no pairs remain
    got = _spark_bpe(spark, ["x x x"], 5)
    assert got == [(1, "x", EOW, "x" + EOW, 3)]


@pytest.mark.parametrize("seed", range(8))
def test_randomized_vs_reference(spark, seed):
    rng = random.Random(seed)
    alphabet = "abc"
    texts = [
        " ".join(
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 6))
            )
            for _ in range(30)
        )
        for _ in range(3)
    ]
    assert _spark_bpe(spark, texts, 6) == sorted(_ref_bpe(texts, 6))


@pytest.mark.parametrize("engine", ["fold", "string"])
@pytest.mark.parametrize("rule", [("a", "b"), ("a", "a"), ("ab", "b"), ("b", "ab")])
def test_apply_merge_equals_sequential_greedy(spark, rule, engine):
    """The fold-apply lemma pinned directly (not just end-to-end), for
    BOTH engines: the array-fold accumulator (semantic anchor) AND the
    string-replace form actually on the query path since r10
    (_wrap_syms → _apply_merge_str → _unwrap_syms) equal the sequential
    left-to-right greedy non-overlapping replacement on adversarial
    sequences — runs of identical symbols, merged multi-char symbols as
    rule members, and patterns whose replacement abuts the next
    candidate. (r10 ADVICE: the adversarial suite previously exercised
    only the query-dead fold.)"""
    from pyspark.sql import functions as F

    from zipkin_dependencies_spark.llm.bpe import (
        _apply_merge,
        _apply_merge_str,
        _unwrap_syms,
        _wrap_syms,
    )

    a, b = rule
    rng = random.Random(hash(rule) & 0xFFFF)
    alphabet = ["a", "b", "ab", "aa", "c"]
    seqs = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 10))]
        for _ in range(60)
    ]
    # targeted adversarial cases for this rule
    seqs += [[a, b], [a, b, a, b], [a, a, b, b], [a, b, b], [a, a, b],
             [b, a, b, a], [a] * 5, [b] * 5, [a, b] * 4, []]
    # the string engine never sees empty arrays on the query path (EOW is
    # always appended before any merge applies); keep [] for the fold
    if engine == "string":
        seqs = [s for s in seqs if s]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], "i long, syms array<string>"
    )
    if engine == "fold":
        out = _apply_merge(df.syms, a, b)
    else:
        out = _unwrap_syms(_apply_merge_str(_wrap_syms(F.col("syms")), a, b))
    got = {r.i: r.out for r in df.select("i", out.alias("out")).collect()}
    for i, s in enumerate(seqs):
        assert got[i] == _ref_apply(s, a, b), (rule, s, engine)


@pytest.mark.parametrize("rule", [("a", "b"), ("a", "a"), ("ab", "b"), ("b", "ab")])
def test_duckdb_list_reduce_apply_equals_sequential_greedy(rule):
    """Same lemma, DuckDB side: the oracle's list_reduce fold over the
    chr(1)-delimited string accumulator (chr(2) seed sentinel) equals the
    sequential greedy apply — pinned on the same adversarial sequences
    the Spark fold test uses."""
    import duckdb

    a, b = rule
    rng = random.Random(hash(rule) & 0xFFFF)
    alphabet = ["a", "b", "ab", "aa", "c"]
    seqs = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 10))]
        for _ in range(60)
    ]
    seqs += [[a, b], [a, b, a, b], [a, a, b, b], [a, b, b], [a, a, b],
             [b, a, b, a], [a] * 5, [b] * 5, [a, b] * 4]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, syms VARCHAR[])")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, s) for i, s in enumerate(seqs)]
    )
    rows = con.execute(f"""
        SELECT i, string_split(
          list_reduce(list_prepend(chr(2), syms), (acc, x) ->
            CASE WHEN x = '{b}' AND ends_with(acc, chr(1) || '{a}')
                 THEN left(acc, length(acc) - {len(a)} - 1)
                      || chr(1) || '{a}' || '{b}'
                 ELSE acc || chr(1) || x END),
          chr(1))[2:] AS out
        FROM t
    """).fetchall()
    got = {i: out for i, out in rows}
    for i, s in enumerate(seqs):
        assert got[i] == _ref_apply(s, a, b), (rule, s)


def test_delimiter_bearing_tokens_excluded_from_training(spark):
    # tokens containing \x01/\x02 are outside the operator's domain on
    # BOTH engines (the DuckDB twin's fold accumulator uses those bytes
    # as delimiters) — training must equal the corpus with them removed
    clean = ["low low lower newest newest newest"]
    dirty = [clean[0] + " a\x01b c\x02d"]
    assert _spark_bpe(spark, dirty, 4) == _spark_bpe(spark, clean, 4)


@pytest.mark.parametrize("remat", [1, 2, 4, 0])
def test_rematerialization_is_result_invariant(spark, remat):
    """rematerialize_every bounds fold-chain DEPTH, never results: any R
    (including 0/None = never, and R=1 = checkpoint every round) learns
    the identical merge table — each round sees the vocab with all prior
    merges applied either as chained folds or as materialized rows."""
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6, "widest west low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = sorted(_ref_bpe(texts, 6))
    got = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=6, rematerialize_every=remat).collect()
    )
    assert got == want


def _ref_encode(texts: list[str], merges: list[tuple[str, str]]):
    """Sequential reference encode: per doc, per word, chars+EOW then the
    learned merges applied greedily in rank order."""
    out = {}
    for i, t in enumerate(texts):
        stream = []
        n_words = 0
        for w in t.lower().strip().split():
            if not w:
                continue
            n_words += 1
            syms = [*w, EOW]
            for a, b in merges:
                syms = _ref_apply(syms, a, b)
            stream.extend(syms)
        if n_words:
            out[i] = (n_words, len(stream), " ".join(stream))
    return out


@pytest.mark.parametrize("remat", [2, 16])
def test_bpe_encode_matches_sequential_reference(spark, remat):
    """bpe_encode (vocab-side fold + word join + ordered reassembly)
    equals per-word sequential greedy encoding with the learned merges —
    including repeated words, words the merges never touch, and the
    empty-doc drop."""
    from zipkin_dependencies_spark.llm.bpe import bpe_encode

    texts = [
        "low lower newest low",
        "newest newest west wide",
        "",                      # zero tokens -> dropped from output
        "zzz low",
    ]
    train_docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (m[1], m[2]) for m in sorted(_ref_bpe(texts, 5))
    ]
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.encoded)
        for r in bpe_encode(
            train_docs, merges, rematerialize_every=remat
        ).collect()
    }
    assert got == _ref_encode(texts, merges)


@pytest.mark.parametrize("seed", range(4))
def test_bpe_encode_randomized_vs_reference(spark, seed):
    rng = random.Random(seed + 70)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(0, 25))
        )
        for _ in range(4)
    ]
    from zipkin_dependencies_spark.llm.bpe import bpe_encode

    merges = [(m[1], m[2]) for m in sorted(_ref_bpe(texts, 6))]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.encoded)
        for r in bpe_encode(docs, merges, rematerialize_every=3).collect()
    }
    assert got == _ref_encode(texts, merges)


def test_bpe_encode_shuffled_join_fallback_identical(spark):
    """At a real tokenizer vocab (10^7 words) the encoded vocab stops
    fitting the broadcast threshold and the word→encoding join falls
    back to a shuffled hash join — force that plan (threshold -1) and
    pin that the output is identical to the broadcast plan's."""
    from zipkin_dependencies_spark.llm.bpe import bpe_encode

    texts = ["low lower newest low", "newest west wide low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [(m[1], m[2]) for m in sorted(_ref_bpe(texts, 5))]

    def run():
        return sorted(
            (r.doc_id, r.n_words, r.n_tokens, r.encoded)
            for r in bpe_encode(docs, merges).collect()
        )

    broadcast_plan = run()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled_plan = run()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert shuffled_plan == broadcast_plan == sorted(
        (i, *v) for i, v in _ref_encode(texts, merges).items()
    )


def _ref_symbol_table(texts, merges):
    chars = sorted(
        {c for t in texts for w in t.lower().strip().split() for c in w}
    )
    syms = chars + [EOW]
    seen = set(syms)
    for a, b in merges:
        m = a + b
        if m not in seen:
            seen.add(m)
            syms.append(m)
    return {s: i + 1 for i, s in enumerate(syms)}


def _ref_encode_ids(texts, merges):
    table = _ref_symbol_table(texts, merges)
    out = {}
    for i, t in enumerate(texts):
        words = [w for w in t.lower().strip().split() if w]
        if not words:
            continue
        all_ids, decoded = [], []
        for w in words:
            syms = [*w, EOW]
            for a, b in merges:
                syms = _ref_apply(syms, a, b)
            all_ids.extend(table[s] for s in syms)
            inv = {v: k for k, v in table.items()}
            decoded.append(
                "".join(inv[x] for x in (table[s] for s in syms)).replace(
                    EOW, ""
                )
            )
        out[i] = (
            len(words),
            len(all_ids),
            " ".join(str(x) for x in all_ids),
            " ".join(decoded) == " ".join(words),
        )
    return out


def test_bpe_symbol_table_layout(spark):
    """Contiguous id layout: base chars (codepoint order) from 1, then
    EOW, then merges in training order; duplicate merged STRINGS keep
    the earliest rank (("lo","w") and ("l","ow") both yield "low")."""
    from zipkin_dependencies_spark.llm.bpe import bpe_symbol_table

    words = spark.createDataFrame(
        [("low",), ("wet",)], "w string"
    )
    merges = [("l", "o"), ("lo", "w"), ("l", "ow"), ("w", "e")]
    got = {
        r.sym: r.sym_id
        for r in bpe_symbol_table(words, merges).collect()
    }
    assert got == {
        "e": 1, "l": 2, "o": 3, "t": 4, "w": 5,  # base, codepoint order
        EOW: 6,
        "lo": 7, "low": 8, "we": 9,  # training order; dup "low" dropped
    }


def test_bpe_encode_ids_roundtrip_worked_example(spark):
    """bpe_encode_ids equals the sequential pure-Python reference
    (ids via the same table layout), and decode(encode(doc)) holds."""
    from zipkin_dependencies_spark.llm.bpe import bpe_encode_ids

    texts = ["low lower newest low", "newest west wide low"]
    merges = [(m[1], m[2]) for m in sorted(_ref_bpe(texts, 5))]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_ids, r.ids_str, r.roundtrip_ok)
        for r in bpe_encode_ids(docs, merges).collect()
    }
    assert got == _ref_encode_ids(texts, merges)
    assert all(v[3] for v in got.values())


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_bpe_encode_ids_randomized_vs_reference(spark, seed):
    """Randomized corpora (repeat-heavy soup so merges stack into
    multi-char symbols): ids, counts, and the roundtrip flag all equal
    the sequential reference."""
    from zipkin_dependencies_spark.llm.bpe import bpe_encode_ids

    rng = random.Random(seed)
    alphabet = "abcd"
    texts = [
        " ".join(
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 6))
            )
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(8)
    ]
    merges = [(m[1], m[2]) for m in sorted(_ref_bpe(texts, 6))]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_ids, r.ids_str, r.roundtrip_ok)
        for r in bpe_encode_ids(docs, merges).collect()
    }
    assert got == _ref_encode_ids(texts, merges)


# --- byte-level pretokenizer (GPT-2-style UTF-8 byte fallback) ---------------


def _hex_rename(sym: str) -> str:
    """Char-level symbol → its byte-level (hex-pair) name: every char
    outside the EOW marker becomes its UTF-8 hex; EOW stays EOW."""
    return EOW.join(
        "".join(f"{b:02X}" for b in part.encode("utf-8"))
        for part in sym.split(EOW)
    )


def test_byte_level_train_equals_char_on_single_byte_corpus(spark):
    """On a pure-ASCII corpus every char is one byte, so byte-level
    training must learn the SAME merge sequence as char-level under the
    hex renaming — the pinned equivalence from the module docstring."""
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    char_m = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs, n_merges=4).collect()
    )
    byte_m = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs, n_merges=4, pretokenizer="byte").collect()
    )
    assert byte_m == [
        (rk, _hex_rename(a), _hex_rename(b), c) for rk, a, b, c in char_m
    ]


def test_byte_symbol_table_reserves_all_256_bytes(spark):
    """The byte-level table is the GPT-2 layout: ids 1–256 are ALL byte
    values in byte order (observed or not — the no-OOV property), 257 is
    EOW, merges follow in training order."""
    from zipkin_dependencies_spark.llm.bpe import bpe_symbol_table

    words = spark.createDataFrame([("hi",)], "w string")
    merges = [("68", "69")]  # 'h'+'i'
    got = {r.sym: r.sym_id for r in
           bpe_symbol_table(words, merges, pretokenizer="byte").collect()}
    assert len(got) == 258
    assert got["00"] == 1 and got["68"] == 0x68 + 1 and got["FF"] == 256
    assert got[EOW] == 257 and got["6869"] == 258


def test_byte_roundtrip_multibyte(spark):
    """decode(encode(doc)) through the byte layer holds on multibyte
    text (é = C3 A9 splits across two base symbols), and n_ids equals a
    sequential pure-Python byte-level reference."""
    from zipkin_dependencies_spark.llm.bpe import bpe_encode_ids

    texts = ["café naïve café", "café 世界 naïve", "abc café abc"]

    def byte_syms(w: str) -> list[str]:
        h = w.encode("utf-8").hex().upper()
        return [h[i:i + 2] for i in range(0, len(h), 2)] + [EOW]

    # sequential reference: train 4 merges at byte level
    words = Counter(w for t in texts for w in t.lower().split() if w)
    vocab = [(byte_syms(w), c) for w, c in words.items()]
    merges = []
    for _ in range(4):
        pc: Counter[tuple[str, str]] = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b))
        vocab = [(_ref_apply(s, a, b), c) for s, c in vocab]
    enc_len = {w: len(s) for (s, _c), w in zip(vocab, words)}

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    spark_merges = sorted(
        (r.merge_rank, r.left_sym, r.right_sym)
        for r in bpe_train(docs, n_merges=4, pretokenizer="byte").collect()
    )
    assert [(a, b) for _, a, b in spark_merges] == merges
    rows = bpe_encode_ids(
        docs, merges, pretokenizer="byte"
    ).collect()
    assert all(r.roundtrip_ok for r in rows)
    want_n_ids = {
        i: sum(enc_len[w] for w in t.lower().split() if w)
        for i, t in enumerate(texts)
    }
    assert {r.doc_id: r.n_ids for r in rows} == want_n_ids
