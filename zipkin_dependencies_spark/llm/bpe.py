"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The textbook scale decomposition: BPE never iterates over the corpus — it
iterates over the WORD VOCABULARY, weighted by word frequency. So the one
corpus-scale stage is a single `explode(tokens) → groupBy(word)` count
(one shuffle, map-side combined), after which the 100 TB corpus is out of
the picture entirely: every merge round runs on the vocab table (distinct
words — millions of rows where the corpus has trillions of tokens).

Per merge round, on the cached vocab:
  1. pair counts:   explode adjacent symbol pairs (arrays_zip of the two
     shifted slices — a pure projection), hash-aggregate sum(word_count)
     keyed on the pair. Map-side combine collapses the count before the
     (tiny) pair-domain shuffle.
  2. argmax:        orderBy(count desc, pair asc) . limit(1) — Spark plans
     TakeOrderedAndProject (per-partition top-1, driver merge of
     n_partitions rows), never a global sort. Tie-break is total
     (count desc, left asc, right asc) so training is deterministic.
  3. merge apply:   a codegen'd `aggregate()` fold over each word's symbol
     array — exact single-pass left-to-right greedy pair replacement
     (the fold accumulator IS the rewritten prefix; see `_apply_merge`).
     A projection: no shuffle, no UDF, no Python row path.

Round r re-derives the vocab by chaining the folds learned since the last
MATERIALIZATION onto the cached frame, and every ``rematerialize_every``
rounds the re-derived vocab materializes (eager localCheckpoint — the
repo's materialize-once idiom; at cluster scale a durable checkpoint/
parquet write is the drop-in equivalent). Fold-chain depth and plan
lineage are therefore bounded by R regardless of merge count: total fold
work is O(n_merges · vocab) with at most R-deep expression chains —
at tokenizer-real merge counts (10³–10⁴) the naive chain-everything form
is O(n_merges²) folds and unbounded plan depth (measured flat-per-round
at sf1 for n_merges ∈ {64, 256}; SCALING.md "BPE at depth").

Driver state: the learned merge table itself — n_merges rows, by
construction. The `.collect()` per round is exactly 1 row.

Greedy-apply equivalence note (why the fold is exact BPE): BPE's apply
replaces non-overlapping (a,b) occurrences left-to-right in one pass. The
fold maintains that invariant: the accumulator holds the already-rewritten
prefix, and a new symbol x merges iff the accumulator's LAST symbol equals
`a` and x equals `b`. A freshly merged `ab` can never re-merge as the left
side of the same rule in the same pass (it is no longer the symbol `a`) —
identical to the sequential semantics, including runs like [a,a] with rule
(a,a) → [aa] then the next `a` starts a new candidate.

Reference parity: the reference pipeline has no text operators at all
(SURVEY §2 — it is a trace aggregator); this is an extension operator for
the training-data surface. Oracle: `llm/oracles.py::bpe_train_sql`
(DuckDB list_reduce fold with a chr(1)-delimited string accumulator —
value-identical by the same equivalence argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..memo import register_memo
from ..session import scoped_conf
from .text import tokens

#: End-of-word marker appended to every word's symbol sequence (classic
#: Sennrich form — lets merges learn word-final subwords like "ing</w>").
#: Never collides with corpus symbols: initial symbols are single
#: characters, and every merged symbol containing it ends with it.
EOW = "</w>"

MERGES_SCHEMA = (
    "merge_rank bigint, left_sym string, right_sym string, "
    "merged string, pair_count bigint"
)


def _pretok_syms(word_col: str, pretokenizer: str) -> Column:
    """Base symbol array for one word under the chosen pretokenizer.

    ``"char"`` — unicode characters (the classic Sennrich form).
    ``"byte"`` — the word's UTF-8 BYTES, each rendered as a fixed-width
    uppercase hex pair (GPT-2-style byte-level fallback, Radford et al.
    2019 §2.2: every string decomposes into base symbols by
    construction, so a byte-level symbol table has NO out-of-vocabulary
    characters — the table reserves all 256 byte ids up front, see
    `bpe_symbol_table`). Hex pairs keep symbols printable and
    delimiter-free (the \\x01/\\x02 fold contract holds vacuously) and
    sort lexicographically == numerically (fixed width, uppercase), so
    the DuckDB twin's ORDER BY sym equals byte order. Both engines
    produce identical hex: Spark `hex(encode(w,'UTF-8'))` and DuckDB
    `hex(encode(w))` are uppercase over the same UTF-8 bytes."""
    if pretokenizer == "char":
        return F.expr(f"regexp_extract_all({word_col}, '.', 0)")
    if pretokenizer == "byte":
        return F.expr(
            f"regexp_extract_all(hex(encode({word_col}, 'UTF-8')), '..', 0)"
        )
    raise ValueError(f"unknown pretokenizer {pretokenizer!r}")


def _decode_word(hexish: Column, pretokenizer: str) -> Column:
    """Decode direction's final step: the EOW-stripped symbol
    concatenation is the word itself under ``"char"``, and the word's
    UTF-8 hex under ``"byte"`` (unhex → decode; exact inverse of
    `_pretok_syms` because merges concatenate, never reorder, bytes)."""
    if pretokenizer == "char":
        return hexish
    return F.decode(F.unhex(hexish), "UTF-8")


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Exact single-pass greedy apply of merge (a, b) → a+b as a fold.

    F.get (0-based, null-safe) keeps the empty-accumulator probe legal
    under ANSI mode: get([], -1) is NULL, NULL == a is NULL, and the
    WHEN condition treats NULL as false — no size() guard needed.

    r10 note: the QUERY paths no longer evaluate this fold — they run
    the provably-equivalent string form (`_apply_merge_str`, below),
    whose expression tree is ~50× smaller. The fold stays as the
    executable statement of the semantics and the randomized-test
    anchor (tests/test_bpe.py pins fold == string form == sequential
    reference)."""
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


#: delimiter for the string-form merge engine. Symbols can never contain
#: it: the operator's domain excludes \x01/\x02-bearing tokens on both
#: engines (see `bpe_train`), base symbols are single chars / hex pairs,
#: and merged symbols only concatenate existing ones.
_D = "\x01"


def _wrap_syms(syms: Column) -> Column:
    """Symbol array → delimited string: every symbol individually wrapped
    (``␟a␟␟b␟…``). The DOUBLE delimiter between symbols is load-bearing:
    it gives each merge-pattern occurrence its own leading/trailing
    delimiter, so one ``replace`` never consumes the boundary the next
    occurrence needs (``[a,b,a,b]`` with rule (a,b) must merge twice)."""
    return F.concat(F.lit(_D), F.array_join(syms, _D + _D), F.lit(_D))


def _unwrap_syms(s: Column) -> Column:
    """Inverse of `_wrap_syms` (arrays are never empty: EOW is always
    appended)."""
    return F.split(F.substring(s, 2, F.length(s) - 2), _D + _D)


def _apply_merge_str(s: Column, a: str, b: str) -> Column:
    """`_apply_merge` on the wrapped-string form: ONE codegen'd
    ``replace`` per merge instead of a per-element array fold.

    Equivalence: ``replace`` substitutes occurrences left-to-right and
    resumes scanning AFTER each replacement — exactly the fold's
    invariant (a freshly merged ``ab`` cannot re-match as the left side
    of the same rule in the same pass; the next symbol after it starts a
    new candidate, and its own wrap delimiters are intact thanks to the
    double-delimiter layout). Pinned against the fold and the
    sequential reference by tests/test_bpe.py."""
    return F.replace(
        s,
        F.lit(f"{_D}{a}{_D}{_D}{b}{_D}"),
        F.lit(f"{_D}{a + b}{_D}"),
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(wc, syms) → (left_sym, right_sym, pair_count): adjacent-pair counts
    weighted by word frequency. The explode is a projection (arrays_zip of
    two shifted slices); the aggregate is a hash aggregate with map-side
    partial combine — the shuffle carries the (tiny) pair domain, never
    the vocab."""
    return (
        vocab.where(F.size("syms") >= 2)
        .select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", F.lit(1), F.size("syms") - 1).alias("a"),
                    F.expr("slice(syms, 2, size(syms) - 1)").alias("b"),
                )
            ).alias("p"),
        )
        .groupBy(
            F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
        )
        .agg(F.sum("wc").cast("long").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    rematerialize_every: int = 16,
    pretokenizer: str = "char",
) -> DataFrame:
    """Learn the top `n_merges` BPE merges from a document corpus.

    → (merge_rank, left_sym, right_sym, merged, pair_count): one row per
    learned merge, in training order. pair_count is the (word-frequency
    weighted) number of adjacent occurrences at the time the pair was
    chosen — the classic BPE training log.

    ``rematerialize_every`` bounds fold-chain depth: the vocab
    re-materializes (eager localCheckpoint) every R learned merges, so
    round r chains at most R folds instead of r — the difference between
    O(n_merges·vocab) and O(n_merges²·vocab) total fold work at
    tokenizer-real merge counts. Results are identical for any R (each
    round still sees the vocab with ALL prior merges applied; pinned by
    tests/test_bpe.py). For n_merges ≤ R (the gated query: 8 ≤ 16) no
    checkpoint ever fires and the plan is unchanged.

    ``pretokenizer`` picks the base decomposition (`_pretok_syms`):
    ``"char"`` (default, classic Sennrich) or ``"byte"`` (GPT-2-style
    UTF-8 byte fallback — symbols are uppercase hex pairs; on a pure
    single-byte corpus the learned merge SEQUENCE is char-training's
    under the hex renaming, pinned by tests/test_bpe.py).

    Stops early (fewer rows than n_merges) if the vocabulary runs out of
    adjacent pairs — only reachable on degenerate corpora where every
    word has collapsed to a single symbol."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        # tokens containing \x01/\x02 are excluded on BOTH engines: the
        # DuckDB twin's fold accumulator uses those bytes as delimiters,
        # so the operator's domain excludes them by definition (binary
        # garbage, not text — the Spark array fold wouldn't care, but a
        # cross-engine-exact operator needs one shared domain)
        .where(
            ~F.col("w").contains("\x01") & ~F.col("w").contains("\x02")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    # the vocab persists in WRAPPED-STRING form (r10 optimization): each
    # round then chains one `replace` per pending merge — a constant-size
    # expression node — where the array-fold form chained per-element
    # aggregate lambdas whose construction + analysis cost grew with the
    # round number (measured: the 8-round loop's driver-side plan work
    # dominated its execution at sf0.1)
    base0 = words.select(
        "wc",
        _wrap_syms(
            F.concat(_pretok_syms("w", pretokenizer), F.array(F.lit(EOW)))
        ).alias("s"),
    ).persist()
    base = base0

    merges: list[tuple[int, str, str, str, int]] = []
    # merges applied since `base` last materialized — chained as replace
    # expressions each round; cleared when the vocab re-materializes
    applied: list[tuple[str, str]] = []
    # AQE off for the round loop (scoped_conf restores it): every round's
    # shuffle carries the PAIR DOMAIN — bounded by the symbol inventory
    # squared at any corpus scale — so runtime re-planning has nothing to
    # coalesce or re-join, and its extra per-exchange job materially
    # slows a loop that runs n_merges driver-synced micro-queries
    # (measured at sf0.1: ~2.5 jobs/round → 1). Scale-neutral: the
    # corpus-scale word count runs BEFORE the loop (under the session's
    # normal AQE — the count() below materializes the persist eagerly),
    # and the loop's map side reads the persisted vocab.
    base0.count()
    try:
        with scoped_conf(spark, {"spark.sql.adaptive.enabled": "false"}):
            for rank in range(1, n_merges + 1):
                s = F.col("s")
                for a, b in applied:
                    s = _apply_merge_str(s, a, b)
                cur = base.select("wc", _unwrap_syms(s).alias("syms"))
                pairs = pair_counts(cur)
                best = (
                    pairs.orderBy(
                        F.col("pair_count").desc(), "left_sym", "right_sym"
                    )
                    .limit(1)
                    .collect()
                )
                if not best:
                    break
                r = best[0]
                merges.append(
                    (
                        rank,
                        r.left_sym,
                        r.right_sym,
                        r.left_sym + r.right_sym,
                        r.pair_count,
                    )
                )
                applied.append((r.left_sym, r.right_sym))
                if rematerialize_every and len(applied) >= rematerialize_every:
                    s = F.col("s")
                    for a, b in applied:
                        s = _apply_merge_str(s, a, b)
                    base = base.select(
                        "wc", s.alias("s")
                    ).localCheckpoint(eager=True)
                    applied = []
                    # the checkpoint supersedes the initial persist — free
                    # it now (idempotent; the finally is the no-checkpoint
                    # path)
                    base0.unpersist()
    finally:
        # the one explicit persist; checkpointed frames free with GC
        base0.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


#: same-session reuse of a COLLECTED merge table (driver rows — n_merges
#: by construction). bpe_train / bpe_encode / bpe_roundtrip all replay
#: the same 8-round training loop over the same corpus; the
#: multi-consumer-subtree rule (memo.py) applies exactly as for the path
#: table: first consumer pays, same-pass consumers reuse, bench passes
#: clear it. Keyed by (caller memo key, n_merges, text col, pretokenizer).
_MERGES_MEMO: dict = register_memo({})


def learned_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    pretokenizer: str = "char",
    memo_key: str | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """`bpe_train` collected to driver rows, rank-ascending →
    [(merge_rank, left_sym, right_sym, merged, pair_count)]. Opt-in
    memoized under ``memo_key`` (callers must key by corpus snapshot +
    any input transform — see __spark_entry__._memo_key)."""
    key = None
    if memo_key is not None:
        key = (memo_key, n_merges, text_col, pretokenizer)
        hit = _MERGES_MEMO.get(key)
        if hit is not None:
            return hit
    rows = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train(
            docs,
            n_merges=n_merges,
            text_col=text_col,
            pretokenizer=pretokenizer,
        ).collect()
    )
    if key is not None:
        _MERGES_MEMO[key] = rows
    return rows


def apply_merges(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    syms_col: str = "syms",
    rematerialize_every: int = 16,
) -> DataFrame:
    """Apply a LEARNED merge list (rank order) to a symbol-array column.

    The merge table is driver state by construction (n_merges rows), so
    the merges arrive as plain Python pairs and each becomes one
    `_apply_merge_str` replace on the wrapped-string form (exact greedy
    semantics per merge — see `_apply_merge_str`), applied in training
    order (the BPE encode contract: encoding replays the merge history).
    Every ``rematerialize_every`` merges the frame materializes (eager
    localCheckpoint), bounding expression/lineage depth at R for
    arbitrarily long merge lists — the same flat-per-round shape as
    training. Input and output stay symbol ARRAYS; the string form is
    internal."""
    out = vocab
    col: Column = _wrap_syms(F.col(syms_col))
    pending = 0
    for a, b in merges:
        col = _apply_merge_str(col, a, b)
        pending += 1
        if rematerialize_every and pending >= rematerialize_every:
            out = out.withColumn(syms_col, col).localCheckpoint(eager=True)
            # the checkpointed column holds the wrapped STRING form;
            # chain further replaces directly on it
            col = F.col(syms_col)
            pending = 0
    return out.withColumn(syms_col, _unwrap_syms(col))


def bpe_symbol_table(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
    pretokenizer: str = "char",
) -> DataFrame:
    """Contiguous symbol→id table for a learned BPE tokenizer →
    (sym, sym_id), sym_id dense from 1 (0 stays reserved for pad/OOV,
    the `vocab_encode` convention): base characters observed in the
    word vocabulary first (codepoint order), then the EOW marker, then
    merged symbols in TRAINING order — the classic GPT-2-style layout
    (base inventory, then one id per merge).

    Duplicate symbol strings collapse to the earliest tier/rank: two
    merges can produce the same string (("a","bc") and ("ab","c") both
    yield "abc"), and an adversarial corpus can even merge up a literal
    EOW string — the id table is keyed by the symbol STRING, so the
    first occurrence wins (merged dups are dropped driver-side from the
    n_merges-row list; a merged EOW dup folds onto the EOW id, and the
    encode∘decode identity flag goes false on such corpora — the
    documented domain edge, same spirit as the \\x01/\\x02 exclusion).

    The id RANK is assigned by sorting on (tier, codepoint | rank, sym)
    — for single characters codepoint order equals binary UTF-8 order,
    which is what the DuckDB twin's ORDER BY (tier, rank, sym) produces
    — cross-engine identical ids.

    ``pretokenizer="byte"`` switches to the GPT-2 byte-level layout:
    tier 0 is ALL 256 byte symbols (uppercase hex pairs, byte order —
    reserved up front whether observed or not, which is the byte-level
    point: any future text encodes with NO out-of-vocabulary base
    symbol), then EOW, then merges in training order; the numeric tier-0
    value is the byte value, and fixed-width uppercase
    hex makes the twin's lexicographic ORDER BY sym equal byte order.

    r10 optimization: id assignment is DRIVER-side. The table is bounded
    by construction — 256 byte symbols (byte mode) or the observed
    single-character ALPHABET (char mode), plus EOW, plus the n_merges
    driver rows — so ranking it through the two-phase distributed
    row_number spent several Spark jobs ordering a few hundred rows
    (measured: 4.2 s of the 10.6 s byte round-trip at sf0.1 was this
    table build). Char mode keeps ONE tiny job (the distinct-alphabet
    collect over the vocab — the same bounded-collect class as the
    merge table itself); byte mode launches no job at all. Sort key and
    ids are IDENTICAL to the distributed form's; the oracle twin
    recomputes them independently, so the gate pins the equivalence."""
    spark = words.sparkSession
    rows: list[tuple[str, int, int]] = []  # (sym, tier, value-or-rank)
    if pretokenizer == "byte":
        # all 256 byte symbols reserved up front (GPT-2 layout — the
        # no-OOV property); 256 rows, driver-side by construction
        rows.extend((f"{i:02X}", 0, i) for i in range(256))
    else:
        # observed base-symbol alphabet: distinct single characters,
        # bounded by the character inventory. ord() is the exact driver
        # twin of the previous plan's ascii() range value.
        alpha = (
            words.select(
                F.explode(_pretok_syms(word_col, pretokenizer)).alias("sym")
            )
            .distinct()
            .collect()
        )
        rows.extend((r.sym, 0, ord(r.sym[0])) for r in alpha)
    rows.append((EOW, 1, 0))
    seen = {EOW}
    for rank, (a, b) in enumerate(merges, start=1):
        m = a + b
        if m not in seen:
            seen.add(m)
            rows.append((m, 2, rank))
    rows.sort(key=lambda r: (r[1], r[2], r[0]))
    return spark.createDataFrame(
        [(sym, i) for i, (sym, _, _) in enumerate(rows, start=1)],
        "sym string, sym_id long",
    )


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    rematerialize_every: int = 16,
    pretokenizer: str = "char",
) -> DataFrame:
    """Encode a corpus to contiguous BPE token IDS and verify the
    round-trip → (doc_id, n_words, n_ids, ids_str, roundtrip_ok):
    per document, the word count, total id count, the full id stream
    (space-joined, words in document order — the stream a pretraining
    loader reads), and whether DECODING that stream (ids → symbols →
    strip EOW → space-join words) reproduces the document's normalized
    text exactly. roundtrip_ok is computed from the REAL decode path —
    ids join back through the symbol table's inverse — so a broken
    table, a wrong merge apply, or a reordered reassembly all flip it.

    Scale decomposition mirrors `bpe_encode` — the corpus never folds
    and never decodes: merges apply once to the distinct-word VOCAB,
    ids and decoded words are derived per VOCAB WORD (explode+join on
    the broadcast symbol table, vocab-sized both ways), and the corpus
    pays exactly one word→(ids, decoded) equi-join plus one doc-keyed
    ordered reassembly. Documents with zero tokens drop (nothing to
    encode; same on the DuckDB twin).

    ``pretokenizer="byte"`` runs the GPT-2-style byte-level form: base
    symbols are UTF-8 hex pairs (`_pretok_syms`), the symbol table
    reserves all 256 byte ids (no OOV by construction), and the decode
    direction ends with unhex→UTF-8 decode (`_decode_word`) — so
    ``roundtrip_ok`` certifies the identity THROUGH the byte layer,
    multibyte characters included."""
    wp = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(text_col)).alias("pos", "w"),
        )
        .where(~F.col("w").contains("\x01") & ~F.col("w").contains("\x02"))
    )
    # materialize-once: the distinct-word vocab fans out to four
    # consumers (merge apply, symbol table — whose two-phase rank also
    # runs eager internal jobs at build time — encode ids, decode), each
    # an action over this frame; without the checkpoint every consumer
    # re-runs the corpus tokenize+distinct (measured 19.7 s → 4.6 s at
    # sf0.1). Vocab-sized (Zipf-bounded); at cluster scale a durable
    # checkpoint/parquet write is the drop-in equivalent (the bpe_train
    # idiom).
    vocab = (
        wp.select("w")
        .distinct()
        .select(
            "w",
            F.concat(
                _pretok_syms("w", pretokenizer), F.array(F.lit(EOW))
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    enc = apply_merges(vocab, merges, rematerialize_every=rematerialize_every)
    symtab = bpe_symbol_table(vocab, merges, pretokenizer=pretokenizer)
    # vocab-side: word → ordered id array (encode direction).
    # Checkpointed too: the decode stage and the final word_table join
    # would otherwise both replay the fold+explode+agg pipeline.
    wids = (
        enc.select("w", F.posexplode("syms").alias("i", "sym"))
        .join(F.broadcast(symtab), "sym")
        .groupBy("w")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "sym_id"))),
                lambda s: s["sym_id"],
            ).alias("ids")
        )
        .localCheckpoint(eager=True)
    )
    # vocab-side: ids → decoded word through the INVERSE table (decode
    # direction — deliberately not a shortcut through `syms`)
    dec = (
        wids.select("w", F.posexplode("ids").alias("j", "sym_id"))
        .join(F.broadcast(symtab), "sym_id")
        .groupBy("w")
        .agg(
            _decode_word(
                F.expr(
                    f"replace(concat_ws('', transform(array_sort("
                    f"collect_list(struct(j, sym))), s -> s.sym)), '{EOW}', '')"
                ),
                pretokenizer,
            ).alias("w_dec")
        )
    )
    word_table = wids.join(dec, "w")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "w", "ids", "w_dec")))
    return (
        wp.join(word_table, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.size("ids")).cast("long").alias("n_ids"),
            F.array_join(
                F.transform(
                    F.flatten(F.transform(ordered, lambda s: s["ids"])),
                    lambda x: x.cast("string"),
                ),
                " ",
            ).alias("ids_str"),
            (
                F.array_join(
                    F.transform(ordered, lambda s: s["w_dec"]), " "
                )
                == F.array_join(F.transform(ordered, lambda s: s["w"]), " ")
            ).alias("roundtrip_ok"),
        )
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    rematerialize_every: int = 16,
    pretokenizer: str = "char",
) -> DataFrame:
    """Encode a corpus with a learned BPE merge table.

    → (doc_id, n_words, n_tokens, encoded): per document, its word count,
    total encoded-symbol count, and the full encoded symbol stream
    (symbols space-joined, words in document order, EOW markers kept —
    the text a tokenizer-consuming trainer would read).

    Scale decomposition mirrors training — the corpus NEVER runs a fold:
    merges apply once to the distinct-word VOCAB (`apply_merges`,
    vocab-sized, Zipf-bounded — millions of rows where the corpus has
    trillions of tokens), then one word→encoding equi-join rebuilds
    documents (AQE broadcasts the encoded vocab when it fits, else a
    shuffled hash join — both correct at their vocab sizes) and one
    doc-keyed aggregation reassembles order via the sort-struct-flatten
    idiom (positions from posexplode BEFORE the delimiter-domain filter,
    so excluded words leave gaps but never reorder). Documents with zero
    tokens have nothing to encode and drop from the output (same on the
    DuckDB twin).

    Word positions, not trace of the merge loop: encoding a word is
    independent of every other word, so this is embarrassingly parallel
    and deterministic for a fixed merge list."""
    wp = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(text_col)).alias("pos", "w"),
        )
        # same delimiter-domain filter as training (llm/bpe.py top note)
        .where(~F.col("w").contains("\x01") & ~F.col("w").contains("\x02"))
    )
    vocab = wp.groupBy("w").agg(F.count(F.lit(1)).alias("_wc")).select(
        "w",
        F.concat(
            _pretok_syms("w", pretokenizer), F.array(F.lit(EOW))
        ).alias("syms"),
    )
    enc = apply_merges(vocab, merges, rematerialize_every=rematerialize_every)
    return (
        wp.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.size("syms")).cast("long").alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "syms"))
                        ),
                        lambda s: s["syms"],
                    )
                ),
                " ",
            ).alias("encoded"),
        )
    )
