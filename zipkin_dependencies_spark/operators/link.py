"""The per-trace linking operator — the one non-relational kernel (SURVEY §2.6).

Spark mapping (a) from the survey: ``groupBy(trace_key).applyInPandas`` over
the Arrow channel, executing the pure-Python linker per trace. Each group is
one trace; output is the per-trace link table, which the global A2 aggregation
then sums. Map-side cost is bounded: the kernel's output cardinality is
O(|services|²) per trace, orders of magnitude smaller than its input.

Scale notes (100 TB):
- the groupBy(trace_key) shuffle is THE big shuffle of the pipeline; AQE
  coalesces post-shuffle partitions. Bucketed span storage on trace_key would
  remove it entirely (G1 parity — see plans/job.py notes).
- per-trace skew ("Heavy" scenario): one giant trace lands on one task. The
  kernel is O(n) in spans-per-trace with small constants (dict/deque), and
  holds only one trace's 8 narrow columns in memory at once — a 10⁷-span
  trace is ~1 GB of Python objects, survivable; two-phase subtree linking is
  the round-2+ hardening for anything beyond that.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..linker import DependencyLinker, Span, trace_in_day_window
from ..schemas import TRACE_LINKS_SCHEMA


def _rows_to_spans(pdf: pd.DataFrame) -> list[Span]:
    # itertuples over 8 narrow columns; avoids pandas .apply overhead
    return [
        Span(
            parent_id=p if isinstance(p, str) else None,
            id=i if isinstance(i, str) else None,
            kind=k if isinstance(k, str) else None,
            local_service=ls if isinstance(ls, str) else None,
            remote_service=rs if isinstance(rs, str) else None,
            shared=bool(sh) if sh is not None and sh == sh else False,
            is_error=bool(er) if er is not None and er == er else False,
            timestamp=int(ts) if ts is not None and ts == ts else None,
        )
        for p, i, k, ls, rs, sh, er, ts in zip(
            pdf["parent_id"].values,
            pdf["id"].values,
            pdf["kind"].values,
            pdf["local_service"].values,
            pdf["remote_service"].values,
            pdf["shared"].values,
            pdf["is_error"].values,
            pdf["timestamp"].values,
        )
    ]


def make_trace_linker(window: tuple[int, int] | None = None):
    """Build the grouped-map function. ``window=(start_us, end_us)`` enables
    the F2 per-trace root-timestamp filter *inside* the kernel — zero extra
    shuffle, exactly where the reference applies it
    (cassandra3/.../SpansToDependencyLinks.java:36-42)."""

    def link_one_trace(pdf: pd.DataFrame) -> pd.DataFrame:
        spans = _rows_to_spans(pdf)
        if window is not None and not trace_in_day_window(spans, *window):
            return pd.DataFrame(columns=["parent", "child", "call_count", "error_count"])
        links = DependencyLinker().put_trace(spans).link()
        if not links:
            return pd.DataFrame(columns=["parent", "child", "call_count", "error_count"])
        return pd.DataFrame(links)[["parent", "child", "call_count", "error_count"]]

    return link_one_trace


def trace_links(normalized_spans: DataFrame, window: tuple[int, int] | None = None) -> DataFrame:
    """LINK_INPUT_SCHEMA rows → per-trace links (pre-aggregation).

    Reference strategy: one applyInPandas group per trace. Semantically the
    cleanest mapping, but each group pays a fixed Arrow/pandas round-trip —
    with millions of small traces that per-group overhead dominates. Kept as
    the cross-check implementation; the production path is
    ``trace_links_partitioned``."""
    return normalized_spans.groupBy("trace_key").applyInPandas(
        make_trace_linker(window), schema=TRACE_LINKS_SCHEMA
    )


def trace_links_partitioned(
    normalized_spans: DataFrame,
    window: tuple[int, int] | None = None,
    num_partitions: int | None = None,
    day_col: str | None = None,
    isolate_heavy_over: int | None = None,
    clustered: bool = False,
    heavy_sample_fraction: float = 0.05,
) -> DataFrame:
    """Scale path: repartition by trace_key + sortWithinPartitions, then one
    mapInPandas pass that walks each partition's sorted stream, cutting trace
    groups at key boundaries (the reference's MySQL sorted-iterator shape,
    mysql/.../DependencyLinkSpanIterator.java:25-56, done with a secondary
    sort instead of a peeking iterator).

    Why this wins at 100 TB:
    - ONE shuffle (same exchange the groupBy needs anyway), but the Python
      boundary is crossed once per *partition*, not once per *trace*:
      Arrow batches stream through, and only the partial trace at a batch
      boundary is carried over — O(batch) memory, not O(partition).
    - links are partially aggregated map-side into a dict before emission,
      so the final A2 exchange moves one row per distinct (parent, child)
      per partition — the reference's reduceByKey combiner, done one stage
      earlier than Catalyst's HashAggregate(partial) would.
    - skew: a giant trace still lands on one task (matching applyInPandas),
      but costs only its own O(n) linking, with no per-trace setup tax.

    With ``day_col`` set, the group key becomes (day, trace_key) and the
    output carries ``day`` — one job links every affected day (the streaming
    incremental mode and multi-day backfills use this instead of a per-day
    driver loop).

    ``clustered=True`` declares the input already hash-clustered on the
    group key (a bucketed span table, sources/bucketed.py): the repartition
    is skipped and the pipeline's one span-scale shuffle disappears — the
    G1 ``spanBy`` parity path. The caller owns the guarantee; a mis-declared
    input would split traces across tasks and under-link them.

    ``isolate_heavy_over=N`` adds skew routing (the reference's Heavy IT
    hazard, SURVEY §4: AQE skew splitting can't apply to stateful Python
    stages because one trace MUST stay whole): a pre-pass counts spans per
    trace, and traces above N spans get a dedicated routing key so the hash
    exchange places each giant trace alone instead of stacking it on top of
    a normal partition's worth of other traces. Linking a giant trace is
    still one task — O(n) with small constants — but it no longer makes
    stragglers of everyone hashed alongside it.

    Heavy discovery is SAMPLED (``heavy_sample_fraction``, seeded): a trace
    with n spans surfaces ~n·f sampled rows, so thresholding sampled counts
    at N·f/2 finds every genuinely heavy key with overwhelming probability
    while scanning only f of the table — at 100 TB the full
    ``groupBy().count()`` pre-pass would itself be a span-scale aggregation.
    Mis-detection is safe by construction: a missed heavy trace still links
    correctly (just co-hashed, slower), a false positive merely routes a
    light trace alone — the RESULT is placement-independent. Pass
    ``heavy_sample_fraction=1.0`` to force the exact count (tiny inputs
    where a sample is noise).

    ``isolate_heavy_over`` is incompatible with ``clustered=True``: routing
    requires a repartition, which would silently reintroduce the span-scale
    shuffle the clustered caller explicitly opted out of — that combination
    raises. Heavy traces in bucketed layouts are isolated at write time
    (bucket count / bucketing key choice), not per-job.
    """
    if clustered and isolate_heavy_over:
        raise ValueError(
            "isolate_heavy_over requires a repartition, but clustered=True "
            "declares a shuffle-free pre-bucketed input; re-bucket heavy "
            "traces at write time or drop one of the two options"
        )
    group_cols = ([day_col] if day_col else []) + ["trace_key"]
    # Secondary sort keys make the per-trace span ORDER deterministic. The
    # kernel's root election ("first parentless span", linker.py build_tree)
    # depends on arrival order; without these a multi-root trace could elect
    # a different root per run. Sorting by (id, shared) pins it to the
    # lowest span id — zero extra shuffle, the sort already exists.
    order_cols = [*group_cols, "id", "shared"]
    out_cols = ([day_col] if day_col else []) + [
        "parent", "child", "call_count", "error_count",
    ]
    schema = (
        TRACE_LINKS_SCHEMA
        if not day_col
        else T.StructType(
            [T.StructField(day_col, T.DateType()), *TRACE_LINKS_SCHEMA.fields]
        )
    )

    def link_partition(batches: Iterable[pd.DataFrame]):
        import numpy as np

        from ..worker_logging import init_worker_logging

        init_worker_logging()  # executor-side ZIPKIN_LOG_LEVEL bootstrap

        # one accumulator per (task, day) = the reference's per-task linker
        # (CassandraRowsToDependencyLinks) doubling as the map-side combiner
        linkers: dict = {}

        def flush(gkey: tuple, spans: list[Span]) -> None:
            if window is not None and not trace_in_day_window(spans, *window):
                return
            day = gkey[0] if day_col else None
            linkers.setdefault(day, DependencyLinker()).put_trace(spans)

        def group_key_arrays(pdf: pd.DataFrame) -> tuple:
            return tuple(pdf[c].to_numpy() for c in group_cols)

        carry_key: tuple | None = None
        carry_spans: list[Span] = []
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            key_arrs = group_key_arrays(pdf)
            # boundary where ANY key column changes between adjacent rows
            changed = key_arrs[0][1:] != key_arrs[0][:-1]
            for arr in key_arrs[1:]:
                changed = changed | (arr[1:] != arr[:-1])
            spans_all = _rows_to_spans(pdf)
            starts = [0, *(np.flatnonzero(changed) + 1).tolist(), n]
            key_at = lambda i: tuple(arr[i] for arr in key_arrs)  # noqa: E731
            gi = 0
            if carry_spans:
                if carry_key == key_at(0):
                    carry_spans.extend(spans_all[0 : starts[1]])
                    if len(starts) == 2:
                        continue  # whole batch is one group — keep carrying
                    flush(carry_key, carry_spans)
                    gi = 1
                else:
                    flush(carry_key, carry_spans)
                carry_spans = []
                carry_key = None
            # all groups except the batch's last are complete
            for i in range(gi, len(starts) - 2):
                flush(key_at(starts[i]), spans_all[starts[i] : starts[i + 1]])
            carry_key = key_at(starts[-2])
            carry_spans = list(spans_all[starts[-2] : starts[-1]])
        if carry_spans:
            flush(carry_key, carry_spans)
        rows = [
            (
                (day, link["parent"], link["child"], link["call_count"], link["error_count"])
                if day_col
                else (link["parent"], link["child"], link["call_count"], link["error_count"])
            )
            for day, linker in linkers.items()
            for link in linker.link()
        ]
        yield pd.DataFrame(rows, columns=out_cols)

    # explicit partition count: AQE sizes post-shuffle partitions by BYTES,
    # which under-parallelizes a Python-cost-bound stage (spans are narrow;
    # linking cost per byte is high). Floor at the cluster's core count so
    # every core links; at real scale pass ~2-4× cores for stragglers.
    if num_partitions is None:
        num_partitions = max(
            normalized_spans.sparkSession.sparkContext.defaultParallelism,
            int(normalized_spans.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
        )
    df = normalized_spans
    if isolate_heavy_over:
        # identify heavy traces (tiny result: skew means FEW keys); broadcast
        # the set into a routing column. Light traces route by their group
        # hash; each heavy trace routes by its own key ⇒ lands alone.
        if heavy_sample_fraction >= 1.0:
            counted = df.groupBy(*group_cols).count()
            cutoff = float(isolate_heavy_over)
        else:
            counted = (
                df.sample(fraction=heavy_sample_fraction, seed=11)
                .groupBy(*group_cols)
                .count()
            )
            cutoff = max(1.0, isolate_heavy_over * heavy_sample_fraction / 2.0)
        heavy = (
            counted.filter(F.col("count") > cutoff)
            .select(F.concat_ws("|", *group_cols).alias("__gk"))
        )
        gk = F.concat_ws("|", *group_cols)
        df = (
            df.join(
                F.broadcast(heavy.withColumn("__heavy", F.lit(True))),
                gk == F.col("__gk"),
                "left_outer",
            )
            .withColumn(
                "__route",
                F.when(F.col("__heavy"), F.concat(F.lit("H:"), gk)).otherwise(
                    F.pmod(F.hash(gk), F.lit(num_partitions)).cast("string")
                ),
            )
            .drop("__gk", "__heavy")
        )
        out = (
            df.repartition(num_partitions, "__route")
            .sortWithinPartitions(*order_cols)
            .drop("__route")
            .mapInPandas(link_partition, schema=schema)
        )
        return out
    if clustered:
        # bucketed input: complete traces per partition by construction;
        # only the in-partition sort (no exchange) remains
        return df.sortWithinPartitions(*order_cols).mapInPandas(
            link_partition, schema=schema
        )
    return (
        df.repartition(num_partitions, *group_cols)
        .sortWithinPartitions(*order_cols)
        .mapInPandas(link_partition, schema=schema)
    )


def links_from_spans(
    normalized_spans: DataFrame,
    window: tuple[int, int] | None = None,
    strategy: str = "partitioned",
    clustered: bool = False,
    isolate_heavy_over: int | None = None,
    heavy_sample_fraction: float = 0.05,
) -> DataFrame:
    """Full core: per-trace linking + global A2 reduction.

    strategy='partitioned' (default): sorted-stream partition linking with
    map-side combine. strategy='grouped': one applyInPandas call per trace —
    the reference-shaped cross-check path. clustered=True: input is a
    bucketed span table; skip the grouping shuffle (G1 parity).
    isolate_heavy_over=N: route giant traces to dedicated partitions (skew
    isolation — must never change the result, only the placement)."""
    from .aggregate import aggregate_links

    if strategy == "partitioned":
        return aggregate_links(
            trace_links_partitioned(
                normalized_spans,
                window,
                clustered=clustered,
                isolate_heavy_over=isolate_heavy_over,
                heavy_sample_fraction=heavy_sample_fraction,
            )
        )
    if strategy == "grouped":
        return aggregate_links(trace_links(normalized_spans, window))
    raise ValueError(f"unknown strategy {strategy!r}")


def links_from_spans_two_phase(
    normalized_spans: DataFrame,
    giant_over: int = 100_000,
    heavy_sample_fraction: float = 0.05,
) -> DataFrame:
    """Two-phase linking for GIANT traces (SURVEY §4's one custom scale
    piece; the reference's Heavy IT hazard taken past what isolation fixes,
    ITCassandraDependenciesHeavy.java:17-31).

    ``isolate_heavy_over`` keeps a giant trace from straggling its
    neighbors, but the trace itself is still ONE task — a 10⁸-span trace is
    hours on one core. This operator splits the giant trace ACROSS tasks:

    - phase 1 (subtree phase): giant traces route to the pure-Catalyst
      relational linker (operators/link_relational.py) whose operations key
      on per-SPAN attributes — candidate explode + parent-resolution join,
      per-span kind matrix — so one trace's spans spread over the whole
      cluster; resolving each span's tree parent IS linking its one-hop
      subtree, and AQE's skew-join splitting absorbs hot parent keys
      (it applies here precisely because nothing is a stateful Python
      group). Giants the relational path can't own (dup span keys, deep or
      cyclic chains — eligibility E1-E4) fall back to the kernel, isolated.
    - phase 2 (merge phase): the per-span link emissions from both routes
      merge in the global (parent, child) aggregate — boundary spans need
      no special casing because every span's emission depends only on its
      resolved parent chain, which phase 1 materialized.

    Results are byte-equal to the kernel path on every input (the hybrid ==
    kernel contract is pinned by randomized cross-checks in
    tests/test_link_relational.py; the giant split by tests/test_skew.py).

    Giant discovery reuses the sampled detector (seeded; a missed giant
    still links correctly via the kernel, just slower — placement-only)."""
    from .aggregate import aggregate_links
    from .link_relational import links_from_spans_hybrid

    df = normalized_spans
    if heavy_sample_fraction >= 1.0:
        counted = df.groupBy("trace_key").count()
        cutoff = float(giant_over)
    else:
        counted = (
            df.sample(fraction=heavy_sample_fraction, seed=11)
            .groupBy("trace_key")
            .count()
        )
        cutoff = max(1.0, giant_over * heavy_sample_fraction / 2.0)
    giants = counted.filter(F.col("count") > cutoff).select("trace_key")

    # key-cardinality driver check (like the reference's isEmpty() actions,
    # F5): on the overwhelmingly common day with NO giant trace, skip the
    # relational branch entirely — its eligibility machinery costs several
    # materialization rounds that would all run on empty input
    if giants.isEmpty():
        return links_from_spans(df)

    tagged = df.join(
        F.broadcast(giants.withColumn("_giant", F.lit(True))),
        "trace_key",
        "left_outer",
    )
    giant_links = links_from_spans_hybrid(tagged.filter(F.col("_giant")).drop("_giant"))
    normal_links = links_from_spans(tagged.filter(F.col("_giant").isNull()).drop("_giant"))
    return (
        giant_links.unionByName(normal_links)
        .groupBy("parent", "child")
        .agg(
            F.sum("call_count").alias("call_count"),
            F.sum("error_count").alias("error_count"),
        )
    )
