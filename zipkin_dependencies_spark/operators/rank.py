"""Two-phase distributed rank — row_number() without a partition-sized sort.

The problem at 100 TB: ``row_number() OVER (PARTITION BY g ORDER BY v)``
ships EVERY row of a group to one task and sorts it there — fine when
groups are small, a single-task sort of a billion rows when the partition
column is low-cardinality (5 market segments, one global rank, a handful
of sources). AQE cannot split a window partition; the stage runs at the
speed of its fattest group.

The classic fix (the sort-merge ranking every external-sort engine uses,
re-expressed as DataFrame ops):

  1. RANGE-BUCKET each row by its order VALUE: split points come from
     ``approxQuantile`` over a bounded sample, so each (group, bucket)
     holds ~1/n_buckets of the group. Bucketing is a function of the
     value alone — equal values land in the SAME bucket by construction,
     so no tie can straddle a bucket boundary and within-bucket order +
     cross-bucket offset compose to the exact global rank.
  2. COUNT rows per (group, bucket) — a hash aggregate, map-side
     combined — and prefix-sum the counts into per-bucket OFFSETS on the
     driver. The collect is (groups × n_buckets) rows: bounded by
     construction, never data-sized.
  3. row_number() OVER (PARTITION BY group, bucket ORDER BY ...) + offset
     — every window partition is now ~1/n_buckets of a group, sized by a
     knob instead of by the data.

Same contract as the window it replaces: ``distributed_row_number`` is
value-for-value identical to ``F.row_number().over(Window.partitionBy(
*groups).orderBy(value, *tiebreaks))`` (the equality test pins this), so
callers swap it in without touching downstream arithmetic — the
customer_spend_gini rank formula runs unchanged on top.

Reference parity: the reference has no ranking operators (SURVEY §2 —
its one aggregation is the link count sum); this is an extension
operator backing the 100 TB swap documented at
``__spark_entry__.q_customer_spend_gini``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    partition_by: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    n_buckets: int = 64,
    out_col: str = "i",
) -> DataFrame:
    """``df`` + ``out_col`` = row_number over (PARTITION BY partition_by
    ORDER BY value_col, *tiebreak_cols), computed with bounded-size sorts.

    ``value_col`` must be numeric/orderable; (value_col, *tiebreak_cols)
    must totally order each group (the usual unique-key tiebreak) or the
    assigned numbers within a tie run are arbitrary — exactly the window
    function's own contract.

    n_buckets sizes the per-task sort: each (group, bucket) window holds
    ~group_rows/n_buckets rows. The driver materializes one offset row
    per (group, bucket) — tune n_buckets to the executor sort budget, it
    never needs to scale with the data (1024 buckets × 8 GB sorts covers
    a multi-TB group)."""
    # same internal-name clash guard as distributed_prefix_sums (r09
    # review): a caller column named __bkt/__off/__n would be silently
    # clobbered by the withColumn/join below and dropped on the way out
    internal_clash = {"__bkt", "__off", "__n"} & set(df.columns)
    if internal_clash:
        raise ValueError(
            "input columns collide with internal row-number names: "
            f"{sorted(internal_clash)}"
        )
    # 1. split points from a bounded sample (relativeError 0.01 — splits
    # only LOAD-BALANCE the per-bucket sorts; ranks are exact whatever
    # the splits, and the loose sketch is ~3x cheaper to build);
    # duplicates collapse so a
    # heavily-tied value column degrades to fewer (fatter) buckets,
    # never to wrong ranks. NULL values route to bucket -1: it sorts
    # before every real bucket, matching the window twin's nulls-first
    # default (approxQuantile ignores nulls, and a null comparison
    # would otherwise null out the bucket expression entirely).
    qs = [i / n_buckets for i in range(1, n_buckets)]
    splits = sorted(
        set(df.stat.approxQuantile(value_col, qs, 0.01))
    )
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + (F.col(value_col) > F.lit(s)).cast("int")
    bucket = F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(bucket)
    bucketed = df.withColumn("__bkt", bucket)

    # 2. per-(group, bucket) counts -> driver prefix sum -> offsets.
    # The collect is groups x n_buckets rows: a size the CALLER chose,
    # not one the data did.
    counts = (
        bucketed.groupBy(*partition_by, "__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    by_group: dict[tuple, list] = {}
    for r in counts:
        by_group.setdefault(tuple(r[c] for c in partition_by), []).append(
            (r["__bkt"], r["__n"])
        )
    offset_rows = []
    for g, lst in by_group.items():
        acc = 0
        for bkt, n in sorted(lst):
            offset_rows.append((*g, bkt, acc))
            acc += n
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        offset_rows,
        schema=bucketed.select(
            *partition_by, F.col("__bkt"), F.lit(0).cast("long").alias("__off")
        ).schema,
    )

    # 3. bounded within-bucket window + broadcast offset join
    w = Window.partitionBy(*partition_by, "__bkt").orderBy(
        F.col(value_col), *[F.col(c) for c in tiebreak_cols]
    )
    return (
        bucketed.join(F.broadcast(offsets), [*partition_by, "__bkt"])
        .withColumn(
            out_col, (F.row_number().over(w) + F.col("__off")).cast("long")
        )
        .drop("__bkt", "__off")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 64,
    out_col: str = "cum_before",
) -> DataFrame:
    """``df`` + ``out_col`` = EXCLUSIVE running sum of ``weight_col`` in
    (order_col, *tiebreak_cols) order — the distributed twin of
    ``sum(w) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``,
    which in Spark is a SINGLE-PARTITION window (every row through one
    task) and therefore unusable at scale.

    Same two-phase shape as ``distributed_row_number``: range-bucket on
    the order value (equal values can't straddle buckets), per-bucket
    weight totals prefix-sum into offsets on the driver (n_buckets rows),
    within-bucket running sum + offset. (order_col, *tiebreaks) must
    totally order the rows; weights must be integral (exact prefix sums
    are the point — float weights reintroduce fold-order drift)."""
    return distributed_prefix_sums(
        df,
        order_col,
        [weight_col],
        tiebreak_cols=tiebreak_cols,
        n_buckets=n_buckets,
        out_cols=[out_col],
    )


def distributed_prefix_sums(
    df: DataFrame,
    order_col: str,
    weight_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 64,
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Multi-weight form of ``distributed_prefix_sum``: ONE bucketing pass
    (one approxQuantile sketch, one offset collect of n_buckets rows, one
    within-bucket window) computing the exclusive running sum of EVERY
    column in ``weight_cols`` over the same (order_col, *tiebreaks) order.
    Callers that need k running sums on one ordering (two-sample ECDF
    statistics, cumulative debit/credit ledgers) pay the two-phase cost
    once instead of k times."""
    tiebreak_cols = tiebreak_cols or []
    out_cols = out_cols or [f"{w}_cum_before" for w in weight_cols]
    if len(out_cols) != len(weight_cols):
        raise ValueError("out_cols must pair 1:1 with weight_cols")
    # caller "__"-prefixed columns pass through untouched ONLY if they
    # don't collide with the names this function generates — a caller
    # column literally named __bkt / __off{i} would be silently clobbered
    # by the withColumn/join below, so it gets the same loud ValueError
    # as an out_cols clash
    internal = {"__bkt", *(f"__off{i}" for i in range(len(weight_cols)))}
    internal_clash = internal & set(df.columns)
    if internal_clash:
        raise ValueError(
            "input columns collide with internal prefix-sum names: "
            f"{sorted(internal_clash)}"
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    splits = sorted(set(df.stat.approxQuantile(order_col, qs, 0.01)))
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + (F.col(order_col) > F.lit(s)).cast("int")
    # NULL order values -> bucket -1 (nulls-first, same as the window twin)
    bucket = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(bucket)
    bucketed = df.withColumn("__bkt", bucket)

    counts = (
        bucketed.groupBy("__bkt")
        .agg(
            *[
                F.sum(w).cast("long").alias(f"__w{i}")
                for i, w in enumerate(weight_cols)
            ]
        )
        .collect()
    )
    accs = [0] * len(weight_cols)
    offset_rows = []
    for r in sorted(counts, key=lambda r: r["__bkt"]):
        offset_rows.append((r["__bkt"], *accs))
        for i in range(len(weight_cols)):
            accs[i] += r[f"__w{i}"] or 0
    off_schema = "__bkt int, " + ", ".join(
        f"__off{i} long" for i in range(len(weight_cols))
    )
    offsets = df.sparkSession.createDataFrame(offset_rows, schema=off_schema)

    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(order_col), *[F.col(c) for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = bucketed.join(F.broadcast(offsets), "__bkt")
    # all running sums in ONE select: window expressions sharing a frame
    # must land in the same projection or Catalyst plans one Window node
    # per withColumn (interleaved Projects block the window-collapse rule)
    sums = []
    for i, (wc, oc) in enumerate(zip(weight_cols, out_cols)):
        # null weights count as 0 (SQL SUM skips nulls — coalescing keeps
        # the exclusive form from nulling out rows the window twin fills)
        wv = F.coalesce(F.col(wc).cast("long"), F.lit(0))
        sums.append((F.sum(wv).over(w) - wv + F.col(f"__off{i}")).alias(oc))
    # drop exactly the columns THIS function generated — a caller's own
    # "__"-prefixed columns pass through untouched (guaranteed by the
    # internal-name clash check at function entry)
    generated = {"__bkt", *(f"__off{i}" for i in range(len(weight_cols)))}
    clash = set(out_cols) & (set(df.columns))
    if clash:
        raise ValueError(
            f"out_cols collide with existing columns: {sorted(clash)}"
        )
    keep = [c for c in joined.columns if c not in generated]
    return joined.select(*keep, *sums)
