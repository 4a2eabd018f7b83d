"""ks_statistic vs a brute-force sequential ECDF walk, and the
multi-weight distributed_prefix_sums vs its single-partition window twin."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from zipkin_dependencies_spark.operators.rank import distributed_prefix_sums
from zipkin_dependencies_spark.operators.stats import ks_statistic


def _ref_ks(a: list[int], b: list[int]):
    na, nb = len(a), len(b)
    ca = cb = 0
    cnt_a, cnt_b = Counter(a), Counter(b)
    best_gap, at = -1, None
    for v in sorted(set(a) | set(b)):
        ca += cnt_a[v]
        cb += cnt_b[v]
        gap = abs(ca * nb - cb * na)
        if gap > best_gap:
            best_gap, at = gap, v
    return {
        "n_a": na,
        "n_b": nb,
        "n_vals": len(set(a) | set(b)),
        "at_v": at,
        "ks_q6": round(1e6 * best_gap / (na * nb)),
    }


def _spark_ks(spark, a, b, n_buckets=8):
    df = spark.createDataFrame(
        [(v, True) for v in a] + [(v, False) for v in b],
        "v long, is_a boolean",
    )
    row = ks_statistic(df, "v", F.col("is_a"), n_buckets=n_buckets).collect()[0]
    return row.asDict()


@pytest.mark.parametrize("seed", range(6))
def test_randomized_vs_reference(spark, seed):
    rng = random.Random(seed)
    # heavy ties on purpose: small value domain, shifted distributions
    a = [rng.randint(0, 30) for _ in range(rng.randint(50, 200))]
    b = [rng.randint(5, 40) for _ in range(rng.randint(50, 200))]
    assert _spark_ks(spark, a, b) == _ref_ks(a, b)


def test_identical_samples_zero(spark):
    a = [1, 2, 2, 3, 9]
    got = _spark_ks(spark, a, list(a))
    assert got["ks_q6"] == 0


def test_disjoint_samples_one(spark):
    got = _spark_ks(spark, [1, 2, 3], [10, 11, 12, 13])
    assert got["ks_q6"] == 1_000_000
    assert got["at_v"] == 3  # gap saturates at A's max value


def test_nulls_dropped(spark):
    df = spark.createDataFrame(
        [(1, True), (None, True), (2, False), (None, False)],
        "v long, is_a boolean",
    )
    row = ks_statistic(df, "v", F.col("is_a")).collect()[0]
    assert (row.n_a, row.n_b, row.n_vals) == (1, 1, 2)


@pytest.mark.parametrize("seed", range(3))
def test_prefix_sums_match_window_twin(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.randint(0, 20), rng.randint(0, 5), rng.randint(0, 5), i)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "v long, w1 long, w2 long, id long")
    got = distributed_prefix_sums(
        df, "v", ["w1", "w2"], tiebreak_cols=["id"], n_buckets=7,
        out_cols=["c1", "c2"],
    )
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "id",
        (F.sum("w1").over(w) - F.col("w1")).alias("c1"),
        (F.sum("w2").over(w) - F.col("w2")).alias("c2"),
    )
    got_m = {r.id: (r.c1, r.c2) for r in got.collect()}
    want_m = {r.id: (r.c1, r.c2) for r in want.collect()}
    assert got_m == want_m


def test_empty_sample_reports_null_not_divide_by_zero(spark):
    # all rows in sample B: statistic undefined -> NULL ks_q6, no ANSI abort
    df = spark.createDataFrame(
        [(1, False), (2, False), (3, False)], "v long, is_a boolean"
    )
    row = ks_statistic(df, "v", F.col("is_a")).collect()[0]
    assert row.n_a == 0 and row.n_b == 3
    assert row.ks_q6 is None


def test_null_membership_rows_dropped(spark):
    # a NULL membership predicate belongs to NEITHER sample — it must not
    # inflate n_vals or count as sample B
    df = spark.createDataFrame(
        [(1, True), (2, False), (9, None)], "v long, is_a boolean"
    )
    row = ks_statistic(df, "v", F.col("is_a")).collect()[0]
    assert (row.n_a, row.n_b, row.n_vals) == (1, 1, 2)


def test_prefix_sums_preserve_caller_dunder_columns_and_reject_collisions(spark):
    df = spark.createDataFrame(
        [(1, 2, 7), (3, 4, 8)], "v long, w long, __mine long"
    )
    out = distributed_prefix_sums(df, "v", ["w"], out_cols=["c"])
    assert "__mine" in out.columns  # caller columns pass through
    assert {r["__mine"] for r in out.collect()} == {7, 8}
    with pytest.raises(ValueError, match="collide"):
        distributed_prefix_sums(df, "v", ["w"], out_cols=["w"])


def test_prefix_sums_reject_internal_name_collisions(spark):
    # ADVICE r08: a caller column literally named __bkt or __off{i} was
    # silently clobbered by the internal withColumn/join — now a loud
    # ValueError, mirroring the out_cols clash check
    df = spark.createDataFrame([(1, 2, 7)], "v long, w long, __bkt long")
    with pytest.raises(ValueError, match="internal"):
        distributed_prefix_sums(df, "v", ["w"], out_cols=["c"])
    df2 = spark.createDataFrame([(1, 2, 7)], "v long, w long, __off0 long")
    with pytest.raises(ValueError, match="internal"):
        distributed_prefix_sums(df2, "v", ["w"], out_cols=["c"])


def test_ks_empty_sample_at_v_degenerates_to_min_value(spark):
    # documented contract (ADVICE r08 fix): with an empty sample, ks_q6 is
    # NULL and at_v degenerates to the smallest observed value (all gaps
    # zero -> -v tiebreak), identically on both engines
    df = spark.createDataFrame(
        [(5, True), (3, True), (9, True)], "v long, is_a boolean"
    )
    row = ks_statistic(df, "v", F.col("is_a")).collect()[0]
    assert row.ks_q6 is None
    assert row.at_v == 3


def test_row_number_rejects_internal_name_collisions(spark):
    # r09 review: distributed_row_number gets the same guard as
    # distributed_prefix_sums — no silent clobber of caller __bkt/__off
    from zipkin_dependencies_spark.operators.rank import distributed_row_number

    df = spark.createDataFrame([(1, 2, 7)], "v long, w long, __off long")
    with pytest.raises(ValueError, match="internal"):
        distributed_row_number(df, [], "v", ["w"])


def test_exact_quantiles_randomized_vs_sorted_reference(spark):
    """Distributed selection == sort-and-index, over randomized data
    with heavy ties (few distinct values -> buckets collapse), skew,
    and n smaller than the bucket count; type-1 rank rule
    min(n, floor(p*n)+1)."""
    import math
    import random

    from zipkin_dependencies_spark.operators.stats import exact_quantiles

    rng = random.Random(59)
    shapes = [
        [rng.randint(0, 5) for _ in range(500)],        # heavy ties
        [rng.randint(0, 10**9) for _ in range(300)],    # spread
        [7] * 40,                                       # constant
        [rng.randint(0, 100) for _ in range(3)],        # n < buckets
    ]
    probs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)
    for t, vals in enumerate(shapes):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {
            r.prob: (r.rank_idx, r.value)
            for r in exact_quantiles(df, "x", probs=probs).collect()
        }
        s = sorted(vals)
        n = len(s)
        want = {
            float(p): (min(n, math.floor(p * n) + 1),
                       s[min(n, math.floor(p * n) + 1) - 1])
            for p in probs
        }
        assert got == want, (t, got, want)
    # empty input -> empty output, schema intact
    empty = spark.createDataFrame([], "x long")
    out = exact_quantiles(empty, "x", probs=probs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["prob", "rank_idx", "value"]


def test_exact_quantiles_grouped_vs_sorted_reference(spark):
    """partition_by: per-group selection == per-group sort-and-index,
    groups of wildly different sizes (incl. a 1-row group and a group
    whose values are all NULL -> emits nothing)."""
    import math
    import random

    from zipkin_dependencies_spark.operators.stats import exact_quantiles

    rng = random.Random(61)
    rows = []
    groups = {"a": 400, "b": 37, "c": 1}
    for g, size in groups.items():
        for _ in range(size):
            rows.append((g, rng.randint(0, 50)))
    rows += [("nulls", None)] * 5
    df = spark.createDataFrame(rows, "g string, x long")
    probs = (0.1, 0.5, 0.9, 0.99)
    got = {
        (r.g, r.prob): (r.rank_idx, r.value)
        for r in exact_quantiles(
            df, "x", probs=probs, partition_by=("g",)
        ).collect()
    }
    want = {}
    for g, size in groups.items():
        s = sorted(x for gg, x in rows if gg == g and x is not None)
        n = len(s)
        for p in probs:
            ri = min(n, math.floor(p * n) + 1)
            want[(g, float(p))] = (ri, s[ri - 1])
    assert got == want
