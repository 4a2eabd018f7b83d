"""Unit semantics for the as-of join and funnel operators — the edge cases
the sf-corpus oracle runs don't isolate: inclusive same-timestamp matches,
tolerance cutoffs, left-outer nulls, broken funnel chains, hop windows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from zipkin_dependencies_spark.operators.asof import asof_join
from zipkin_dependencies_spark.operators.funnel import funnel


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )


def test_asof_inclusive_and_latest_wins(spark):
    left = _events(spark, [(1, 10, _ts("2024-01-01 12:00:00"), "purchase")])
    right = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01 11:00:00"), "click"),
            (1, 2, _ts("2024-01-01 11:30:00"), "click"),
            # exactly simultaneous with the purchase: inclusive → matches
            (1, 3, _ts("2024-01-01 12:00:00"), "click"),
            # after the purchase: never visible
            (1, 4, _ts("2024-01-01 12:00:01"), "click"),
        ],
    )
    row = asof_join(
        left, right, on=["user_id"], tiebreak="event_id"
    ).collect()[0]
    assert row["event_id_r"] == 3


def test_asof_left_outer_null_and_tolerance(spark):
    left = _events(
        spark,
        [
            (1, 10, _ts("2024-01-01 12:00:00"), "purchase"),
            (2, 20, _ts("2024-01-01 12:00:00"), "purchase"),  # no right rows
        ],
    )
    right = _events(spark, [(1, 1, _ts("2024-01-01 09:00:00"), "click")])
    out = {
        r["user_id"]: r
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out[1]["event_id_r"] == 1
    assert out[2]["event_id_r"] is None and out[2]["ts_r_us"] is None

    # 1-hour tolerance: the 3-hours-ago click is out of range → nulled
    tol = {
        r["user_id"]: r
        for r in asof_join(
            left, right, on=["user_id"], tolerance_us=3_600_000_000
        ).collect()
    }
    assert tol[1]["event_id_r"] is None


def test_asof_keys_do_not_cross(spark):
    left = _events(spark, [(1, 10, _ts("2024-01-01 12:00:00"), "purchase")])
    right = _events(spark, [(2, 1, _ts("2024-01-01 11:00:00"), "click")])
    row = asof_join(left, right, on=["user_id"]).collect()[0]
    assert row["event_id_r"] is None


def test_asof_same_ts_right_ties_pick_tiebreak_max(spark):
    """Two right rows at one timestamp: the window's (ts, side, tiebreak)
    order makes the LARGEST tiebreak the carried match — deterministic."""
    left = _events(spark, [(1, 10, _ts("2024-01-01 12:00:00"), "purchase")])
    right = _events(
        spark,
        [
            (1, 7, _ts("2024-01-01 11:00:00"), "click"),
            (1, 5, _ts("2024-01-01 11:00:00"), "click"),
        ],
    )
    row = asof_join(
        left, right, on=["user_id"], tiebreak="event_id"
    ).collect()[0]
    assert row["event_id_r"] == 7


def test_funnel_strict_order_and_broken_chain(spark):
    ev = _events(
        spark,
        [
            # user 1: full chain in order
            (1, 1, _ts("2024-01-01 00:00:00"), "signup"),
            (1, 2, _ts("2024-01-01 01:00:00"), "click"),
            (1, 3, _ts("2024-01-01 02:00:00"), "purchase"),
            # user 2: purchase BEFORE click → stage 2 only
            (2, 4, _ts("2024-01-01 00:00:00"), "signup"),
            (2, 5, _ts("2024-01-01 02:00:00"), "click"),
            (2, 6, _ts("2024-01-01 01:00:00"), "purchase"),
            # user 3: never signs up → stage 0
            (3, 7, _ts("2024-01-01 00:00:00"), "click"),
            (3, 8, _ts("2024-01-01 01:00:00"), "purchase"),
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel(ev, ["signup", "click", "purchase"]).collect()
    }
    assert out[1]["stage_reached"] == 3
    assert out[2]["stage_reached"] == 2 and out[2]["t3_us"] is None
    assert out[3]["stage_reached"] == 0 and out[3]["t1_us"] is None


def test_funnel_simultaneous_step_not_counted(spark):
    """Step k must be STRICTLY after step k-1 — a click at the exact signup
    timestamp does not advance the funnel."""
    ev = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01 00:00:00"), "signup"),
            (1, 2, _ts("2024-01-01 00:00:00"), "click"),
        ],
    )
    row = funnel(ev, ["signup", "click"]).collect()[0]
    assert row["stage_reached"] == 1 and row["t2_us"] is None


def test_funnel_hop_window(spark):
    """within_us bounds each hop independently, and the hop anchors on the
    greedy (earliest) previous step."""
    ev = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01 00:00:00"), "signup"),
            # 2h later: outside a 1h hop window
            (1, 2, _ts("2024-01-01 02:00:00"), "click"),
            # second signup 90min in — greedy anchor stays at 00:00, so
            # the 02:00 click is STILL out of range
            (1, 3, _ts("2024-01-01 01:30:00"), "signup"),
        ],
    )
    row = funnel(ev, ["signup", "click"], within_us=3_600_000_000).collect()[0]
    assert row["stage_reached"] == 1
    assert row["t1_us"] == int(_ts("2024-01-01 00:00:00").timestamp() * 1e6)


def test_funnel_one_exchange(spark):
    """Funnel depth does not multiply shuffles: the whole chain plans on a
    single Exchange (window partitioning reused by the final aggregate)."""
    ev = _events(spark, [(1, 1, _ts("2024-01-01 00:00:00"), "signup")])
    plan = (
        funnel(ev, ["signup", "click", "purchase", "error"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_event_transitions_counts(spark):
    from zipkin_dependencies_spark.operators.events_analytics import event_transitions

    ev = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01 00:00:00"), "a"),
            (1, 2, _ts("2024-01-01 00:01:00"), "b"),
            (1, 3, _ts("2024-01-01 00:02:00"), "b"),
            (2, 4, _ts("2024-01-01 00:00:00"), "b"),
        ],
    )
    rows = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(ev).collect()
    }
    assert rows == {
        ("(start)", "a"): 1,
        ("a", "b"): 1,
        ("b", "b"): 1,
        ("(start)", "b"): 1,
    }


def test_window_anomalies_zero_variance_guard(spark):
    """A type with identical counts in every window (variance 0) must
    produce no rows, not NaN comparisons."""
    from zipkin_dependencies_spark.operators.events_analytics import window_anomalies

    ev = _events(
        spark,
        # 'flat': 1 event per hour-window, 3 windows -> variance 0
        [(1, i, _ts(f"2024-01-01 0{i}:10:00"), "flat") for i in range(3)]
        # 'spiky': counts 1,1,4 -> window 2 is the anomaly
        + [(2, 10 + i, _ts(f"2024-01-01 0{i}:20:00"), "spiky") for i in range(2)]
        + [(2, 20 + j, _ts("2024-01-01 02:2" + str(j) + ":00"), "spiky") for j in range(4)],
    )
    out = window_anomalies(ev, window_seconds=3600, z_threshold=1.0).collect()
    assert all(r["event_type"] == "spiky" for r in out)
    assert len(out) == 1 and out[0]["n_events"] == 4


import pytest


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_asof_join_matches_python_reference_on_random_streams(spark, seed):
    """Randomized soundness: the union+window as-of join must agree row for
    row with a direct per-key python reference (latest right.ts <= left.ts,
    inclusive, tiebreak = max event_id) on random event streams with
    colliding timestamps."""
    import random

    rng = random.Random(seed)
    mk = lambda n, base: [  # noqa: E731
        (
            rng.randrange(5),            # user
            base + i,                    # unique event id
            _ts("2024-01-01 00:00:00")
            + dt.timedelta(seconds=rng.randrange(50)),  # dense -> ties
        )
        for i in range(n)
    ]
    lrows = mk(60, 1000)
    rrows = mk(80, 2000)

    left = spark.createDataFrame(
        [(u, i, t, "purchase") for u, i, t in lrows],
        "user_id bigint, event_id bigint, ts timestamp, event_type string",
    )
    right = spark.createDataFrame(
        [(u, i, t, "click") for u, i, t in rrows],
        "user_id bigint, event_id bigint, ts timestamp, event_type string",
    )
    got = {
        r["event_id"]: r["event_id_r"]
        for r in asof_join(
            left, right, on=["user_id"], tiebreak="event_id"
        ).collect()
    }

    def ref(u, t):
        cands = [(rt, ri) for ru, ri, rt in rrows if ru == u and rt <= t]
        if not cands:
            return None
        # latest ts wins; among equal ts the largest event_id
        return max(cands)[1]

    expected = {i: ref(u, t) for u, i, t in lrows}
    assert got == expected


@pytest.mark.parametrize("seed", [3, 99])
def test_funnel_matches_python_reference_on_random_streams(spark, seed):
    """Randomized soundness for the windowed funnel: greedy-from-first
    semantics replayed by a direct per-user python reference."""
    import random

    rng = random.Random(seed)
    types = ["signup", "click", "purchase", "view"]
    rows = [
        (
            rng.randrange(6),
            i,
            _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=rng.randrange(7200)),
            rng.choice(types),
        )
        for i in range(120)
    ]
    steps = ["signup", "click", "purchase"]
    W = 1800 * 1_000_000  # 30 min per hop

    got = {
        r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"], r["stage_reached"])
        for r in funnel(_events(spark, rows), steps, within_us=W).collect()
    }

    us = lambda t: int(t.timestamp() * 1e6)  # noqa: E731
    expected = {}
    for u in {r[0] for r in rows}:
        ev = [(us(r[2]), r[3]) for r in rows if r[0] == u]
        ts_list = [None, None, None]
        prev = None
        for k, step in enumerate(steps):
            cands = [
                t for t, typ in ev
                if typ == step
                and (prev is None or (t > prev and t <= prev + W))
            ]
            if not cands:
                break
            ts_list[k] = min(cands)
            prev = ts_list[k]
        stage = sum(1 for t in ts_list if t is not None)
        expected[u] = (ts_list[0], ts_list[1], ts_list[2], stage)
    assert got == expected


def test_empty_inputs_degrade_gracefully(spark):
    """Empty sides/inputs produce empty-or-null results, never errors —
    the daily-job property (a day with no events must not fail the run)."""
    from zipkin_dependencies_spark.operators.cohort import cohort_retention
    from zipkin_dependencies_spark.operators.events_analytics import (
        event_transitions,
        window_anomalies,
    )

    empty = _events(spark, [])
    one = _events(spark, [(1, 1, _ts("2024-01-01 00:00:00"), "purchase")])

    # as-of: empty right -> all left rows kept with null matches
    row = asof_join(one, empty, on=["user_id"]).collect()[0]
    assert row["event_id"] == 1 and row["ts_r_us"] is None
    # as-of: empty left -> empty output
    assert asof_join(empty, one, on=["user_id"]).count() == 0

    assert funnel(empty, ["signup", "click"]).count() == 0
    assert cohort_retention(empty).count() == 0
    assert event_transitions(empty).count() == 0
    assert window_anomalies(empty).count() == 0


def test_kmeans_raises_without_centroids(spark):
    import pytest as _pytest

    from zipkin_dependencies_spark.llm.kmeans import kmeans_assign

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="no centroids"):
        kmeans_assign(emb, stride=97)


def test_asof_tiebreak_typo_and_bad_type_raise(spark):
    """A tiebreak column present in NEITHER input is a typo, and a
    non-integral tiebreak would cast to null — both must raise instead of
    silently degrading to nondeterministic same-ts ordering."""
    import pytest as _pytest

    left = _events(spark, [(1, 10, _ts("2024-01-01 12:00:00"), "purchase")])
    right = _events(spark, [(1, 7, _ts("2024-01-01 11:00:00"), "click")])
    with _pytest.raises(ValueError, match="neither"):
        asof_join(left, right, on=["user_id"], tiebreak="event_idd")
    with _pytest.raises(ValueError, match="integral"):
        asof_join(left, right, on=["user_id"], tiebreak="event_type")


def test_mad_anomalies_robust_to_baseline_outlier_and_zero_mad_guard(spark):
    """The scenario that breaks the z-score monitor: one huge spike in the
    baseline inflates sigma and masks a second, smaller anomaly — MAD must
    flag both. And a zero-MAD type (over half its windows at the median)
    must be excluded, not score infinite deviations."""
    from zipkin_dependencies_spark.operators.events_analytics import (
        mad_window_anomalies,
    )

    rows = []
    # 'masked': counts 2,2,2,2,2,40,8 across 7 hour-windows. median=2,
    # MAD=0? deviations |n-2|: 0,0,0,0,0,38,6 -> median dev = 0 -> zero-MAD
    # guard would drop it; use 2,2,3,3,2,40,8: median=3? sorted 2,2,2,3,3,8,40
    # median=3, devs |n-3|: 1,1,1,0,0,5,37 sorted 0,0,1,1,1,5,37 -> MAD=1.
    # flags need |n-3| > 3 -> 40 and 8 both flag; sigma-based z would mask 8.
    counts = [2, 2, 3, 3, 2, 40, 8]
    eid = 0
    for w, c in enumerate(counts):
        for _ in range(c):
            rows.append((1, eid, _ts(f"2024-01-01 0{w}:15:00"), "masked"))
            eid += 1
    # 'flat3': counts 5,5,5 -> MAD 0 -> excluded even though nothing deviates
    for w in range(3):
        for _ in range(5):
            rows.append((2, eid, _ts(f"2024-01-01 0{w}:45:00"), "flat3"))
            eid += 1
    # 'halfmed': 1,1,1,9 -> median 1, devs 0,0,0,8 -> MAD 0 -> the spike at 9
    # is real but MAD degenerates; the guard must exclude it (documented)
    for w, c in enumerate([1, 1, 1, 9]):
        for _ in range(c):
            rows.append((3, eid, _ts(f"2024-01-01 0{w}:55:00"), "halfmed"))
            eid += 1
    out = mad_window_anomalies(
        _events(spark, rows), window_seconds=3600, mad_multiple=3
    ).collect()
    flagged = {(r["event_type"], r["n_events"]) for r in out}
    assert flagged == {("masked", 40), ("masked", 8)}
    by = {r["n_events"]: r for r in out}
    # med2 = 2*3, mad4 = 4*MAD = 4
    assert by[40]["med2"] == 6 and by[40]["mad4"] == 4
    # robust z sign: spike positive
    assert by[40]["rz9"] > 0 and by[8]["rz9"] > 0


def test_mad_vs_sigma_masking(spark):
    """Cross-check the motivation: on the same 'masked' stream, the sigma
    monitor at z>=2 sees only the giant spike; MAD sees both."""
    from zipkin_dependencies_spark.operators.events_analytics import (
        mad_window_anomalies,
        window_anomalies,
    )

    rows = []
    eid = 0
    for w, c in enumerate([2, 2, 3, 3, 2, 40, 8]):
        for _ in range(c):
            rows.append((1, eid, _ts(f"2024-01-01 0{w}:15:00"), "masked"))
            eid += 1
    ev = _events(spark, rows)
    sigma = {
        r["n_events"]
        for r in window_anomalies(ev, window_seconds=3600, z_threshold=2.0).collect()
    }
    robust = {
        r["n_events"]
        for r in mad_window_anomalies(
            ev, window_seconds=3600, mad_multiple=3
        ).collect()
    }
    assert sigma == {40}
    assert robust == {40, 8}
