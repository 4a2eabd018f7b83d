"""Relational fast-path linker cross-checks (SURVEY §2.6 mapping (b)).

The decisive property: ``links_from_spans_hybrid`` must equal the pure
kernel pipeline on ARBITRARY random forests — that covers the eligibility
router AND the relational emission rules in one assertion (ineligible
traces route to the kernel and agree trivially; eligible traces must agree
rule-for-rule)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from zipkin_dependencies_spark.functions import normalize_spans
from zipkin_dependencies_spark.operators.link import links_from_spans
from zipkin_dependencies_spark.operators.link_relational import (
    eligible_trace_keys,
    links_from_spans_hybrid,
    trace_links_relational,
)
from zipkin_dependencies_spark.schemas import LINK_INPUT_SCHEMA
from zipkin_dependencies_spark.testdata import derived_spans

SF = "/root/testdata/sf0.001"

SERVICES = [None, "a", "b", "c", "d"]
KINDS = [None, "CLIENT", "SERVER", "PRODUCER", "CONSUMER"]


def random_forest(seed: int, n_traces: int = 120):
    """Rows in LINK_INPUT_SCHEMA shape: arbitrary — duplicate ids, dangling
    parents, multiple roots, shared spans, headless traces all occur."""
    rng = random.Random(seed)
    rows = []
    for t in range(n_traces):
        n = rng.randint(1, 10)
        ids = [f"s{i}" for i in range(n)]
        for i in range(n):
            parent = rng.choice([None, "dangling", *ids[:i]] if i else [None, "dangling"])
            rows.append(
                (
                    f"t{seed}-{t}",
                    parent,
                    rng.choice(ids),  # collisions on purpose
                    rng.choice(KINDS),
                    rng.choice(SERVICES),
                    rng.choice(SERVICES),
                    rng.random() < 0.2,   # shared
                    rng.random() < 0.3,   # is_error
                    rng.randint(1, 10**9),
                )
            )
    return rows


def clean_forest(seed: int, n_traces: int = 80):
    """Mostly-eligible traces: unique span ids, one root, valid kinds (or
    null-kind with both endpoints), shared spans as proper server halves —
    the production shape the relational path exists for. Emission subtleties
    (client-skip, backfill, error attribution, dangling parents) all occur."""
    rng = random.Random(seed)
    rows = []
    for t in range(n_traces):
        tk = f"c{seed}-{t}"
        rows.append((tk, None, "root", "SERVER", rng.choice(["a", "b"]),
                     rng.choice([None, "gw"]), False, rng.random() < 0.2, 1))
        for i in range(rng.randint(0, 6)):
            sid = f"s{i}"
            parent = rng.choice(["root", "dangling"] + [f"s{j}" for j in range(i)])
            kind = rng.choice(["CLIENT", "SERVER", "PRODUCER", "CONSUMER", None])
            local = rng.choice(["a", "b", "c"])
            remote = rng.choice(["a", "b", "c", None] if kind else ["a", "b", "c"])
            rows.append((tk, parent, sid, kind, local, remote, False,
                         rng.random() < 0.3, 1))
            if kind == "CLIENT" and rng.random() < 0.5:
                # shared server half of the same RPC (the D3 fold)
                rows.append((tk, parent, sid, "SERVER", rng.choice(["b", "c"]),
                             local, True, rng.random() < 0.2, 1))
    return rows


def _links(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("seed", [1, 2])
def test_hybrid_equals_kernel_on_adversarial_forests(spark, seed):
    norm = spark.createDataFrame(
        random_forest(seed, n_traces=60), schema=LINK_INPUT_SCHEMA
    )
    assert _links(links_from_spans_hybrid(norm)) == _links(links_from_spans(norm))


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_hybrid_equals_kernel_on_clean_forests(spark, seed):
    norm = spark.createDataFrame(clean_forest(seed), schema=LINK_INPUT_SCHEMA)
    n_eligible = eligible_trace_keys(norm).count()
    assert n_eligible >= 40  # the relational path is genuinely exercised
    assert _links(links_from_spans_hybrid(norm)) == _links(links_from_spans(norm))


def test_fixture_forest_is_fully_eligible_and_matches(spark):
    norm = normalize_spans(derived_spans(spark, SF))
    n_traces = norm.select("trace_key").distinct().count()
    assert eligible_trace_keys(norm).count() == n_traces  # all-relational
    got = _links(
        trace_links_relational(norm).select(
            "parent", "child", "call_count", "error_count"
        )
    )
    assert got == _links(links_from_spans(norm))


def test_ineligible_shapes_route_to_kernel(spark):
    rows = [
        # cycle: a→b→a (E4 fails)
        ("tc", "b", "a", "CLIENT", "a", "b", False, False, 1),
        ("tc", "a", "b", "CLIENT", "a", "b", False, False, 1),
        # two roots (E2 fails)
        ("tr", None, "r1", "SERVER", "x", "y", False, False, 1),
        ("tr", None, "r2", "SERVER", "x", "y", False, False, 1),
        # local span between RPCs (E1 fails: null kind, one side only)
        ("tl", None, "r", "SERVER", "s1", "gw", False, False, 1),
        ("tl", "r", "m", None, "s1", None, False, False, 1),
        ("tl", "m", "c", "CLIENT", "s1", "s2", False, False, 1),
    ]
    norm = spark.createDataFrame(rows, schema=LINK_INPUT_SCHEMA)
    assert eligible_trace_keys(norm).count() == 0
    # and the hybrid still gets everything right via the kernel
    assert _links(links_from_spans_hybrid(norm)) == _links(links_from_spans(norm))
