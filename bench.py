#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

The ledger of recorded runs lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _calibrate() -> dict[str, float]:
    """Single-core machine-speed probes, measured BEFORE Spark starts.

    Recorded in the output JSON so wall-clock totals are comparable across
    sessions: rounds run on freshly-booted sandboxes whose per-core speed
    varies ~2× (round 2's '2.16× regression' with an untouched diff was
    exactly this). Interpret `value` relative to `calibration`, and compare
    ledger entries at like-for-like calibration."""
    import numpy as np

    t0 = time.monotonic()
    s = 0
    for i in range(10_000_000):
        s += i
    py = time.monotonic() - t0
    a = np.random.RandomState(0).rand(2000, 2000)
    t0 = time.monotonic()
    (a @ a).sum()
    np_t = time.monotonic() - t0
    return {"python_loop_s": round(py, 3), "numpy_matmul_s": round(np_t, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    calibration = _calibrate()

    from zipkin_dependencies_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the machinery the timings shouldn't charge to the first query:
    # JVM codegen, parquet footer reads, and the Python/Arrow worker pool
    # (mapInPandas spawns one worker per core on first use).
    import pandas as pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    warm = spark.range(0, 1_000, 1, int(cpus))
    warm.mapInPandas(_noop, schema="id long").count()

    all_queries = entry.queries()
    # headline set: the full zipkin pipeline (scan → group-by-trace → linker
    # kernel → global agg), the v1 parity path, and representative relational
    # + extension operators. Excluded: cheap scalar checks, and the streaming
    # orchestration query (foreachBatch + filesystem staging — the
    # correctness gate covers it; its wall time measures the scheduler).
    headline = [
        name
        for name in all_queries
        if name not in ("trace_normalize", "streaming_daily_links")
    ]

    # driver GC time (local mode: driver == executors, so this is ALL GC).
    # Per-query GC deltas separate "the plan is slow" from "the session is
    # sick" — round 2 shipped a 2.16× bench total without this and the
    # regression turned out to be environmental.
    gc_beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )

    def gc_ms() -> int:
        return sum(b.getCollectionTime() for b in gc_beans)

    def steal_ticks() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    # JIT warmup pass at the smoke SF: every plan executes once on tiny
    # inputs before anything is timed. Plan shapes (and therefore generated
    # code) are SF-independent, so this pre-compiles every query's codegen
    # and pushes the JVM's hot paths through C2 — measured: v1_links' first
    # timed sf0.1 run drops 16.6 s → 5.3 s with this pass in place. Costs
    # ~1 s/query of untimed wall, affects no recorded number except by
    # removing compiler noise from pass 1.
    for name in headline:
        try:
            all_queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception as ex:  # pragma: no cover - diagnostics only
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)

    timings: dict[str, float] = {}
    gc_per_query: dict[str, int] = {}
    steal0 = steal_ticks()
    # best-of-2 as two SEPARATED full passes, not back-to-back repeats: the
    # first execution of each distinct plan pays one-time codegen cost
    # (measured: 7.6s -> 2.5s steady state), so a repeat is needed — but this
    # sandbox also shows transient tens-of-seconds machine slowdowns (CPU
    # steal bursts) that hit BOTH adjacent repeats of the same query and its
    # neighbors (observed: 4 consecutive linker queries all 2-5x slow in one
    # run, all at floor in the next). Min across two passes separated by the
    # full suite length decorrelates query cost from burst timing.
    for pass_i in range(2):
        for name in headline:
            q = all_queries[name]
            g0 = gc_ms()
            t0 = time.monotonic()
            n = q(spark, sf_dir).count()  # forces the full plan
            el = round(time.monotonic() - t0, 3)
            prev = timings.get(name)
            if prev is None or el < prev:
                timings[name] = el
                gc_per_query[name] = gc_ms() - g0
            print(
                f"# pass{pass_i} {name}: {el:.2f}s ({n} rows, gc {gc_ms() - g0}ms)",
                file=sys.stderr,
            )

    calibration["steal_s"] = round((steal_ticks() - steal0) / 100.0, 1)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration": calibration,
                "gc_ms": gc_per_query,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
