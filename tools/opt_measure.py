#!/usr/bin/env python
"""r10 optimization measurement harness (guide §1: measure first).

Bench-identical timing (same session conf, same `.count()` action, JIT
warmup at the smallest sibling SF, best-of-2 passes with memos cleared
at the pass boundary) for a SUBSET of queries, plus:

- formatted-plan capture to ``plans/r10/<query>_<tag>.txt``
- per-query Spark JOB COUNT (via job-group tracking) — at sf0.1 the
  fixed per-job cost dominates, so "how many jobs does this query
  launch" is the first diagnostic for driver-loop-shaped queries
  (BPE training rounds, pointer-doubling rounds, eager checkpoints).

Usage:
    python tools/opt_measure.py [--tag before|after] [--no-plans] q1 q2 ...
    python tools/opt_measure.py --tag before top:15       # 15 slowest per BENCH_r10_local.json

Prints one JSON line per query to stdout; chatter to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    capture_plans = True
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--no-plans":
            capture_plans = False
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    from zipkin_dependencies_spark.memo import clear_all_memos
    from zipkin_dependencies_spark.session import get_spark
    import __spark_entry__ as entry

    all_queries = entry.queries()
    expanded: list[str] = []
    for n in names:
        if n.startswith("top:"):
            k = int(n.split(":")[1])
            ledger = os.environ.get(
                "OPT_MEASURE_LEDGER",
                os.path.join(REPO, "BENCH_r10_opt_local.json"),
            )
            with open(ledger) as f:
                led = json.load(f)["queries"]
            expanded.extend(
                q for q, _ in sorted(led.items(), key=lambda kv: -kv[1])[:k]
            )
        else:
            if n not in all_queries:
                raise SystemExit(f"unknown query {n}")
            expanded.append(n)
    names = list(dict.fromkeys(expanded))

    spark = get_spark(
        app_name="opt_measure",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import pandas as pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    warm = spark.range(0, 1_000, 1, int(cpus))
    warm.mapInPandas(_noop, schema="id long").count()

    # smallest sibling SF for JIT warmup (bench.py logic)
    base = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    sibs = sorted(
        (d for d in os.listdir(base) if d.startswith("sf")),
        key=lambda d: float(d[2:]) if d[2:].replace(".", "", 1).isdigit() else 1e9,
    )
    warm_dir = os.path.join(base, sibs[0]) if sibs else None

    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("OPT_MEASURE_ROUND", "r11")
    )
    os.makedirs(plans_dir, exist_ok=True)

    def steal_ticks() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    def job_count_run(name: str) -> tuple[float, int, int, float]:
        """(elapsed_s, rows, n_jobs, steal_cs) for one execution."""
        group = f"om_{name}_{time.monotonic_ns()}"
        sc.setJobGroup(group, name)
        sc.setJobDescription(name)
        s0 = steal_ticks()
        t0 = time.monotonic()
        n = all_queries[name](spark, sf_dir).count()
        el = time.monotonic() - t0
        st = (steal_ticks() - s0) / 100.0
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        sc.setJobGroup("", "")
        return el, n, len(jobs), st

    # warmup pass (untimed)
    if warm_dir and os.path.isdir(warm_dir):
        for name in names:
            try:
                all_queries[name](spark, warm_dir).count()
            except Exception as ex:
                print(f"# warmup {name} failed: {ex}", file=sys.stderr)
    clear_all_memos()

    results: dict[str, dict] = {}
    for pass_i in range(2):
        clear_all_memos()
        for name in names:
            el, n, jobs, st = job_count_run(name)
            prev = results.get(name)
            if prev is None or el < prev["sec"]:
                results[name] = {
                    "sec": round(el, 3), "rows": n, "jobs": jobs,
                    "steal_cs": round(st, 2),
                }
            print(
                f"# pass{pass_i} {name}: {el:.2f}s ({n} rows, {jobs} jobs, "
                f"steal {st:.2f}cs)",
                file=sys.stderr,
            )

    if capture_plans:
        clear_all_memos()
        for name in names:
            try:
                df = all_queries[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(plan.rstrip() + "\n")
            except Exception as ex:
                print(f"# plan {name} failed: {ex}", file=sys.stderr)

    for name in names:
        print(json.dumps({"query": name, **results[name]}))
    spark.stop()


if __name__ == "__main__":
    main()
