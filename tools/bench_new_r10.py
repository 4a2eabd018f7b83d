#!/usr/bin/env python
"""Scale-tier measurement for the r10 operators (SCALING.md rows):
bpe_roundtrip, simhash_band_candidates, url_domain_token_cap, and the
two re-gated semantics-touched queries (url_domain_dedup,
training_order) at the dirs passed as argv (default sf0.1 / sf1 /
sf10). One JSON line per (query, tier)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.1",
    "/tmp/zds_scale/sf1",
    "/tmp/zds_scale/sf10",
]
QUERIES = [
    "bpe_roundtrip",
    "simhash_band_candidates",
    "url_domain_token_cap",
    "url_domain_dedup",
    "training_order",
]


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "64g")
    from zipkin_dependencies_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="bench_new_r10")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in QUERIES:
        # warm plan/codegen once at the smoke SF
        qs[name](spark, "/root/testdata/sf0.001").count()
    for d in DIRS:
        for name in QUERIES:
            best = None
            for rep in range(2):
                s0 = steal_ticks()
                t0 = time.monotonic()
                n = qs[name](spark, d).count()
                el = round(time.monotonic() - t0, 2)
                st = round((steal_ticks() - s0) / 100.0, 1)
                if best is None or el < best[0]:
                    best = (el, st, n)
            print(
                json.dumps(
                    {"query": name, "dir": d, "sec": best[0],
                     "steal_cs": best[1], "rows": best[2]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
