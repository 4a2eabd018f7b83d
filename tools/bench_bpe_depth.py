#!/usr/bin/env python
"""Measure bpe_train wall at tokenizer-real merge depth (SCALING.md "BPE
at depth"): sf1, n_merges in {64, 256} with rematerialize_every=16, plus
the n_merges=64 chain-everything control (rematerialize_every=0). Prints
one JSON line per run with total wall, rounds completed, and wall/round.

    SPARK_GRAFT_SF_DIR=/tmp/zds_scale/sf1 python tools/bench_bpe_depth.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zipkin_dependencies_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/zds_scale/sf1")
    spark = get_spark()
    from zipkin_dependencies_spark.llm.bpe import bpe_train
    from zipkin_dependencies_spark.testdata import load

    docs = load(spark, sf_dir, "documents")
    runs = [(64, 16), (64, 0), (256, 16)]
    for n, remat in runs:
        t0 = time.monotonic()
        rows = bpe_train(docs, n_merges=n, rematerialize_every=remat).collect()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_merges": n,
                    "rematerialize_every": remat,
                    "rounds_completed": len(rows),
                    "wall_sec": round(wall, 2),
                    "sec_per_round": round(wall / max(len(rows), 1), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
