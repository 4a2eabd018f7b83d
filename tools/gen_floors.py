#!/usr/bin/env python
"""Regenerate BASELINE_floors.json: per-query best CLEAN-window sf0.1
seconds + which artifact set it (VERDICT r08 #5 — makes the 145 floors
that lived as BASELINE.md prose machine-readable, so bench.py can emit a
floor ratio and regressions trip mechanically).

Sources: every committed per-query sf0.1 artifact (BENCH_r*_local.json,
bench_detail*.json) plus any paths passed as argv. A query's entry from
an artifact is skipped when that artifact marks it still_degraded
(every run saw steal); artifacts without steal accounting (r03/r04
locals) predate the protocol and were ledgered clean in BASELINE.md.

tools/floor_overrides.json then CLAMPS floors whose historical minimum
is superseded by a ledgered change — a deliberate plan trade
(customer_spend_gini's r06 two-phase rank), an operator rework
(dedupe_near_against's r05 auto-banding), or memo-payer accounting
(top_trace_paths pays the shared path-table build under the current
registry order). A raw min older than the operator's current contract
is not a floor; the override records the reason + round so bench.py's
trip detection compares against like-for-like.

    python tools/gen_floors.py [extra_detail.json ...]
"""
from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(extra: list[str]) -> dict:
    # COMMITTED artifacts only (r09 review): bench.py's default sidecar
    # bench_detail.json is gitignored — globbing it let an uncommitted
    # local run silently lower committed floors and broke clean-checkout
    # reproducibility. Pass extra paths explicitly when merging a fresh
    # run, then commit the merged BENCH_r{N}_local.json.
    sources = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*_local.json")))
    sources += extra
    floors: dict[str, dict] = {}
    for path in sources:
        try:
            d = json.load(open(path))
        except (OSError, ValueError):
            continue
        if d.get("sf") != 0.1 or not isinstance(d.get("queries"), dict):
            continue
        degraded = set(d.get("still_degraded") or [])
        tag = os.path.basename(path)
        for q, sec in d["queries"].items():
            if q in degraded:
                continue
            cur = floors.get(q)
            if cur is None or sec < cur["floor_sec"]:
                floors[q] = {"floor_sec": round(float(sec), 3), "source": tag}
    ov_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "floor_overrides.json"
    )
    if os.path.exists(ov_path):
        import re

        def src_round(tag: str) -> int:
            m = re.search(r"r(\d+)", tag)
            return int(m.group(1)) if m else 0

        for q, ov in json.load(open(ov_path)).items():
            if q not in floors:
                continue
            cur = floors[q]
            # the override clamps only measurements at or before its own
            # round (r09 review): a LATER committed clean run that beats
            # the override is legitimate new truth and must win, or the
            # trip wire drifts loose forever
            if (
                cur["floor_sec"] < ov["floor_sec"]
                and src_round(cur["source"]) <= src_round(ov["round"])
            ):
                floors[q] = {
                    "floor_sec": ov["floor_sec"],
                    "source": f"override:{ov['round']}",
                    "reason": ov["reason"],
                }
    return dict(sorted(floors.items()))


if __name__ == "__main__":
    floors = build(sys.argv[1:])
    out = os.path.join(ROOT, "BASELINE_floors.json")
    with open(out, "w") as fh:
        json.dump(floors, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}: {len(floors)} query floors")
