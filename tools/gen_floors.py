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

#: memoized query families (r11, VERDICT r10 #2/#5): these queries share a
#: first-consumer-pays memo (memo.py), so their PER-ROW bench seconds are
#: order-dependent — whichever member runs first in a pass pays the shared
#: build and the rest read it. A registry reorder moves the payer and trips
#: per-row floors spuriously. The stable quantity is the FAMILY TOTAL
#: (payer + consumers summed within one pass), emitted below as
#: "family:<name>" entries; bench.py trips on those instead of on member
#: rows. Membership must track the memo wiring in __spark_entry__.py
#: (tests/test_plans.py pins it).
FAMILIES: dict[str, list[str]] = {
    # _links_table memo (__spark_entry__._links_table consumers)
    "links_memo": [
        "service_pagerank", "service_reachability", "service_components",
        "service_health", "service_triangles", "service_clustering",
    ],
    # _part_edges_table memo
    "part_edges_memo": [
        "basket_part_pairs", "part_basket_kcore", "part_communities_lpa",
    ],
    # operators/paths.py _PATH_MEMO ("spans_paths" key)
    "path_memo": [
        "top_trace_paths", "trace_depth_histogram", "path_latencies",
        "error_paths",
    ],
    # llm/bpe.py _MERGES_MEMO ("bpe_merges" key; byte_roundtrip keys
    # separately and stays a per-row floor)
    "bpe_merges_memo": ["bpe_train", "bpe_encode", "bpe_roundtrip"],
}


def build(extra: list[str]) -> dict:
    # COMMITTED artifacts only (r09 review): bench.py's default sidecar
    # bench_detail.json is gitignored — globbing it let an uncommitted
    # local run silently lower committed floors and broke clean-checkout
    # reproducibility. Pass extra paths explicitly when merging a fresh
    # run, then commit the merged BENCH_r{N}_local.json.
    sources = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*_local.json")))
    sources += extra
    floors: dict[str, dict] = {}
    member_of = {q: fam for fam, qs in FAMILIES.items() for q in qs}
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
                entry = {"floor_sec": round(float(sec), 3), "source": tag}
                if q in member_of:
                    # informational only — bench.py records the ratio but
                    # never trips a memo-family member row (order-dependent
                    # amortized cost); the family total below is the trip
                    entry["family"] = member_of[q]
                floors[q] = entry
        # family totals: only artifacts measuring EVERY member cleanly
        # qualify (a partial sum would understate the floor)
        for fam, members in FAMILIES.items():
            if any(m not in d["queries"] or m in degraded for m in members):
                continue
            tot = round(sum(float(d["queries"][m]) for m in members), 3)
            key = f"family:{fam}"
            cur = floors.get(key)
            if cur is None or tot < cur["floor_sec"]:
                floors[key] = {
                    "floor_sec": tot,
                    "source": tag,
                    "members": members,
                }
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
                if q in member_of:
                    # overrides must not strip the family marker — bench.py
                    # exempts family members from per-row trips (r11)
                    floors[q]["family"] = member_of[q]
    return dict(sorted(floors.items()))


if __name__ == "__main__":
    floors = build(sys.argv[1:])
    out = os.path.join(ROOT, "BASELINE_floors.json")
    with open(out, "w") as fh:
        json.dump(floors, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}: {len(floors)} query floors")
