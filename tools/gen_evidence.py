#!/usr/bin/env python
"""Regenerate EVIDENCE.json: query -> latest round with a GREEN driver row.

A row is green when rows_match and schema_match hold and err is null
(hash_match is additionally required when the driver recorded one — the
rows-only queries record null there). Run from the repo root at round
close, after the driver writes CORRECTNESS_r{N}.json:

    python tools/gen_evidence.py

The artifact exists so rotation planning (and judge verification) read
ONE file instead of re-deriving the freshness map from every
CORRECTNESS_r*.json. Registry names missing from the artifact have never
been driver-gated (should be none since r08).
"""
from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> dict:
    evidence: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, r in json.load(open(f)).items():
            green = (
                r.get("rows_match") is True
                and r.get("schema_match") is True
                and r.get("err") is None
                and r.get("hash_match") in (True, None)
            )
            if green:
                evidence[q] = max(evidence.get(q, 0), rnd)
    # drop rows for queries no longer in the registry (r09 review): a
    # rename/removal otherwise leaves an orphan that re-appears on every
    # regeneration and silently pollutes rotation planning
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "se", os.path.join(ROOT, "__spark_entry__.py")
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    registered = set(se.queries())
    orphans = sorted(set(evidence) - registered)
    if orphans:
        print(f"dropping evidence for unregistered queries: {orphans}")
        for q in orphans:
            del evidence[q]
    return dict(sorted(evidence.items()))


if __name__ == "__main__":
    ev = build()
    # "as_of_round" stamps which driver artifacts the snapshot includes
    # (r09 judge: the committed file otherwise misleads anyone reading it
    # during the inter-round gap, when the NEXT round's CORRECTNESS file
    # doesn't exist yet). max over rounds seen, not over values — a round
    # whose gate went fully red would still advance the stamp.
    import glob as _glob
    import re as _re

    as_of = max(
        int(_re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in _glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    )
    out = os.path.join(ROOT, "EVIDENCE.json")
    with open(out, "w") as fh:
        json.dump({"as_of_round": as_of, "queries": ev}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    by_round: dict[int, int] = {}
    for r in ev.values():
        by_round[r] = by_round.get(r, 0) + 1
    print(
        f"wrote {out} (as of r{as_of:02d}): {len(ev)} queries; "
        f"by round: {sorted(by_round.items())}"
    )
