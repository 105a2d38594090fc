#!/usr/bin/env python
"""Round-END rotation hygiene check (r10 VERDICT next-round #7).

The contract's spirit is "touched => in-window": any query whose code
path changed this round must sit in the driver's 50-row correctness
window (CONTRACT_INDEX slot 'w') so the driver re-certifies it, and no
TAIL query's optimized plan may have drifted (the content-aware
fingerprint pins). r10's `pii_scrub` slipped through because the check
ran only mid-round; this tool is meant to run as the LAST step before
the round's artifacts are committed.

    python tools/check_rotation.py r11

Checks, in order:
  1. every CONTRACT_INDEX entry labeled with the given round is in the
     window tier ('w');
  2. every tail query's optimized-plan fingerprint at sf0.001 matches
     tests/stable_tail_fingerprints.json (same normalization as the
     pytest guard — a tail fingerprint drift means a shared-module edit
     reached a tail query and it must rotate into the window instead).

Exit code 0 = clean; 1 = violation (printed).
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r11"
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    bad = [
        name
        for name, (_pos, slot, touched) in entry.CONTRACT_INDEX.items()
        if touched == rnd and slot != "w"
    ]
    if bad:
        print(f"VIOLATION: {rnd}-touched queries outside the window: {bad}")
        return 1
    n_touched = sum(
        1 for v in entry.CONTRACT_INDEX.values() if v[2] == rnd
    )
    print(f"rotation ok: {n_touched} {rnd}-touched queries, all in-window")

    from pin_tail_fingerprints import FP_SF_DIR, plan_fingerprint, tail_names

    from graphite_clickhouse_spark.session import get_spark

    with open(
        os.path.join(REPO, "tests", "stable_tail_fingerprints.json")
    ) as fh:
        pinned = json.load(fh)["fingerprints"]
    spark = get_spark("check-rotation", shuffle_partitions=4)
    qs = entry.queries()
    drifted = []
    for name in tail_names(entry):
        fp = plan_fingerprint(qs[name](spark, FP_SF_DIR))
        if pinned.get(name) != fp:
            drifted.append(name)
    spark.stop()
    if drifted:
        print(f"VIOLATION: tail plan fingerprints drifted: {drifted} — "
              "rotate them into the window (they were touched)")
        return 1
    print(f"tail fingerprints ok: {len(pinned)} pins unchanged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
