#!/usr/bin/env python
"""Merge per-query docs_scale_bench artifacts into one 2D-scaling file.

Round-8 lesson (and round 7's minhash footnote before it): running
several operators through one ladder SESSION pollutes the rungs — the
connected-components operators leave localCheckpoint storage blocks and
caches that `spark.catalog.clearCache()` does not touch, and a
neighboring query's rung then measures GC/eviction churn instead of the
operator (observed: dup_spans@10x 43.9 s in the shared session vs 3.1 s
solo). The per-query protocol runs docs_scale_bench.py once per query
(SPARK_GRAFT_SCALE_QUERIES=<one>, fresh JVM each) and this tool merges
the artifacts, recording the protocol so a reader knows the rungs are
isolation-clean.

Usage: python tools/merge_ladders.py OUT.json IN1.json IN2.json ...
"""
from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    merged: dict = {}
    for p in in_paths:
        with open(p) as fh:
            part = json.load(fh)
        if not merged:
            merged = {k: v for k, v in part.items()
                      if not isinstance(v, dict) and k != "reps"}
            merged["protocol"] = (
                "one query per process (fresh JVM/session per ladder) — "
                "cross-operator storage-block interference excluded; "
                "min of reps_per_query[q] per rung, base re-measured "
                "after the ladder (elementwise min)"
            )
            merged["queries"] = []
            merged["reps_per_query"] = {}
            # per-input scalar metadata: the ladders run in separate
            # processes at different times, so load/conditions/action
            # differ per query — attributing the FIRST input's scalars
            # to all queries misleads (r8 ADVICE). Top-level scalars
            # stay as the first input's for backward compat; the
            # per-query truth lives in these maps.
            merged["scalars_per_query"] = {}
        merged["queries"] += part.get("queries", [])
        part_scalars = {k: v for k, v in part.items()
                        if not isinstance(v, (dict, list))}
        for q in part.get("queries", []):
            merged["reps_per_query"][q] = part.get("reps")
            merged["scalars_per_query"][q] = part_scalars
        # a differing ACTION (collect vs checksum) across inputs changes
        # what the numbers MEAN — refuse to silently collapse it
        if "action" in part and "action" in merged and \
                part["action"] != merged["action"]:
            merged["action"] = "mixed (see scalars_per_query)"
        for key, val in part.items():
            if isinstance(val, dict):
                merged.setdefault(key, {}).update(val)
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"merged {len(in_paths)} ladders -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
