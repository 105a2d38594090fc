#!/usr/bin/env python
"""Suite-context A/B for the Arrow/mapInPandas queries (r8 VERDICT
next-round #2): multimodal_bmp_decode measured 2.4 s solo in a fresh
session but 5.2-8.3 s mid-suite on the same host+code — 2-3x of
SESSION-STATE interference on exactly the queries a long-lived server
serves.  This tool runs the multimodal quartet in a fresh process under
each mode and records enough JVM/Python diagnostics to attribute the
delta:

  solo        warm up, time the quartet (baseline)
  suite       run a 23-query diverse suite prefix first, then time the
              quartet (the interference condition)
  suite-fresh like `suite`, but Python workers are NOT reused
              (spark.python.worker.reuse=false) — isolates accumulated
              python-worker state from JVM state
  suite-settle like `suite`, but with sync(1) + a 60 s idle settle
              between the prefix and the timing — if the quartet then
              times at solo level, the interference is a TRANSIENT
              drain (dirty-page writeback of prefix shuffle files /
              worker-pool settling), not persistent session state
  suite-capped like `suite`, with the FIX that shipped as the
              session.py default: idleWorkerMaxPoolSize=8 (Spark 4's
              LRU idle-worker eviction) — reuse still amortizes forks
              within a query, but a stale bloated fleet cannot
              accumulate between queries.  NOTE: all OTHER modes lift
              the cap to recreate the pre-fix behavior, since the
              default now includes it.

Diagnostics per timed query: GC collection count/time DELTA during the
query (G1 young + old beans), JIT code-cache pool occupancy, live
python daemon/worker process count, persistent RDD count (localCheckpoint
leftovers survive clearCache).  One JSON line per run; merge runs with
`python tools/suite_context_bench.py report IN1 IN2 ...` into
BENCH_SUITE_CONTEXT.json.

Protocol: run each mode ALONE (no concurrent Spark jobs on the box) —
the r9 investigation's first attempts were polluted by exactly that.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TIMED = [
    "multimodal_bmp_decode",
    "multimodal_jpeg_decode",
    "multimodal_wav_decode",
    "multimodal_features",
]

#: diverse prefix: render spine, span ops, checkpointed connected
#: components, pandas_udf kernels — the families a real suite interleaves
PREFIX = [
    "render_baseline_shape", "render_baseline_unagg", "render_resample_avg",
    "render_unaggregated", "version_dedup", "storage_merge",
    "paragraph_dedup", "dup_spans", "span_removal", "winnow_overlap_pairs",
    "dedup_clusters", "cluster_keep", "kmeans_refine", "semantic_dedup",
    "minhash_dedup", "simhash_pairs", "ngram_jaccard", "bigram_quality",
    "tfidf_top_terms", "lang_id", "decontaminate", "source_overlap",
    "quality_classifier",
]


def _jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc = {}
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc[b.getName()] = {
            "count": b.getCollectionCount(),
            "time_ms": b.getCollectionTime(),
        }
    pools = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name or "Old Gen" in name:
            u = p.getUsage()
            pools[name] = {
                "used_mb": round(u.getUsed() / 1e6, 1),
                "max_mb": round(u.getMax() / 1e6, 1) if u.getMax() > 0 else None,
            }
    return {"gc": gc, "pools": pools}


def _py_workers() -> dict:
    """Count + total RSS (MB) of live pyspark daemon/worker processes."""
    out = subprocess.run(
        ["bash", "-c",
         "ps ax -o rss=,args= | grep '[p]yspark.daemon\\|[p]yspark.worker'"
         " | awk '{n+=1; r+=$1} END {print n, r/1024}'"],
        capture_output=True, text=True,
    ).stdout.split()
    try:
        return {"count": int(out[0]), "rss_mb": round(float(out[1]), 1)}
    except (IndexError, ValueError):
        return {"count": 0, "rss_mb": 0.0}


def run_mode(mode: str) -> dict:
    from graphite_clickhouse_spark.session import get_spark

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    # session.py now ships idleWorkerMaxPoolSize=8 as the DEFAULT (the
    # fix this tool's r9 investigation produced), so the baseline modes
    # must explicitly LIFT the cap to recreate the pre-fix unbounded
    # fleet — otherwise every mode measures cap-8 vs cap-8 and the
    # interference condition can no longer reproduce (r9 review).
    extra = {"spark.python.factory.idleWorkerMaxPoolSize": "1000000"}
    if mode == "suite-fresh":
        extra["spark.python.worker.reuse"] = "false"
    if mode == "suite-capped":
        extra["spark.python.factory.idleWorkerMaxPoolSize"] = "8"
    suite_like = mode.startswith("suite")
    spark = get_spark("suitectx", extra_conf=extra or None)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(32, numPartitions=32).select(_noop("id")).collect()
    qs = entrymod.queries()

    prefix_sec = 0.0
    if suite_like:
        t0 = time.monotonic()
        for name in PREFIX:
            qs[name](spark, SF).collect()
            spark.catalog.clearCache()
        prefix_sec = round(time.monotonic() - t0, 1)
    if mode == "suite-settle":
        subprocess.run(["sync"], check=False)
        time.sleep(60)

    res: dict = {
        "mode": mode, "sf": SF, "prefix_sec": prefix_sec,
        "loadavg_start": round(os.getloadavg()[0], 1),
        "py_workers_before_timing": _py_workers(),
        "queries": {}, "gc_delta": {}, "pools_after": {},
    }
    for name in TIMED:
        before = _jvm_stats(spark)
        best, times = float("inf"), []
        for _ in range(3):
            t0 = time.monotonic()
            qs[name](spark, SF).collect()
            times.append(round(time.monotonic() - t0, 2))
            best = min(best, times[-1])
            spark.catalog.clearCache()
        after = _jvm_stats(spark)
        res["queries"][name] = round(best, 2)
        res["gc_delta"][name] = {
            g: {
                "count": after["gc"][g]["count"] - before["gc"][g]["count"],
                "time_ms": after["gc"][g]["time_ms"] - before["gc"][g]["time_ms"],
            }
            for g in after["gc"]
        }
        res["pools_after"] = after["pools"]
        res.setdefault("reps", {})[name] = times
    res["py_workers"] = _py_workers()
    res["persistent_rdds"] = spark.sparkContext._jsc.getPersistentRDDs().size()
    res["loadavg_end"] = round(os.getloadavg()[0], 1)
    spark.stop()
    return res


def main() -> int:
    if sys.argv[1] == "report":
        runs = []
        for p in sys.argv[2:]:
            with open(p) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        runs.append(json.loads(line))
        out = {"runs": runs, "sf": SF}
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_SUITE_CONTEXT.json"), "w",
        ) as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote BENCH_SUITE_CONTEXT.json ({len(runs)} runs)")
        return 0
    res = run_mode(sys.argv[1])
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
