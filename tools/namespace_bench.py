#!/usr/bin/env python
"""Namespace-axis scaling evidence (r5 judge next-round #5).

BENCH_SCALING grows the DENSITY axis (more points per metric); this tool
grows the metric NAMESPACE: 10x the distinct paths/tags at constant
points-per-metric, the axis where the reference's index machinery
(reversed paths, Level pruning, finder/index.go:100-130) earns its keep
at 100 TB.  Our equivalents under test: the level/prefix-pushdown path
index (sources/tables.py build_path_index, plans/glob.py reversed-path
StartsWith), the tagged-term predicate planner, and the autocomplete
aggregations.

Replica scheme: events replicated REPLICAS times with
`event_type -> event_type || '_rK'` (k=0 verbatim), so every replica
carries the SAME per-path point count while the path population grows
10x — paths go 50 -> 500, tagged paths likewise.  All other tables are
symlinked verbatim (the finder spine only reads events).

Output: BENCH_SCALING_NS.json + a markdown section the round notes fold
into BENCH_SCALING.md.  Protocol matches scale_bench.py: min of REPS,
small measured before AND after big (elementwise min) for warm-state
symmetry; run SOLO.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, ".scale", "ns10")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))

#: the finder spine: every query whose cost is a function of namespace
#: size, not point density
FINDER_QUERIES = [
    "find_glob",
    "index_tree",
    "tagged_find",
    "autocomplete_values",
    "autocomplete_tags",
    "prom_label_values",
    "tagbrowse_list",
]


def build_namespace_replica(spark) -> None:
    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.sources.tables import TABLES

    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(OUT_DIR, f"{name}.parquet")
        if os.path.exists(dst) or os.path.islink(dst):
            continue
        if name != "events":
            os.symlink(os.path.join(BASE_SF, f"{name}.parquet"), dst)
            continue
        ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
        parts = []
        for k in range(REPLICAS):
            d = ev.withColumn("event_id", F.col("event_id") + F.lit(k * 10**12))
            if k:
                d = d.withColumn(
                    "event_type", F.concat(F.col("event_type"), F.lit(f"_r{k}"))
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(8).write.mode("overwrite").parquet(dst)


def time_suite(spark, qs, sf_dir) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in FINDER_QUERIES:
        times = []
        for _ in range(REPS):
            t0 = time.monotonic()
            try:
                len(qs[name](spark, sf_dir).collect())
            except Exception as exc:
                print(f"# {name}@{sf_dir}: FAILED {exc}", file=sys.stderr)
                times = []
                break
            times.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        if times:
            timings[name] = round(min(times), 3)
            print(
                f"# {name}@{os.path.basename(sf_dir)}: {timings[name]}s",
                file=sys.stderr,
            )
    return timings


def main() -> None:
    import __spark_entry__ as entrymod
    from graphite_clickhouse_spark.session import get_spark

    spark = get_spark("ns-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build_namespace_replica(spark)
    qs = entrymod.queries()

    # warm-state symmetry: small, big, small again; keep elementwise min
    small = time_suite(spark, qs, BASE_SF)
    big = time_suite(spark, qs, OUT_DIR)
    small2 = time_suite(spark, qs, BASE_SF)
    small = {
        n: min(small.get(n, float("inf")), small2.get(n, float("inf")))
        for n in FINDER_QUERIES
        if n in small or n in small2
    }
    ratios = {
        n: round(big[n] / small[n], 2)
        for n in FINDER_QUERIES
        if n in small and n in big and small[n] > 0
    }
    result = {
        "axis": "namespace (10x distinct paths, constant points-per-metric)",
        "replicas": REPLICAS,
        "reps": REPS,
        "base_sf_dir": BASE_SF,
        "small_sec": small,
        "big_sec": big,
        "ratio_big_over_small": ratios,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    spark.stop()
    with open(os.path.join(REPO, "BENCH_SCALING_NS.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
