#!/usr/bin/env python
"""Scale-factor scaling evidence (VERDICT r2 next-round item 3).

Materializes a 10x replica of $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) under .scale/sf1eq/, runs the bench query suite at
BOTH scales, and writes BENCH_SCALING.json + BENCH_SCALING.md with
per-query wall-time ratios. Scan-bound queries should come out ~linear
(<= ~10x, usually far less because 32 local cores absorb the extra
partitions); anything super-linear is a hidden driver bottleneck.

Replication scheme (one scan of each sf0.1 table, 10 shifted copies):
- events: event_id += k*1e12 (version stays unique). path/time are
  UNCHANGED -> each metric gets 10x the points in the same windows: the
  DENSITY axis. The namespace axis stays constant, so find/index queries
  are expected ~flat — that is the honest expectation, not a bug.
- documents: doc_id += k*1e9; text passes a per-replica character
  translate. Within-replica near-dup structure is preserved exactly
  (both members of a pair get the same mapping) while cross-replica
  shingles diverge, so pair-finding work scales ~10x LINEARLY instead
  of the ~100x a verbatim duplication would force by construction.
- embeddings: vec_id += k*1e9; one dimension per replica is shifted so
  cross-replica cosine drops out of near-dup range.
- orders/lineitem: orderkey += k*1e10 (join keys to the single-copy
  customer/part/supplier dims unchanged).
- region/nation/customer/supplier/part: single copy (dimensions).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1eq")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))

#: per-replica text mapping: distinct (from, to) letter translations
_TRANSLATE = [
    ("", ""),  # replica 0: verbatim
    ("e", "3"), ("t", "7"), ("a", "4"), ("o", "0"), ("i", "1"),
    ("n", "~"), ("s", "5"), ("r", "2"), ("h", "#"), ("d", "6"),
    ("l", "!"), ("u", "^"),
]


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.sources.tables import TABLES, load_table

    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(OUT_DIR, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        df = load_table(spark, BASE_SF, name)
        if name in ("region", "nation", "customer", "supplier", "part"):
            df.write.mode("overwrite").parquet(dst)
            continue
        parts = []
        for k in range(REPLICAS):
            if name == "events":
                parts.append(
                    df.withColumn(
                        "event_id", F.col("event_id") + F.lit(k * 10**12)
                    )
                )
            elif name == "documents":
                src, to = _TRANSLATE[k % len(_TRANSLATE)]
                d = df.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10**9))
                if src:
                    d = d.withColumn("text", F.translate("text", src, to))
                parts.append(d)
            elif name == "embeddings":
                d = df.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10**9))
                if k:
                    # PER-VECTOR multiplicative perturbation (phase keyed
                    # on vec_id): decorrelates replicas in many dims so
                    # sketch bits flip and replicas spread across LSH
                    # buckets. A per-replica CONSTANT offset must be
                    # avoided — it collapses each replica into one tight
                    # cluster and manufactures quadratic pair blowup.
                    phase = (F.pmod(F.col("vec_id"), F.lit(101)) + F.lit(1)) * F.lit(
                        0.31 * k
                    )
                    d = d.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, i: (
                                x * (F.lit(1.0) + F.sin((i + F.lit(1)) * phase) * F.lit(0.8))
                            ).cast("float"),
                        ),
                    )
                parts.append(d)
            elif name == "orders":
                parts.append(
                    df.withColumn(
                        "o_orderkey", F.col("o_orderkey") + F.lit(k * 10**10)
                    )
                )
            elif name == "lineitem":
                parts.append(
                    df.withColumn(
                        "l_orderkey", F.col("l_orderkey") + F.lit(k * 10**10)
                    )
                )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
        print(f"# built {name}: {REPLICAS}x", file=sys.stderr)


def time_suite(spark, qs, names, sf_dir) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
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
            print(f"# {name}@{os.path.basename(sf_dir)}: {timings[name]}s",
                  file=sys.stderr)
    return timings


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from graphite_clickhouse_spark.session import get_spark

    spark = get_spark("scale-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build_scaled(spark)

    qs = dict(entrymod.queries())

    def _neardup_lsh(spark, sf_dir):
        from graphite_clickhouse_spark.pipeline.similarity import (
            embedding_neardup_pairs,
        )
        from graphite_clickhouse_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        return embedding_neardup_pairs(emb, threshold=0.45, num_planes=12)

    def _semantic_dedup_scaled(spark, sf_dir):
        # SemDeDup deploys with cell count PROPORTIONAL to corpus size
        # (pairs-per-cell then stays constant -> linear scaling); the
        # contract query pins 8 cells for oracle determinism, which at
        # 10x data would measure the by-construction quadratic instead
        from pyspark.sql import functions as F

        from graphite_clickhouse_spark.pipeline.similarity import (
            semantic_dedup,
        )
        from graphite_clickhouse_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        k = 8 if sf_dir == BASE_SF else 8 * REPLICAS
        cents = emb.filter(F.col("vec_id") % (10**9) < k).limit(k).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
        return semantic_dedup(emb, cents, threshold=0.4)

    # the contract query's exact mode is all-pairs BY DEFINITION (O(n^2),
    # driver-guarded at 1e6 vectors) — scaling it 10x measures the
    # quadratic, not the engine. The declared 100 TB path is the LSH
    # bucketed mode; that is what the scaling table reports.
    qs["embedding_neardup_lsh"] = _neardup_lsh
    qs["semantic_dedup"] = _semantic_dedup_scaled
    names = [n for n in BENCH_QUERIES if n in qs and n != "embedding_neardup"]
    if "embedding_neardup_lsh" not in names:
        names.append("embedding_neardup_lsh")
    # measure small BEFORE and AFTER the big run and keep the per-query
    # min: the second small pass runs with fully-warm JIT/codegen caches,
    # the same state the big suite enjoyed — otherwise fixed-overhead
    # queries show ratios < 1 that are warmup drift, not scaling
    small = time_suite(spark, qs, names, BASE_SF)
    big = time_suite(spark, qs, names, OUT_DIR)
    small2 = time_suite(spark, qs, names, BASE_SF)
    small = {
        n: min(small.get(n, float("inf")), small2.get(n, float("inf")))
        for n in names
        if n in small or n in small2
    }
    ratios = {
        n: round(big[n] / small[n], 2)
        for n in names
        if n in small and n in big and small[n] > 0
    }
    result = {
        "replicas": REPLICAS,
        "reps": REPS,
        "base_sf_dir": BASE_SF,
        "small_sec": small,
        "big_sec": big,
        "ratio_big_over_small": ratios,
        "small_total": round(sum(small.values()), 2),
        "big_total": round(sum(big.values()), 2),
        "loadavg": round(os.getloadavg()[0], 1),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    lines = [
        "# Scaling evidence: sf0.1 vs 10x replica (sf1-equivalent)",
        "",
        f"Replicas: {REPLICAS}; min of {REPS} reps per query per scale; "
        f"local[32]; 1-min loadavg at end: {result['loadavg']}.",
        "",
        "Replication grows the DENSITY axis (10x points per metric, 10x",
        "docs/vectors/rows); the metric NAMESPACE stays constant, so",
        "find/index/autocomplete queries are expected ~flat. Documents get",
        "per-replica character translations and embeddings a per-vector",
        "multiplicative perturbation so pair-finding queries scale linearly",
        "instead of quadratically-by-duplication. embedding_neardup is",
        "measured via its LSH mode (num_planes=12) — the exact mode is",
        "all-pairs O(n^2) by definition and driver-guarded at 1e6 vectors.",
        "semantic_dedup is measured with cell count proportional to corpus",
        "size (8 -> 80), the SemDeDup deployment shape that keeps",
        "pairs-per-cell constant. See scale_bench.py.",
        "",
        "| query | sf0.1 s | 10x s | ratio |",
        "|---|---|---|---|",
    ]
    for n in names:
        if n in ratios:
            lines.append(f"| {n} | {small[n]} | {big[n]} | {ratios[n]} |")
    lines += [
        "",
        f"Totals: {result['small_total']} s -> {result['big_total']} s "
        f"({round(result['big_total']/max(result['small_total'],0.001),2)}x "
        "for 10x data).",
    ]
    with open(os.path.join(here, "BENCH_SCALING.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    spark.stop()
    print(json.dumps({"small_total": result["small_total"],
                      "big_total": result["big_total"]}))


if __name__ == "__main__":
    main()
