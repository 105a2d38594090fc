#!/usr/bin/env python
"""Two-decade documents-axis scaling for the pair-finding operators
(r6 judge next-round #3).

BENCH_SCALING's 10x density run showed the worst per-query ratios on the
per-gram-hash / pair-join operators (winnow_fingerprints 6.3x,
dedup_clusters 5.4x, minhash_dedup 5.3x, ngram_jaccard 4.7x at 10x
data).  Those are linear-per-unit-work amortized over 32 cores — but one
decade cannot distinguish "linear with a big constant" from "quietly
super-linear".  This tool adds the second decade: the same four queries
at 1x, 10x and 100x the documents corpus (documents axis ONLY; every
other table symlinked verbatim as in namespace_bench.py), reporting the
PER-DECADE ratio t(10x)/t(1x) vs t(100x)/t(10x).  Linear work =>
flat-or-falling per-decade ratios; a compounding ratio would expose a
hidden quadratic.

Replica scheme — the part that must be right for the measurement to
mean anything (r4 lesson: a constant per-replica perturbation collapses
replicas into manufactured near-dup clusters):

- doc_id += k * 1e9 per replica k.
- Replica text passes an INJECTIVE per-k letter substitution drawn from
  a pool of digits/punctuation: within a replica both members of a real
  near-dup pair get the SAME mapping, so within-replica pair structure
  is preserved exactly, while any cross-replica shingle containing one
  of the 12 mapped letters (the most frequent ones — i.e. virtually all
  shingles) diverges.  Crucially every k in 0..99 gets a DISTINCT
  mapping: offset and stride into the 31-char (prime-length) pool are
  varied across 30 strides, so mappings repeat only at
  k = lcm(31, 30) = 930.  Reusing a 13-entry translate table
  (the 10x tool's scheme) at 100 replicas would hand ~8 replicas the
  identical mapping — every document would acquire ~8 cross-replica
  EXACT duplicates and the pair count would blow up quadratically by
  construction, not by any property of the engine.

Output: BENCH_SCALING_2D.json; the round notes fold a table into
BENCH_SCALING.md.  Protocol matches scale_bench.py: min of REPS per
scale, base measured before AND after the ladder (elementwise min) for
warm-state symmetry; run SOLO.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: decade rungs; "10,100,1000" adds the third decade (r9 VERDICT
#: next-round #7 — pin the span family's exponent before trusting it at
#: 100 TB). 1000x replica corpora build chunked (see build_docs_replica).
SCALES = tuple(
    int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_DECADES", "10,100"
    ).split(",") if x
)
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))

#: the four worst 10x scalers from BENCH_SCALING.md — all pure
#: documents-table operators (per-gram hashing + bucketed pair joins).
#: Override with SPARK_GRAFT_SCALE_QUERIES=a,b,c to ladder a different
#: documents-axis set (e.g. the r8 operators) without re-running these;
#: pair it with SPARK_GRAFT_SCALE_OUT to write a separate artifact.
PAIR_QUERIES = [
    q for q in os.environ.get(
        "SPARK_GRAFT_SCALE_QUERIES",
        "winnow_fingerprints,minhash_dedup,ngram_jaccard,dedup_clusters",
    ).split(",") if q
]
OUT_PATH = os.environ.get("SPARK_GRAFT_SCALE_OUT", "BENCH_SCALING_2D.json")

#: the 12 most frequent letters; mapping them guarantees essentially
#: every shingle is touched, so cross-replica shingles diverge
_SRC = "etaoinsrhdlu"
#: substitution pool: digits + punctuation only — a letter target would
#: merge with that letter's genuine occurrences and perturb
#: WITHIN-replica gram structure.  PRIME length (31): every stride
#: 1..30 generates 12 distinct targets, and the (offset, stride) pair —
#: hence the mapping — repeats only at k = lcm(31, 30) = 930.
_POOL = "0123456789!#$%&()*+,/:;<=>?@[]^_{|}~"[:31]
assert len(_POOL) == 31
_STRIDES = list(range(1, len(_POOL)))


def replica_mapping(k: int) -> tuple[str, str]:
    """Injective letter substitution for replica k.

    k < 930: the r8 (offset, stride) arithmetic progressions —
    unchanged, so existing 10x/100x corpora stay valid.  k >= 930: the
    progression family has EXACTLY 31*30 = 930 members, so NO linear
    phase trick can extend it (the r10 review falsified one: any
    k -> (off+phase, stride) scheme leaves ~70 colliding pairs below
    1000 because some cross-boundary distance d solves both
    congruences) — instead the targets are picked by a deterministic
    md5-keyed ordering of the pool, a different mapping family
    entirely.  `build_docs_replica` ASSERTS global pairwise
    distinctness over every mapping it uses, so a collision is a build
    error, not a silent pair-count inflation."""
    if k == 0:
        return "", ""  # replica 0: verbatim
    n = len(_POOL)
    if k < 930:
        off = (k * 13) % n
        stride = _STRIDES[k % len(_STRIDES)]
        to = "".join(_POOL[(off + i * stride) % n] for i in range(len(_SRC)))
    else:
        import hashlib

        order = sorted(
            range(n),
            key=lambda i: hashlib.md5(f"replica:{k}:{i}".encode()).digest(),
        )
        to = "".join(_POOL[order[i]] for i in range(len(_SRC)))
    assert len(set(to)) == len(_SRC)  # injective within the mapping
    return _SRC, to


def scale_dir(scale: int) -> str:
    return os.path.join(REPO, ".scale", f"docs{scale}x")


def build_docs_replica(spark, scale: int) -> None:
    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.sources.tables import TABLES, load_table

    out_dir = scale_dir(scale)
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst) or os.path.islink(dst):
            continue
        if name != "documents":
            os.symlink(os.path.join(BASE_SF, f"{name}.parquet"), dst)
            continue
        df = load_table(spark, BASE_SF, "documents")
        # global distinctness gate: every replica must carry a UNIQUE
        # substitution, else cross-replica exact duplicates inflate the
        # dedup operators' pair counts by construction (r10 review
        # caught exactly this below k=1000)
        maps = [replica_mapping(k)[1] for k in range(1, scale)]
        assert len(set(maps)) == len(maps), "replica mappings collide"
        # chunked build: a single union of 1000 children is a plan
        # Catalyst takes minutes to analyze; 100-replica chunks appended
        # sequentially keep plan size flat at any decade.  Build into a
        # temp dir + atomic rename: a crash between chunk appends must
        # not leave a valid-looking PARTIAL corpus that later runs
        # silently reuse (the exists() check above would accept it).
        tmp = dst + ".building"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        chunk = 100
        first = True
        for base_k in range(0, scale, chunk):
            parts = []
            for k in range(base_k, min(base_k + chunk, scale)):
                d = df.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10**9))
                src, to = replica_mapping(k)
                if src:
                    d = d.withColumn("text", F.translate("text", src, to))
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            # multiple output splits: a single-file corpus serializes the
            # CPU-bound per-gram hashing stage (measured 5x in r4)
            out.repartition(32).write.mode(
                "overwrite" if first else "append"
            ).parquet(tmp)
            first = False
        os.rename(tmp, dst)
        print(f"# built documents {scale}x -> {dst}", file=sys.stderr)


#: measurement action: "collect" (default — the bench action) or
#: "checksum" for operators whose OUTPUT is wide (span_removal /
#: html_extract return full document texts: at 100x a collect() moves
#: ~400 MB through py4j and the rung measures driver transfer, not the
#: operator). The checksum aggregates xxhash64 over EVERY column of
#: EVERY row — full evaluation, no count()-style subtree pruning, tiny
#: result — i.e. the emit-to-a-sink cost a cluster actually pays.
ACTION = os.environ.get("SPARK_GRAFT_SCALE_ACTION", "collect")


def _evaluate(df) -> int:
    if ACTION == "checksum":
        from pyspark.sql import functions as F

        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: ANSI mode aborts a long sum of 2^63
            # hashes on overflow
            F.sum(
                F.xxhash64(F.struct(*df.columns)).cast("decimal(38,0)")
            ).alias("chk"),
        ).collect()[0]
        return int(row["n"])
    return len(df.collect())


def time_suite(spark, qs, sf_dir, label) -> tuple[dict, dict]:
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in PAIR_QUERIES:
        times = []
        n = 0
        for _ in range(REPS):
            t0 = time.monotonic()
            try:
                n = _evaluate(qs[name](spark, sf_dir))
            except Exception as exc:
                print(f"# {name}@{label}: FAILED {exc}", file=sys.stderr)
                times = []
                break
            times.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        if times:
            timings[name] = round(min(times), 3)
            rows[name] = n
            print(f"# {name}@{label}: {timings[name]}s ({n} rows)",
                  file=sys.stderr)
    return timings, rows


def main() -> None:
    import __spark_entry__ as entrymod
    from graphite_clickhouse_spark.session import get_spark

    spark = get_spark("docs-scale-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for scale in SCALES:
        build_docs_replica(spark, scale)
    qs = entrymod.queries()

    # warm-state symmetry: base, ladder up, base again; elementwise min
    t1, r1 = time_suite(spark, qs, BASE_SF, "1x")
    per_scale_t: dict[int, dict] = {}
    per_scale_r: dict[int, dict] = {}
    for scale in SCALES:
        per_scale_t[scale], per_scale_r[scale] = time_suite(
            spark, qs, scale_dir(scale), f"{scale}x"
        )
    t1b, _ = time_suite(spark, qs, BASE_SF, "1x-rewarm")
    t1 = {
        n: min(t1.get(n, float("inf")), t1b.get(n, float("inf")))
        for n in PAIR_QUERIES
        if n in t1 or n in t1b
    }
    result = {
        "axis": "documents (1x"
                + "".join(f" / {s}x" for s in SCALES)
                + " corpus, injective per-replica letter substitution; "
                "spine tables symlinked)",
        "scales": list(SCALES),
        "reps": REPS,
        "base_sf_dir": BASE_SF,
        "sec_1x": t1,
        "rows_1x": r1,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    prev_scale, prev_t = 1, t1
    for d, scale in enumerate(SCALES, 1):
        ts, rs = per_scale_t[scale], per_scale_r[scale]
        result[f"sec_{scale}x"] = ts
        result[f"rows_{scale}x"] = rs
        result[f"decade{d}_ratio_{scale}x_over_{prev_scale}x"] = {
            n: round(ts[n] / prev_t[n], 2)
            for n in PAIR_QUERIES
            if n in prev_t and n in ts and prev_t[n] > 0
        }
        prev_scale, prev_t = scale, ts
    result["queries"] = PAIR_QUERIES
    result["action"] = ACTION
    spark.stop()
    with open(os.path.join(REPO, OUT_PATH), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
