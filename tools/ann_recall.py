"""Regenerate the ANN recall evidence in RECALL.md.

Measures recall@k of the approximate vector-search paths in
pipeline/similarity.py against exact cosine_topk ground truth on the
synthetic embeddings table:

- `ivf_topk` (k-means IVF): recall@10 vs n_probe, including the
  probe-all == exact invariant;
- `lsh_ann_topk` (hyperplane LSH): recall@10 across (planes, tables)
  configurations, showing the OR-amplification lever.

All seeds fixed — numbers are deterministic for a given testdata
generation.  Usage:

    python tools/ann_recall.py              # measure + rewrite RECALL.md
    python tools/ann_recall.py --print      # measure + print JSON only

The coarse floor assertions in tests/test_pipeline.py
(TestAnnRecallCurve) call measure() with the same parameters and pin
the curve shape, so a similarity.py regression that silently drops
recall fails CI rather than just aging this file.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

IVF_PROBES = (1, 4, 8, 32)
IVF_K = 32
LSH_CONFIGS = ((4, 1), (4, 4), (4, 8), (4, 16), (6, 8), (6, 16), (8, 16), (8, 32))


def _truth_sets(df):
    """{query_id: set(neighbor_id)} from a (query_id, neighbor_id, ...)
    top-k frame — driver-side scalar reduction over n_queries*k rows."""
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict, exact: dict, k: int) -> float:
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    return round(hits / (len(exact) * k), 3)


def measure(spark, sf_dir: str = SF_DIR, k: int = 10, n_queries: int = 50,
            ivf_probes=IVF_PROBES, lsh_configs=LSH_CONFIGS):
    """-> {"ivf": {n_probe: recall}, "lsh": {"planesxtables": recall},
    "n_queries": int, "corpus": int}"""
    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.pipeline.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        lsh_ann_topk,
        train_centroids,
    )

    corpus = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )
    n_corpus = corpus.count()
    queries = corpus.orderBy("vec_id").limit(n_queries).cache()
    exact = _truth_sets(cosine_topk(corpus, queries, k=k))

    cents = train_centroids(corpus, k=IVF_K, seed=42)
    assigned = ivf_assign(corpus, cents).cache()
    assigned.count()
    ivf = {
        int(p): _recall(
            _truth_sets(ivf_topk(assigned, queries, cents, k=k, n_probe=p)),
            exact, k,
        )
        for p in ivf_probes
    }
    dim = len(queries.first().embedding)
    lsh = {
        f"{planes}x{tables}": _recall(
            _truth_sets(lsh_ann_topk(
                corpus, queries, k=k, num_planes=planes, dim=dim,
                num_tables=tables,
            )),
            exact, k,
        )
        for planes, tables in lsh_configs
    }
    corpus.unpersist()
    assigned.unpersist()
    return {"ivf": ivf, "lsh": lsh, "n_queries": n_queries,
            "corpus": n_corpus, "k": k}


def render_markdown(m: dict, sf_dir: str) -> str:
    dim_note = f"{m['corpus']:,} vectors"
    lines = [
        f"# ANN recall evidence — {sf_dir} embeddings ({dim_note}), "
        f"recall@{m['k']} vs exact cosine",
        "",
        f"Measured on {m['n_queries']} queries against "
        "`pipeline/similarity.py`'s approximate paths, ground truth = "
        "`cosine_topk` (exact brute force). Regenerate with "
        "`python tools/ann_recall.py`; numbers are deterministic (fixed "
        "plane seeds, fixed kmeans seed). Coarse curve-shape floors are "
        "pinned by `tests/test_pipeline.py::TestAnnRecallCurve`.",
        "",
        f"## IVF (`train_centroids` + `ivf_assign` + `ivf_topk`, "
        f"k-means k={IVF_K})",
        "",
        "| n_probe | recall@10 |",
        "|---|---|",
    ]
    for p in IVF_PROBES:
        tag = " (probe all)" if p == IVF_K else ""
        lines.append(f"| {p}{tag} | {m['ivf'][p]:.3f} |")
    lines += [
        "",
        "Textbook behavior: recall rises monotonically with probed cells "
        "and reaches exact parity at probe-all (also asserted by "
        "`tests/test_pipeline.py::test_kmeans_ivf_trained_centroids`). "
        "At scale the assignment is the partition key on disk, so "
        "`n_probe` bounds the fraction of the corpus read — "
        "recall/latency is tuned per query, not per dataset.",
        "",
        "## Hyperplane LSH (`lsh_ann_topk`), single vs multi-table "
        "(OR-amplification)",
        "",
        "| planes | tables | recall@10 |",
        "|---|---|---|",
    ]
    for planes, tables in LSH_CONFIGS:
        lines.append(
            f"| {planes} | {tables} | {m['lsh'][f'{planes}x{tables}']:.3f} |"
        )
    lines += [
        "",
        "`num_tables` explodes each vector into L `(table:bucket)` keys; "
        "the join stays a bucket-keyed broadcast join and candidate pairs "
        "dedup before scoring, so tables multiply the candidate stream "
        "(bounded by L x bucket size), never the corpus scan count. "
        "Recall tracks 1-(1-p)^L; prefer fewer planes + more tables (the "
        "plane-literal expression tree grows ~planes*tables). The "
        "candidate set is provably a subset of the exact scoring universe "
        "(`tests/test_pipeline.py::test_lsh_ann_finds_planted_duplicates`; "
        "multi-table ordering pinned by "
        "`test_multi_table_lsh_raises_recall`).",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    from graphite_clickhouse_spark.session import get_spark

    spark = get_spark("ann-recall")
    m = measure(spark, SF_DIR)
    print(json.dumps(m))
    if "--print" not in sys.argv:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "RECALL.md",
        )
        with open(out, "w") as f:
            f.write(render_markdown(m, SF_DIR))
        print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
