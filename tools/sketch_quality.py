"""Measure MinHash sketch quality against exact n-gram Jaccard on the
real documents table — the dedup analog of RECALL.md's ANN curves:
estimation error by signature size, and LSH banding candidate recall at
the dedup threshold. Writes SKETCH_QUALITY.md.

Usage: python tools/sketch_quality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from graphite_clickhouse_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
        ngram_jaccard_pairs,
    )
    from graphite_clickhouse_spark.session import get_spark
    from graphite_clickhouse_spark.sources.tables import load_table

    spark = get_spark("sketch-quality")
    docs = load_table(spark, sf_dir, "documents")

    # ground truth: exact pairs down to a low threshold so the error
    # measurement spans the similarity range, not just near-dups
    exact = ngram_jaccard_pairs(docs, n=3, threshold=0.3).cache()
    n_pairs = exact.count()

    lines = [
        "# MinHash sketch quality (measured, documents table)",
        "",
        f"Dataset: {sf_dir} ({docs.count()} docs); ground truth = exact",
        f"3-gram Jaccard pairs >= 0.3 via the PPJoin prefix filter"
        f" ({n_pairs} pairs).",
        "",
        "## Estimation error by signature size",
        "",
        "MinHash estimate = fraction of agreeing signature positions;",
        "expected standard error ~ sqrt(J(1-J)/k).",
        "",
        "| k hashes | MAE | p90 abs err | max abs err |",
        "|---|---|---|---|",
    ]

    for k in (16, 32, 64, 128):
        sigs = minhash_signature(docs, n=3, num_hashes=k)
        est = (
            exact.join(sigs.withColumnRenamed("id", "id_a")
                       .withColumnRenamed("sig", "sig_a"), "id_a")
            .join(sigs.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("sig", "sig_b"), "id_b")
            .select(
                "jaccard",
                (
                    F.size(F.filter(
                        F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                        lambda x: x,
                    )) / F.lit(float(k))
                ).alias("est"),
            )
            .select(F.abs(F.col("est") - F.col("jaccard")).alias("err"))
        )
        row = est.agg(
            F.avg("err").alias("mae"),
            F.expr("percentile(err, 0.9)").alias("p90"),
            F.max("err").alias("mx"),
        ).collect()[0]
        lines.append(
            f"| {k} | {row.mae:.4f} | {row.p90:.4f} | {row.mx:.4f} |"
        )

    lines += [
        "",
        "## LSH banding recall of true near-duplicate pairs",
        "",
        "Candidate pairs from (bands x rows) banding vs the exact pair",
        "set at each threshold; expected hit prob = 1-(1-J^r)^b.",
        "",
        "| bands x rows | threshold | true pairs | candidates hit | recall |",
        "|---|---|---|---|---|",
    ]
    sigs64 = minhash_signature(docs, n=3, num_hashes=64).cache()
    sigs64.count()
    for bands, rows_per in ((16, 4), (8, 8)):
        cands = minhash_lsh_candidates(sigs64, bands=bands,
                                       rows_per_band=rows_per).cache()
        cands.count()
        for thr in (0.5, 0.7, 0.8):
            true = exact.filter(F.col("jaccard") >= thr)
            nt = true.count()
            hit = true.join(cands, ["id_a", "id_b"], "left_semi").count()
            rec = hit / nt if nt else float("nan")
            lines.append(
                f"| {bands}x{rows_per} | {thr} | {nt} | {hit} | {rec:.3f} |"
            )
        cands.unpersist()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "SKETCH_QUALITY.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"-> {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
