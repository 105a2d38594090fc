"""Stage profile for the perceptual-hash pair stage (r11 VERDICT #1).

Measures, at a given corpus dir (base or .scale/docs{N}x replica):
  1. hash-stage seconds (encode+decode+dhash, cached + counted),
  2. chunk-bucket population stats (max/median bucket, candidate-pair
     volume sum C(m,2) per (chunk,key) bucket),
  3. distinct-signature stats (how much same-signature mass a
     distinct-sig pair stage would collapse),
  4. pair-stage seconds alone (self-join over the cached hashes).

Usage: python tools/phash_bucket_profile.py <sf_dir> [video|image|audio]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    modality = sys.argv[2] if len(sys.argv) > 2 else "video"

    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.pipeline import multimodal as mm
    from graphite_clickhouse_spark.session import get_spark
    from graphite_clickhouse_spark.sources.tables import load_table

    spark = get_spark("phash-bucket-profile")
    docs = load_table(spark, sf_dir, "documents")
    groups = max(50, docs.count() // 10)
    gen = {
        "video": mm.synthetic_pattern_video_assets,
        "image": mm.synthetic_pattern_bmp_assets,
        "audio": mm.synthetic_pattern_wav_assets,
    }[modality]
    assets = gen(docs, groups=groups)
    dhash = {
        "video": lambda a: mm.video_dhash(a, 2),
        "image": mm.image_dhash,
        "audio": mm.audio_dhash,
    }[modality](assets)

    hashes = dhash.filter(F.col("dhash").isNotNull()).select(
        F.col("asset_id").alias("id"), F.col("dhash").alias("simhash")
    ).cache()
    t0 = time.monotonic()
    n = hashes.count()
    t_hash = time.monotonic() - t0
    print(f"hash stage: {t_hash:.2f}s, {n} hashed rows")

    nsig = hashes.select("simhash").distinct().count()
    sig_sizes = (
        hashes.groupBy("simhash").count()
        .agg(F.max("count"), F.expr("percentile_approx(count, 0.5)"),
             F.sum(F.expr("count*(count-1)/2")))
        .collect()[0]
    )
    print(f"distinct signatures: {nsig} (docs/sig max={sig_sizes[0]}, "
          f"median={sig_sizes[1]}, same-sig pairs={sig_sizes[2]})")

    chunk_bits = 16
    chunk_mask = (1 << chunk_bits) - 1
    chunk_structs = F.array(*[
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * chunk_bits)
            .bitwiseAND(F.lit(chunk_mask)).alias("key"),
        )
        for c in range(4)
    ])
    chunked = hashes.select(
        "id", "simhash", F.explode(chunk_structs).alias("ck")
    ).select("id", "simhash", F.col("ck.chunk").alias("chunk"),
             F.col("ck.key").alias("key"))
    bstats = (
        chunked.groupBy("chunk", "key").agg(
            F.count(F.lit(1)).alias("m"),
            F.countDistinct("simhash").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("m").alias("max_m"),
            F.expr("percentile_approx(m, 0.5)").alias("med_m"),
            F.sum(F.expr("m*(m-1)/2")).alias("cand_pairs"),
            F.max("d").alias("max_d"),
            F.sum(F.expr("d*(d-1)/2")).alias("cand_sig_pairs"),
        )
        .collect()[0]
    )
    print(f"buckets: n={bstats['n_buckets']} max_m={bstats['max_m']} "
          f"med_m={bstats['med_m']} candidate id-pairs={bstats['cand_pairs']} "
          f"max_distinct_sigs={bstats['max_d']} "
          f"candidate sig-pairs={bstats['cand_sig_pairs']}")

    # pair stage alone over the warm cache (current shape)
    a = chunked.alias("a")
    b = chunked.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    pairs = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(xor).alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .distinct()
    )
    t0 = time.monotonic()
    npairs = pairs.write.format("noop").mode("overwrite").save()
    t_pairs = time.monotonic() - t0
    print(f"pair stage (noop sink): {t_pairs:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
