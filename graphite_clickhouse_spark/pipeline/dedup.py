"""Deduplication operators — exact and near-duplicate detection at scale.

Designed for the 100 TB case:
- exact dedup        one hash-aggregate (map-side combine collapses dups
                     before the shuffle)
- ngram Jaccard      shingle explode -> self-join on shingle -> pair agg;
                     candidate pairs only ever materialize for docs that
                     SHARE a shingle, never the full cross product
- MinHash + LSH      k hash functions via xxhash64(seed-prefixed shingle),
                     banded into b buckets -> bucket join produces
                     candidates; verification recomputes exact Jaccard
- SimHash            64-bit sign-sum fingerprint; near-dups = small
                     Hamming distance within LSH buckets of bit-chunks

Everything is built-in expression work (no Python in the hot path);
xxhash64 is Spark's codegen'd 64-bit hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: keeper = min id, plus duplicate count.

    At scale, group on md5(text) rather than the full text to keep shuffle
    rows narrow; collision probability is negligible for 128-bit keys.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ------------------------------------------------------------- shingles

def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles as array<string> (space-joined)."""
    toks = F.split(F.trim(text), r"\s+")
    count = F.size(toks) - F.lit(n - 1)
    grams = F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    return F.array_distinct(grams)


def shingle_table(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) exploded table — the base for Jaccard and MinHash."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    |A ∩ B| from the shingle self-join, |A|,|B| from per-doc counts;
    J = inter / (|A| + |B| - inter). Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.
    """
    sh = shingle_table(df, n, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- minhash

def minhash_signature(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig array<bigint>) — k MinHash values per document.

    hash_i(shingle) = xxhash64(concat('i|', shingle)): one codegen'd
    expression per hash function, min-aggregated over the shingle set.
    Documents with no shingle get an empty signature (filtered out).
    """
    sh = shingle_table(df, n, text_col, id_col)
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; documents
    sharing any (band, bucket) become a candidate pair (id_a < id_b).

    One explode + one self-join on the (band, bucket) key; the join key is
    high-cardinality so the shuffle is well distributed. Output is distinct
    pairs — verify with exact Jaccard (ngram_jaccard_pairs) downstream.
    """
    assert bands * rows_per_band <= 1 << 16, "band config too large"
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = signatures.select(
        "id",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact-Jaccard
    verification of candidates only. Returns (id_a, id_b, jaccard)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(df, n, num_hashes, text_col, id_col)
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band)
    sh = shingle_table(df, n, text_col, id_col)
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    pairs = (
        cands.join(sets.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sets.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return pairs.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------- simhash

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Classic sign-of-weighted-bit-sums: for each bit position, count tokens
    whose xxhash64 has that bit set minus those that don't; fingerprint bit
    = sign. Pure expression work: per-token hash once, then a fold over
    bit positions.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum(b: int):
        # +1 if bit b of the token hash is set, else -1, summed over tokens
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    # bit masks are disjoint, so OR == sum; bit 63 is long-min in two's
    # complement (1 << 63 overflows Python->long otherwise)
    fp = None
    for b in range(bits):
        mask = -(1 << 63) if b == 63 else (1 << b)
        contrib = F.when(bit_sum(b) > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = contrib if fp is None else fp.bitwiseOR(contrib)
    return df.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_near_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, LSH-bucketed on 16-bit
    chunks (a pair within Hamming<=3 of 64 bits shares at least one of the
    4 chunks exactly — pigeonhole)."""
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for c in range(4)
        ]
    )
    chunked = fps.select(
        "id", "simhash", F.explode(chunk_structs).alias("ck")
    ).select("id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a = chunked.alias("a")
    b = chunked.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
