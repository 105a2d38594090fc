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

from .lifecycle import register_intermediates
from .text import WS_RE

#: per-task cap on the simhash kernel's token -> ±1-bit-vector cache
#: (env-overridable): bounds a worker's resident cache to ~50 MB at the
#: default instead of the old 2M-entry / 0.5-1 GB worst case (r10 ADVICE)
import os as _os

_SIMHASH_TOKEN_CACHE_MAX = int(
    _os.environ.get("SPARK_GRAFT_SIMHASH_CACHE_TOKENS", "200000")
)


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


def normalized_exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """exact_dedup over the CCNet-normalized text (text.py::
    normalize_for_dedup): one row per distinct normalization class —
    (norm_hash, keeper_id = min id, n_copies). Collapses the
    re-renderings exact_dedup cannot see (case flips, punctuation,
    whitespace layout, digit churn) while staying ONE hash agg on
    narrow md5 keys — the normalization runs in the scan projection,
    so the 100 TB shape is identical to exact_dedup's."""
    from .text import normalize_for_dedup

    return (
        df.groupBy(
            F.md5(normalize_for_dedup(F.col(text_col))).alias("norm_hash")
        )
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def plan_rows_estimate(df: DataFrame, bytes_per_row: int = 64) -> int | None:
    """Optimizer row estimate WITHOUT running a job: the row-count
    statistic when the plan carries one, else sizeInBytes divided by a
    deliberately-small ``bytes_per_row`` (64 B undershoots any real
    document row, so the estimate OVERSHOOTS the true count — callers
    gate toward their scale-safe path). Returns None when the plan's
    statistics are unknown (createDataFrame/RDD-backed inputs report
    the Long.MaxValue sentinel)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    if rc.isDefined():
        return int(str(rc.get()))
    size = int(str(stats.sizeInBytes()))
    if size >= (1 << 62):
        return None
    return size // bytes_per_row


def _bloom_words(
    seen_hashes: DataFrame, n_keys: int, bits_per_key: int, max_bits: int
) -> tuple[list[int], int]:
    """Build a bloom bitset over md5-hex keys, DISTRIBUTED: each key
    contributes 4 bit positions (independent 32-bit slices of its own
    md5 — no extra hashing), positions fold to (word, mask) rows, and a
    single ``bit_or`` hash-agg on word index produces at most
    m_bits/64 rows to collect. The corpus-sized side never sees the
    driver; only the finished words do.

    Returns (dense word list, m_bits); m_bits is a power of two sized
    at ``bits_per_key * n_keys`` and clamped to ``max_bits``."""
    m_bits = 1 << max(10, (bits_per_key * max(1, n_keys) - 1).bit_length())
    m_bits = min(m_bits, max_bits)
    pos = [
        (F.conv(F.substring("text_hash", 1 + 8 * j, 8), 16, 10)
         .cast("long") % m_bits).alias("p")
        for j in range(4)
    ]
    rows = (
        seen_hashes.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            F.shiftright("p", 6).alias("w"),
            # F.shiftleft only takes a literal bit count; the SQL
            # function accepts a column one
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                (F.col("p") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("m"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["m"]
    return words, m_bits


def incremental_exact_dedup(
    batch: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seen_text_col: str | None = None,
    bits_per_key: int = 10,
    bloom_max_bits: int = 1 << 23,
    use_bloom: bool = True,
    bloom_min_batch_rows: int = 2_000_000,
) -> DataFrame:
    """Exact dedup of a NEW batch against an already-ingested corpus —
    the incremental-ingest stage every growing corpus needs: daily
    crawl batches must drop (a) in-batch copies and (b) anything the
    corpus already holds, without re-deduplicating the corpus itself.

    Semantics (exact, like exact_dedup): one row per distinct batch
    text NOT present in ``seen`` — (text_hash, keeper_id = min batch
    id, n_copies = in-batch copy count). Keying is md5 like
    exact_dedup; ``seen`` contributes only hashes.

    100 TB shape: the batch first collapses with ONE hash agg (narrow
    md5 keys, the exact_dedup shuffle). The seen-side check is an
    anti-join on those same narrow keys — but a daily batch is MOSTLY
    novel, so the plan builds a bloom filter over the seen hashes
    first (distributed bit_or agg, _bloom_words; ~n_keys*10 bits
    collected once) and embeds it as ONE array literal: rows failing
    any of the 4 probes are definitely-new and BYPASS the anti-join
    entirely, shrinking the batch side of that shuffle to the ~1%
    false-positive rate plus the true duplicates. False positives
    only route rows through the exact join, so the result is
    bit-identical with the bloom on or off — the bloom is purely a
    shuffle-volume optimization, which is what makes a plain-SQL
    oracle possible. When the seen side exceeds
    ``bloom_max_bits / bits_per_key`` keys (~0.8M at the defaults;
    the literal would bloat the plan) the operator falls back to the
    plain anti-join, where Spark's own runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter, AQE) plays the same
    role executor-side.
    """
    seen_text_col = seen_text_col or text_col
    batch_agg = (
        batch.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )
    seen_hashes = (
        seen.select(F.md5(F.col(seen_text_col)).alias("text_hash")).distinct()
    )
    if use_bloom:
        # Size gate (r11, r10 VERDICT #5 profile): the bloom build pays
        # two driver-visible jobs (seen count + bit_or collect) and a
        # plan literal to SAVE batch-side shuffle volume — a trade that
        # only pays when the batch is big (measured at sf0.1: bloom
        # path 1.9-2.6 s vs 0.4-0.6 s plain anti-join; the whole batch
        # shuffle is smaller than the bloom's fixed cost). Gate on the
        # optimizer's row estimate — no job; unknown statistics
        # (createDataFrame inputs) assume BIG, the scale-safe default.
        est = plan_rows_estimate(batch)
        if est is not None and est < bloom_min_batch_rows:
            use_bloom = False
    if not use_bloom:
        return batch_agg.join(seen_hashes, "text_hash", "left_anti")
    seen_hashes = seen_hashes.cache()
    n_seen = seen_hashes.count()
    if n_seen == 0:
        seen_hashes.unpersist()
        return batch_agg
    if n_seen * bits_per_key > bloom_max_bits:
        # too big to literal-embed; plain anti-join + AQE runtime bloom
        seen_hashes.unpersist()
        seen_hashes = (
            seen.select(F.md5(F.col(seen_text_col)).alias("text_hash"))
            .distinct()
        )
        return batch_agg.join(seen_hashes, "text_hash", "left_anti")
    words, m_bits = _bloom_words(seen_hashes, n_seen, bits_per_key,
                                 bloom_max_bits)
    arr = F.lit(words)
    probes = [
        (F.conv(F.substring("text_hash", 1 + 8 * j, 8), 16, 10)
         .cast("long") % m_bits)
        for j in range(4)
    ]
    bloom_pass = None
    for p in probes:
        hit = (
            F.call_function(
                "shiftright",
                F.element_at(arr, F.shiftright(p, 6).cast("int") + 1),
                (p % 64).cast("int"),
            ).bitwiseAND(F.lit(1)) == 1
        )
        bloom_pass = hit if bloom_pass is None else (bloom_pass & hit)
    definitely_new = batch_agg.filter(~bloom_pass)
    candidates = batch_agg.filter(bloom_pass)
    survivors = candidates.join(seen_hashes, "text_hash", "left_anti")
    return register_intermediates(
        definitely_new.unionByName(survivors), seen_hashes
    )


# ------------------------------------------------------------- shingles

def word_ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles (space-joined) from a token array."""
    count = F.size(toks) - F.lit(n - 1)
    grams = F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    return F.array_distinct(grams)


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles as array<string> (space-joined)."""
    return word_ngrams_from_tokens(F.split(F.trim(text), WS_RE), n)




def tokens_projection(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, toks) with split() hoisted into its OWN projection.

    The n-gram lambdas below reference `toks` several times; keeping the
    split in a separate select stops CollapseProject from inlining it into
    every lambda element (the collapse-and-recompute trap costs ~6x on
    this stage — measured 3.4s -> 0.6s at sf0.1).

    The scan is also REPARTITIONED: a small corpus arrives as one parquet
    split, which would serialize the (CPU-bound) shingle hashing onto a
    single core. At 100 TB the file count provides the parallelism and the
    repartition collapses to a no-op-ish shuffle of narrow rows."""
    sc = df.sparkSession.sparkContext
    parts = max(df.rdd.getNumPartitions(), sc.defaultParallelism)
    return df.repartition(parts).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), WS_RE).alias("toks"),
    )


def ngram_hashes(n: int, toks_col: str = "toks") -> Column:
    """Sorted distinct 64-bit hashes of word n-grams over a materialized
    token array — hashes the n-token tuple directly (xxhash64 is n-ary),
    never building shingle strings. This is the hot-path kernel for both
    Jaccard and MinHash; string shingles (word_ngrams) exist only for
    display/tests."""
    toks = F.col(toks_col)

    def gram(i: Column) -> Column:
        return F.xxhash64(*[F.element_at(toks, i + j + 1) for j in range(n)])

    return F.array_sort(
        F.array_distinct(
            F.when(F.size(toks) < n, F.array().cast("array<bigint>")).otherwise(
                F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram)
            )
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT n-gram Jaccard pairs >= threshold via prefix filtering
    (PPJoin-family, Xiao et al., WWW'08 — lossless for the threshold).

    Naive shape (self-join on every shingle, then count per pair) explodes
    quadratically on hot shingles: at sf0.1 it makes 36M join rows / 10M
    candidate pairs for an 11k-pair answer. Prefix filtering keeps exactly
    the candidates that CAN reach the threshold:

    1. order each doc's shingle set by global document frequency, rarest
       first (hot shingles land at the tail);
    2. index only the first  p = |d| - ceil(t*|d|) + 1  shingles — if
       J(A,B) >= t then A and B must share an indexed shingle;
    3. join on indexed shingles only (+ length filter |B| >= t*|A| and
       the PPJoin POSITIONAL filter, r11: a match of prefix positions
       (i, j) can reach overlap at most 1 + min(|A|-i-1, |B|-j-1), so
       occurrences that cannot reach alpha = ceil(t/(1+t)*(|A|+|B|))
       die inside the join. Lossless: the SMALLEST common element of a
       qualifying pair sits in both prefixes with every other common
       element after it in both arrays, so its occurrence always passes
       the bound. alpha is computed with a 1e-9 slack so double
       rounding can only loosen the filter, never over-prune. Measured:
       candidate pairs 310k -> 64k at sf0.1, ~0.6 s off the query);
    4. verify candidates with one array_intersect over the full sorted
       hash arrays (no giant per-pair count aggregation).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    # per-doc sorted shingle-hash arrays, computed ONCE and cached: the
    # frequency pass and the ordering pass below both read this cache
    # instead of re-running the tokenize+gram-hash expression per branch
    # (at cluster scale: persist as a table instead)
    base = (
        tokens_projection(df, text_col, id_col)
        .filter(F.size("toks") >= n)  # token-count filter: pushable, and
        # does NOT re-evaluate the shingle expression as a scan filter
        .select("id", ngram_hashes(n).alias("sh"))
        .cache()
    )
    base.count()
    sh = base.select("id", F.explode("sh").alias("shingle"))
    # global document frequency — drives the rarest-first prefix ordering
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    # per-doc shingle array sorted by (df, shingle): one shuffle on id
    ordered = (
        sh.join(freq, "shingle")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_", "shingle"))),
                lambda s: s["shingle"],
            ).alias("by_freq"),
            F.count("*").alias("n_sh"),
        )
    )
    t = F.lit(float(threshold))
    prefix_len = (F.col("n_sh") - F.ceil(t * F.col("n_sh")) + 1).cast("int")
    sets = ordered.select(
        "id",
        "n_sh",
        F.array_sort("by_freq").alias("sh"),  # numeric order for intersect
        F.slice("by_freq", 1, prefix_len).alias("prefix"),
    )
    # referenced by both join sides + verification: materialize once
    sets = sets.cache()
    sets.count()

    index = sets.select(
        "id", "n_sh", F.posexplode("prefix").alias("pos", "shingle")
    )
    a = index.alias("a")
    b = index.alias("b")
    # positional filter operands (see step 3 in the docstring)
    alpha = F.ceil(
        t / (1 + t) * (F.col("a.n_sh") + F.col("b.n_sh")) - F.lit(1e-9)
    )
    ubound = 1 + F.least(
        F.col("a.n_sh") - F.col("a.pos") - 1,
        F.col("b.n_sh") - F.col("b.pos") - 1,
    )
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: J >= t needs t*|A| <= |B| (and symmetric)
            & (F.col("b.n_sh") * t <= F.col("a.n_sh"))
            & (F.col("a.n_sh") * t <= F.col("b.n_sh"))
            & (ubound >= alpha),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # the per-doc sets frame is one row per DOCUMENT — at corpus scale it
    # cannot broadcast, so no hint: the candidate side has already
    # collapsed (prefix filter + distinct), and AQE picks a broadcast at
    # runtime when the surviving side is small (same reasoning as
    # winnow_overlap_pairs' counts join)
    pairs = cands.join(
        sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(
        sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
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

    Shingles are hashed ONCE to 64 bits JVM-side (xxhash64); the k minima
    are taken over k multiply-add reorderings h_i(x) = a_i*x + b_i (mod
    2^64) of those hashes in a vectorized numpy kernel. No shuffle, no
    explode — signatures stream out of the scan stage.

    (A pure-expression nested-transform formulation is a trap: Catalyst's
    project collapsing inlines the shingle-construction expression into
    the per-hash lambda and recomputes it k times per row.)

    Documents with no shingles are dropped.
    """
    kernel = _make_minhash_kernel(num_hashes)
    return (
        tokens_projection(df, text_col, id_col)
        .filter(F.size("toks") >= n)  # cheap pushable filter; see minhash_dedup
        .select("id", ngram_hashes(n).alias("__sh"))
        .select("id", F.pandas_udf(kernel, "array<bigint>")(F.col("__sh")).alias("sig"))
    )




def _splitmix64(seed: int) -> int:
    """Deterministic 64-bit mixer (public-domain splitmix64 constants)."""
    z = (seed + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _make_minhash_kernel(num_hashes: int):
    import numpy as np
    import pandas as pd

    a = np.array(
        [(_splitmix64(2 * i) | 1) for i in range(num_hashes)], dtype=np.uint64
    )
    b = np.array([_splitmix64(2 * i + 1) for i in range(num_hashes)], dtype=np.uint64)

    def _kernel(sh_arrays):
        out = []
        with np.errstate(over="ignore"):
            for arr in sh_arrays:
                x = np.asarray(arr, dtype=np.int64).view(np.uint64)
                sig = (a[:, None] * x[None, :] + b[:, None]).min(axis=1)
                out.append(sig.view(np.int64))
        return pd.Series(out)

    return _kernel


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
    verification of candidates only. Returns (id_a, id_b, jaccard).

    The per-doc shingle-hash table and the signatures are cached: the LSH
    banding self-join and the two verification joins would otherwise
    re-evaluate them once per plan branch (at cluster scale you'd persist
    signatures as a table for the same reason).
    """
    rows_per_band = num_hashes // bands
    # verification sets as sorted 64-bit hashes: 8-byte elements instead of
    # full shingle strings keeps the pair join shuffle narrow.
    # The no-shingle filter is expressed on the TOKEN count, not on the
    # computed sh column: a filter on sh would be pushed below the
    # projection and re-evaluate the whole shingle expression as a scan
    # DataFilter (on the unrepartitioned input — measured 6-40x slower).
    sets = (
        tokens_projection(df, text_col, id_col)
        .filter(F.size("toks") >= n)
        .select("id", ngram_hashes(n).alias("sh"))
        .cache()
    )
    # NOT eagerly counted (r10): until sigs materializes below, the sig
    # expression is the cache's ONLY consumer, so sigs.count() fills the
    # sets cache in the same job — a separate count was one extra full
    # pass; the verification branches run later and read the warm cache.
    kernel = _make_minhash_kernel(num_hashes)
    sigs = sets.select(
        "id", F.pandas_udf(kernel, "array<bigint>")(F.col("sh")).alias("sig")
    ).cache()
    sigs.count()  # EAGER: the LSH self-join reads it from both sides
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band)
    # per-doc shingle sets joined back onto the banded candidates: one
    # row per DOCUMENT, so no broadcast hint (cannot broadcast at corpus
    # scale); the candidate side is already LSH-collapsed and AQE
    # broadcasts at runtime when it is small
    pairs = (
        cands.join(sets.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sets.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    # pure-JVM set intersection over the ~50-element sorted arrays; a
    # Python kernel here would be Arrow-shipped AND evaluated twice
    # (once in the threshold Filter, once in the output Project)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return pairs.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def hash60_portable(col: Column) -> Column:
    """60-bit hash both Spark and DuckDB can compute bit-identically:
    the first 15 hex chars of md5, parsed as an integer.

    Spark:  conv(substr(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

    Used by the *portable* near-dup modes so the DuckDB oracle can verify
    the full MinHash/SimHash pipelines end-to-end (xxhash64, the
    production default, has no DuckDB twin). md5 costs ~3x xxhash64 but
    stays JVM-side and codegen'd; at 100 TB prefer the xxhash64 mode."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_dedup_portable(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup with an ORACLE-VERIFIABLE hash family.

    Same algorithm as `minhash_dedup` (signature -> banded buckets ->
    exact-Jaccard verification of candidates only) but every hash is
    md5-derived (hash60_portable), lane i's hash of shingle s being
    h_i(s) = hash60(str(i) || ':' || s), and the band key is the
    comma-joined signature slice — all reproducible in ANSI-ish SQL, so
    DuckDB can verify the exact answer set. Plan shape is identical to
    the production mode: shingle work map-side, one high-cardinality
    (band, key) self-join for candidates, broadcast verification joins.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    Jaccard computed over distinct shingle *strings* (== over their
    hashes, collisions aside).
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"
    sets = (
        tokens_projection(df, text_col, id_col)
        .filter(F.size("toks") >= n)
        .select("id", word_ngrams_from_tokens(F.col("toks"), n).alias("sh"))
        .cache()
    )
    # NOT eagerly counted (r10): the sig transform below is the cache's
    # only consumer until sigs.count() runs, which fills this cache in
    # the same job; the two verification branches read it warm later.
    # verification sets as sorted 60-bit hashes: 8-byte elements instead
    # of shingle strings keep the broadcast and the intersect cheap; the
    # oracle hashes identically, so both engines see the same (negligible)
    # collision behavior. Kept as a JVM expression: an Arrow-kernel
    # variant with a per-task md5 cache was A/B-tested this round and
    # LOST — the JVM md5 work is already parallel (tokens_projection
    # repartitions) and one md5 per shingle is cheap, while the kernel
    # added a Python stage (Arrow transfer + worker forks) per branch.
    hsets = sets.select(
        "id",
        F.array_sort(
            F.array_distinct(F.transform(F.col("sh"), hash60_portable))
        ).alias("hs"),
    )
    lanes = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.transform(
        lanes,
        lambda lane: F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: hash60_portable(
                    F.concat(lane.cast("string"), F.lit(":"), s)
                ),
            )
        ),
    )
    # cached: the banded explode and both sides of the candidate self-join
    # would otherwise re-evaluate the k x |sh| md5 lanes per plan branch.
    # (An Arrow-kernel variant with a per-task shingle->lane-hash cache
    # was A/B-tested this round and LOST: the JVM lanes are already
    # parallel across the repartitioned scan and evaluated once thanks to
    # this cache, while the kernel added Arrow transfer + worker forks.)
    sigs = sets.select("id", sig.alias("sig")).cache()
    sigs.count()
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    ).alias("bkey"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # per-doc hash sets: no broadcast hint (one row per document — AQE
    # decides at runtime once the Hamming-bucket join has collapsed the
    # candidate side)
    pairs = cands.join(
        hsets.withColumnsRenamed({"id": "id_a", "hs": "hs_a"}), "id_a"
    ).join(hsets.withColumnsRenamed({"id": "id_b", "hs": "hs_b"}), "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return pairs.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash with md5-derived token hashes (hash60_portable
    semantics: first 15 hex chars of md5 as an integer) so a SQL oracle
    can reproduce the fingerprints bit-for-bit. Same sign-sum
    construction as `simhash`.

    The md5 runs INSIDE the Arrow kernel (hashlib over the hoisted token
    arrays): a per-token conv(substr(md5)) expression lambda evaluates
    interpreted per element on however few partitions the corpus has —
    measured 2.6 s vs 0.6 s at sf0.1 — while the kernel output is
    bit-identical. The kernel is ITERATOR-form with a per-task cache of
    each distinct token's ±1 bit vector (guide: heavyweight state once
    per task): natural corpora repeat tokens enormously (Zipf), so each
    distinct token pays its md5 + bit unpack once per task; the sign-sum
    over cached int32 vectors is integer addition, order-independent,
    bit-identical to hashing every occurrence."""

    def _kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = np.arange(60, dtype=np.uint64)
        masks = (np.uint64(1) << shifts).astype(np.uint64)
        cache: dict[str, object] = {}

        def signed_bits(t: str):
            v = cache.get(t)
            if v is None:
                h = np.uint64(
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                )
                v = (((h >> shifts) & np.uint64(1)).astype(np.int32) * 2) - 1
                # cap sized like the Arrow-batch memory rationale (r10
                # ADVICE): ~240 B per cached 60-int32 vector, so 200k
                # entries bound one task's cache near 50 MB instead of
                # the old 2M cap's 0.5-1 GB worst case; Zipf means the
                # hot tokens that matter stay resident either way
                if len(cache) < _SIMHASH_TOKEN_CACHE_MAX:
                    cache[t] = v
            return v

        for tok_arrays in batches:
            out = np.zeros(len(tok_arrays), dtype=np.int64)
            for row, toks in enumerate(tok_arrays):
                if toks is None or len(toks) == 0:
                    continue
                sums = np.zeros(60, dtype=np.int64)
                for t in toks:
                    sums += signed_bits(t)
                fp = masks[sums > 0].sum(dtype=np.uint64)
                out[row] = np.uint64(fp).astype(np.int64)
            yield pd.Series(out)

    base = tokens_projection(df, text_col, id_col)
    fp = F.pandas_udf(_kernel, "long", F.PandasUDFType.SCALAR_ITER)(
        F.col("toks")
    )
    return base.select(F.col("id"), fp.alias("simhash"))


# --------------------------------------------------------------- simhash

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Classic sign-of-weighted-bit-sums: for each bit position, count tokens
    whose xxhash64 has that bit set minus those that don't; fingerprint bit
    = sign. Token hashing stays JVM-side (xxhash64); the 64-way bit
    unpack+sum runs as a vectorized numpy kernel in an Arrow-batched
    pandas UDF — ~6x faster than a 64-fold codegen expression tree, and
    the only Python in the dedup family.
    """
    assert bits == 64, "xxhash64 simhash is fixed at 64 bits"
    # explicit returnType form: postponed annotations (PEP 563) break the
    # type-hint variant of pandas_udf
    _fp_from_hashes = F.pandas_udf(_make_simhash_kernel(bits), "long")

    toks = F.split(F.trim(F.col(text_col)), WS_RE)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(
        F.col(id_col).alias("id"), _fp_from_hashes(hashes).alias("simhash")
    )


def _make_simhash_kernel(bits: int):
    """Vectorized sign-sum fingerprint over pre-hashed token arrays."""
    import pandas as pd

    def _fp_kernel(hash_arrays):
        import numpy as np

        out = np.zeros(len(hash_arrays), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        masks = (np.uint64(1) << shifts).astype(np.uint64)
        for row, arr in enumerate(hash_arrays):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            bit = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            sums = (bit * 2 - 1).sum(axis=0)
            fp = masks[sums > 0].sum(dtype=np.uint64)  # disjoint bits: sum==OR
            out[row] = np.uint64(fp).astype(np.int64)
        return pd.Series(out)

    return _fp_kernel


def simhash_near_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    sig_dedup_min_rows: int = 200_000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, LSH-bucketed on
    (bits/4)-wide chunks (a pair within Hamming<=3 of the fingerprint
    shares at least one of the 4 chunks exactly — pigeonhole).

    The fingerprint frame is MATERIALIZED (cache + eager count) before
    the pair stage: every branch below reads `fps`, and without the
    boundary the ENTIRE upstream fingerprint pipeline — for the
    perceptual family that is synthetic-encode + real decode + hash,
    the most expensive stage of the whole query — executes once per
    branch. The cached frame is (id, simhash) — 16 bytes/doc, the same
    narrow-intermediate envelope the minhash signature cache documents;
    at cluster scale persist it as a table. Lifecycle-registered so
    long-lived sessions release the blocks.

    Candidate generation is SIZE-ADAPTIVE (r11, closing the r10 VERDICT
    video_phash ladder item). Below ``sig_dedup_min_rows`` fingerprints
    the r10 shape stands: chunk-explode the per-id rows and self-join —
    fewest exchanges, measured fastest at bench scale (the distinct-sig
    shape costs +0.3-0.7 s per query at sf0.1, pure exchange floor).
    At or above the threshold, candidates are generated over DISTINCT
    signatures: the bucket predicate and the Hamming distance depend
    only on the signature, so documents sharing one are interchangeable
    in the chunk join. With duplicate clusters of size m per signature,
    the per-id chunk self-join generates sum(m_i*m_j) candidate rows
    per bucket — measured 34.0M candidate id-pairs at the 100x
    documents ladder where the signature-level join needs 431k (79x
    less), and the gap compounds quadratically per decade because chunk
    keys live in a fixed 2^(bits/4) space; at the next decade the
    per-id join is ~1G candidates vs ~19M. Both paths produce the SAME
    pair set (pinned by TestSimhashNearPairsSigDedupEquivalence); the
    gate reads the count the eager materialization already ran, so no
    extra job. The distinct-sig path has three parts, each streaming
    its own output:

    - same-signature pairs: a self-join of `fps` on simhash (id_a <
      id_b), hamming 0 by construction — the per-cluster quadratic
      OUTPUT is produced directly by the join without pairwise hash
      work (sort-merge buffers spill for monster clusters);
    - cross-signature candidates: the 4x(bits/4)-chunk LSH self-join
      over `distinct` signatures, Hamming-filtered and deduped at
      SIGNATURE level (narrow 3-column rows);
    - expansion: two joins of the surviving signature pairs back onto
      `fps` fan the id pairs out, ordered with least/greatest.

    The union is exactly the old per-id join's output: a pair is
    same-sig (always bucket-sharing, hamming 0) or cross-sig (generated
    iff its signatures share a chunk, the same LSH recall)."""
    chunk_bits = bits // 4
    assert chunk_bits * 4 == bits, "bits must be divisible by 4"
    chunk_mask = (1 << chunk_bits) - 1
    fps = fps.select("id", "simhash").cache()
    # EAGER: every pair-stage branch reads the cache; the count also
    # feeds the size gate below (no extra job — it had to run anyway)
    n_fps = fps.count()
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * chunk_bits)
                .bitwiseAND(F.lit(chunk_mask))
                .alias("key"),
            )
            for c in range(4)
        ]
    )
    if n_fps < sig_dedup_min_rows:
        # bench-scale shape (r10): per-id chunk explode + self-join
        chunked = fps.select(
            "id", "simhash", F.explode(chunk_structs).alias("ck")
        ).select("id", "simhash", F.col("ck.chunk").alias("chunk"),
                 F.col("ck.key").alias("key"))
        a = chunked.alias("a")
        b = chunked.alias("b")
        xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
        out = (
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
            # filter BEFORE the dedup aggregate: a loose bucket match
            # (chunk collision, far fingerprints) dies before it costs a
            # shuffle row
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )
        return register_intermediates(out, fps)
    # at-scale shape: candidates over DISTINCT signatures
    fa = fps.alias("fa")
    fb = fps.alias("fb")
    same = (
        fa.join(
            fb,
            (F.col("fa.simhash") == F.col("fb.simhash"))
            & (F.col("fa.id") < F.col("fb.id")),
        )
        .select(
            F.col("fa.id").alias("id_a"),
            F.col("fb.id").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    sigs = fps.select("simhash").distinct()
    chunked = sigs.select(
        "simhash", F.explode(chunk_structs).alias("ck")
    ).select("simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a = chunked.alias("a")
    b = chunked.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    sig_pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.simhash") < F.col("b.simhash")),
        )
        .select(
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
            F.bit_count(xor).alias("hamming"),
        )
        # filter BEFORE the dedup aggregate: a loose bucket match (chunk
        # collision, far fingerprints) dies before it costs a shuffle row
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    cross = (
        sig_pairs.join(
            fps.select(F.col("simhash").alias("sig_a"), F.col("id").alias("ida")),
            "sig_a",
        )
        .join(
            fps.select(F.col("simhash").alias("sig_b"), F.col("id").alias("idb")),
            "sig_b",
        )
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "hamming",
        )
    )
    out = same.unionByName(cross)
    return register_intermediates(out, fps)


def source_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    group_col: str = "source",
    hashed: bool = False,
) -> DataFrame:
    """Cross-source n-gram overlap matrix: EXACT Jaccard between the
    distinct shingle sets of every source pair — the corpus-level
    redundancy/contamination audit run before mixing sources into a
    training mix (the between-dump overlap measurements of the
    RefinedWeb/CCNet lineage, arXiv:2306.01116 §3).

    Scale shape: one explode to distinct (shingle, source) — map-side
    combine does the heavy dedup — then a per-shingle source-set whose
    size is bounded by the NUMBER OF SOURCES (tens-hundreds), never by
    corpus size; the pair explode is |shingles| x O(k^2) with k = sources
    sharing that shingle, and the final aggregate has <= |sources|^2
    rows with per-source totals broadcast onto it. No document-level
    join anywhere, so the plan survives a 100x corpus scale-up; skew on
    universal shingles is capped by the source-set bound.

    `hashed=True` swaps string shingles for xxhash64 tuples (the
    production hot path, ~8 bytes/shingle through the shuffle);
    `hashed=False` keeps strings so external engines reproduce the
    numbers bit-for-bit.

    Returns (source_a, source_b, shingles_a, shingles_b,
    common_shingles, jaccard) with source_a < source_b.
    """
    base = tokens_projection(df, text_col, group_col)
    shingle = (
        F.explode(ngram_hashes(n)) if hashed
        else F.explode(word_ngrams_from_tokens(F.col("toks"), n))
    )
    sh = (
        base.select(F.col("id").alias("grp"), shingle.alias("shingle"))
        .distinct()
    )
    counts = sh.groupBy("grp").agg(F.count("*").alias("n_sh"))
    grps = F.array_sort(F.collect_set("grp"))
    # all ordered source pairs sharing this shingle: a = grps[i],
    # b in grps[i+1:] — slice length size(g) over-reads safely
    per_shingle = sh.groupBy("shingle").agg(grps.alias("grps"))
    g = F.col("grps")
    pair_arr = F.flatten(
        F.transform(
            g,
            lambda a, i: F.transform(
                F.slice(g, i + F.lit(2), F.size(g)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    pairs = (
        per_shingle.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count("*").alias("common_shingles"))
    )
    ca = counts.select(F.col("grp").alias("source_a"),
                       F.col("n_sh").alias("shingles_a"))
    cb = counts.select(F.col("grp").alias("source_b"),
                       F.col("n_sh").alias("shingles_b"))
    return (
        pairs.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a", "source_b", "shingles_a", "shingles_b",
            "common_shingles",
            F.round(
                F.col("common_shingles")
                / (F.col("shingles_a") + F.col("shingles_b")
                   - F.col("common_shingles")),
                6,
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------- decontamination

def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ANY
    word n-gram with a benchmark/eval corpus (the public n-gram-overlap
    practice — GPT-3 appendix C used 13-grams; n is configurable).

    Scale shape: the benchmark side is tiny relative to the corpus, so
    its distinct grams BROADCAST and the overlap check is a broadcast
    semi-join on the exploded corpus grams — the corpus never shuffles.
    With ``hashed`` (the default, r7) both sides join on xxhash64 of the
    gram instead of the ~60-byte gram string: the broadcast table and
    the join keys shrink ~8x, which is what keeps a large eval suite
    (every benchmark's every gram) under the broadcast threshold at
    100 TB. No false negatives ever; a false positive needs a 64-bit
    collision between a corpus gram and a bench gram (expected extra
    hits = |corpus grams| x |bench grams| / 2^64 — single digits even at
    1e12 x 1e8). Pass hashed=False to join on the exact strings.
    Returns (id, n_gram_hits, contaminated); documents with fewer than n
    tokens cannot collide and report 0.
    """
    doc_grams = (
        tokens_projection(docs, text_col, id_col)
        .filter(F.size("toks") >= n)
        .select("id", F.explode(word_ngrams_from_tokens(F.col("toks"), n)).alias("gram"))
    )
    bench_grams = (
        tokens_projection(benchmark, text_col, id_col)
        .filter(F.size("toks") >= n)
        .select(F.explode(word_ngrams_from_tokens(F.col("toks"), n)).alias("gram"))
    )
    if hashed:
        doc_grams = doc_grams.select("id", F.xxhash64("gram").alias("gram"))
        bench_grams = bench_grams.select(F.xxhash64("gram").alias("gram"))
    bench_grams = bench_grams.distinct()
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_gram_hits"))
    )
    base = docs.select(F.col(id_col).alias("id"))
    return (
        base.join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_gram_hits"), F.lit(0)).cast("int").alias("n_gram_hits"),
            (F.coalesce(F.col("n_gram_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ------------------------------------------------- cluster resolution

def dedup_clusters(
    pairs: DataFrame, max_iter: int = 20, checkpoint_dir: str | None = None
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters: connected components via
    min-label propagation with pointer jumping (label <- label[label]
    each round, so propagated depth DOUBLES: O(log diameter) rounds —
    the large-star idea), -> (id, canonical_id) where canonical_id =
    min id in the component. The keep-list is then `canonical_id == id`.

    Scale shape: each round is the neighbor join + min aggregate plus
    one label self-join, all on the edge list; intermediate label frames
    are checkpointed (truncating lineage — nested round plans blow the
    JVM stack after ~10 iterations otherwise) and freed as soon as the
    next round lands. Raises if max_iter rounds did not reach the
    fixpoint: partially-propagated labels would silently split
    components and keep duplicate documents.

    checkpoint_dir: None (default) uses localCheckpoint — executor-local
    blocks, fine for short local runs but UNRECOVERABLE if an executor
    dies mid-iteration. For cluster runs over 100 TB set a reliable
    path (HDFS/S3): iterations then checkpoint through the shared
    filesystem and survive executor loss.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)
    # undirected edge list in ONE pass over the pair plan: exploding both
    # orientations per pair row replaces the former self-union, whose two
    # branches each read the pair set — that needed an extra cache +
    # eager count of `pairs` (upstream pair producers are expensive
    # plans) just so the union's branches would not run the producer
    # twice.  The explode runs the producer exactly once inside the same
    # job that materializes the edge cache: one job and one cache fewer
    # per call, identical edge set (r10).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()  # AQE coalesces the tiny-graph shuffles adaptively
        .cache()
    )
    edges.count()
    # init with the first neighbor-min already folded in: label0(id) =
    # min({id} U neighbors(id)) — one aggregate over the edge list in
    # the same job the old identity init paid, but for clique-shaped
    # duplicate clusters (the overwhelmingly common case) the fixpoint
    # is reached immediately and the loop exits after ONE verification
    # round instead of two full rounds (the min-label fixpoint is
    # invariant to a tighter init).
    # LAZY on round 1 (r10): the first hop's single job evaluates this
    # aggregate, and BOTH of its references there (the join's left side
    # and the neighbor-min input) sit above the same aggregation
    # exchange, which Spark's ReuseExchange dedupes — so the separate
    # eager init checkpoint job bought nothing.  Safe w.r.t. the
    # winnow/lazy-cache race lesson: edges IS eagerly materialized
    # above, so the racing branches re-read an in-memory cache, never
    # the pair producer.  Later rounds rebind `labels` to checkpointed
    # frames, and the convergence exit returns the materialized hop
    # frame (label == old at the fixpoint), so the lazy plan never
    # escapes this function.
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .select(F.col("src").alias("id"), "label")
    )
    converged = False
    for it in range(max_iter):
        # candidate label per node: min over its own and neighbors' labels
        neighbor = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        # the previous round's label rides along as `old`, so the
        # convergence probe is a FILTER over this materialized frame —
        # no join against the previous label frame. Materialized EAGER
        # on purpose: (a) both sides of the pointer-jump self-join read
        # it, and (b) a lazy checkpoint was A/B-tested this round and
        # LOST — the convergence probe ends in limit(1), so a lazy plan
        # only PARTIALLY materializes under it, the lineage never
        # truncates, and every later round re-computes the
        # unmaterialized partitions (measured 5.1 -> 7.6 s at sf0.1).
        hop = ckpt(
            labels.join(neighbor, "id", "left").select(
                "id",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        # probe BEFORE the pointer jump: if the neighbor-min step changed
        # nothing, then for every edge (u,v) label(u) == label(v) (u's
        # unchanged min over neighbors means label(v) >= label(u), and
        # symmetrically), so labels are constant per component; every
        # label is the id of a component member (mins of ids) and the
        # min-id node's label never exceeds its own id, so the constant
        # IS the component min — the labeling is final and the round's
        # pointer-jump self-join + checkpoint are skipped outright.
        # Exits on exactly the same round as the old after-jump probe
        # (a neighbor-min change always survives the jump's further min,
        # and a neighbor-min fixpoint makes the jump a no-op).
        changed = (
            hop.filter(F.col("label") != F.col("old")).limit(1).count()
        )
        if changed == 0:
            if it > 0:
                labels.unpersist()
            # at the fixpoint label == old everywhere, so the
            # materialized hop IS the final labeling — keep it (the
            # round-1 `labels` is a lazy plan over the soon-unpersisted
            # edge cache and must not escape)
            labels = hop.select("id", "label")
            converged = True
            break
        new_labels = ckpt(
            hop.alias("a")
            .join(
                hop.select(
                    F.col("id").alias("label"), F.col("label").alias("ll")
                ).alias("b"),
                "label",
                "left",
            )
            .select("id", F.least(F.col("label"), F.coalesce("ll", "label")).alias("label"))
        )
        if it > 0:
            labels.unpersist()
        hop.unpersist()
        labels = new_labels
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iter} rounds "
            f"(component diameter > 2^{max_iter}); raise max_iter"
        )
    return labels.select("id", F.col("label").alias("canonical_id"))


def paragraph_dedup(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Repeated-paragraph removal — the RefinedWeb/Dolma line-level dedup
    stage: a paragraph (separator-delimited block) that appears in
    >= ``min_docs`` DISTINCT documents is boilerplate (headers, footers,
    licenses, navigation) and is struck from every document; paragraph
    order within each document is preserved and singletons pass through.

    -> (id, clean_text, n_paragraphs, n_removed). Documents whose every
    paragraph is boilerplate come back with clean_text '' (kept, so the
    caller can filter or audit them; the C4/RefinedWeb reports track the
    removal rate, which is sum(n_removed)/sum(n_paragraphs)).

    100 TB shape: posexplode -> hash-aggregate on the NORMALIZED
    paragraph (count(DISTINCT doc) with map-side partial agg) ->
    left-anti-shaped join back on the paragraph key -> re-assemble per
    doc. One explode, two shuffles, both keyed on bounded-cardinality
    values; no pairwise work at any point (frequency, not similarity —
    the near-dup operators above handle fuzzy matches). Grouping keys
    here are the normalized paragraph strings themselves, which is exact
    at any scale; swap the key for xxhash64(norm) to shrink shuffle
    width when paragraphs are long — the plan shape is unchanged.

    NULL text behaves like empty text (0 paragraphs, clean_text '').
    Blank / whitespace-only paragraphs are ALWAYS stripped from
    clean_text (even when unique) and are excluded from both
    n_paragraphs and n_removed — only non-blank blocks count.  ``sep``
    is treated as a LITERAL separator on both the split and the
    reassembly side (regex metacharacters in sep are quoted before the
    split, matching the literal array_join below).
    """
    if min_docs < 2:
        # min_docs=1 would mark EVERY paragraph "repeated" and erase the
        # corpus; that is never the boilerplate semantics, so fail loud
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    norm = F.regexp_replace(F.trim(F.lower(F.col("para"))), WS_RE, " ")
    # F.split takes a Java regex but array_join reassembles with the
    # literal string — quote the separator (java.util.regex
    # Pattern.quote scheme: \Q...\E with embedded \E split out) so a
    # sep like '.' or '|' splits literally and round-trips.
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), F.lit(sep_rx))).alias(
                "pos", "para"
            ),
        )
        .withColumn("norm", norm)
        .filter(F.col("norm") != "")
    )
    repeated = (
        paras.groupBy("norm")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("norm", F.lit(True).alias("_repeated"))
    )
    flagged = paras.join(repeated, "norm", "left")
    per_doc = flagged.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_paragraphs"),
        F.count(F.col("_repeated")).cast("int").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_repeated").isNull(),
                            F.struct(F.col("pos"), F.col("para")),
                        )
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
    )
    # docs that were entirely empty/whitespace still get a row
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_paragraphs", F.lit(0)).alias("n_paragraphs"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


def _staged_span_hashes(
    df: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    portable: bool,
    keep: tuple[str, ...] = (),
    empty_as_empty_array: bool = False,
) -> DataFrame:
    """Shared prologue of the ExactSubstr family (duplicate_spans /
    remove_duplicate_spans / duplicate_span_extents) — extracted r9 so
    the tokenizer/hash contract with the DuckDB oracles lives ONCE:

    - normalize: collapse whitespace BEFORE trim (trim() strips only
      spaces in both engines, so trim-first leaves edge \\t/\\n that
      split into phantom ''-tokens);
    - tokenize: plain split, or (``empty_as_empty_array``, the removal
      path) ''/NULL -> [] so the rebuild cannot resurrect a phantom
      empty token;
    - hoist tokens through a REAL projection barrier: the repartition
      sits BETWEEN the tokenize projection and the span projection, so
      CollapseProject cannot inline the split into the window lambda
      (which would re-tokenize once PER WINDOW — measured 19 us/window
      vs 0.3 us), and a single-split corpus parallelizes;
    - hash stride-1 k-token windows (xxhash64, or the md5 60-bit lane
      the oracle computes bit-identically under ``portable``);
    - CACHE the hashed frame: it feeds 2-3 downstream branches, and the
      registration is an optimizer barrier stopping
      InferFiltersFromGenerate from re-evaluating the span transform
      below the repartition (measured 6.3 s -> 0.9 s at 1x).  No eager
      count() — registration alone substitutes at action planning time.
      Callers register it on their result for
      lifecycle.unpersist_intermediates.  At cluster scale: persist to
      a table instead.

    ``keep`` selects extra staged columns from {"n_spans", "_toks"}.
    -> cached DataFrame(id, *keep, _h: array<bigint>).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS_RE, " "))
    if empty_as_empty_array:
        toks = F.when(
            norm.isNull() | (norm == ""), F.array().cast("array<string>")
        ).otherwise(F.split(norm, " "))
    else:
        # empty text splits to [""] (1 token < k) and NULL text's
        # size() is NULL — greatest() skips NULLs, so both land on 0
        toks = F.split(norm, " ")
    sc = df.sparkSession.sparkContext
    parts = max(df.rdd.getNumPartitions(), sc.defaultParallelism)
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.greatest(F.size(toks) - (k - 1), F.lit(0)).alias("n_spans"),
    ).repartition(parts)
    tk = F.col("_toks")

    def span_hash(i):
        span = F.concat_ws(" ", F.slice(tk, i + F.lit(1), F.lit(k)))
        return hash60_portable(span) if portable else F.xxhash64(span)

    spans = F.when(
        F.col("n_spans") <= 0, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(F.sequence(F.lit(0), F.col("n_spans") - 1), span_hash)
    )
    return base.select("id", *keep, spans.alias("_h")).cache()


def duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Exact duplicate-span statistics — the token-window formulation of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better", the ExactSubstr pass): a k-token window whose exact
    normalized text occurs in >= ``min_docs`` DISTINCT documents is a
    duplicated span; the per-document duplicated fraction is the signal
    the paper thresholds on (their suffix-array finds variable-length
    matches >= 50 tokens; fixed k-token windows with stride 1 flag the
    same regions — any duplicate substring of >= k tokens contains a
    duplicated window — at hash-join cost instead of a distributed
    suffix array).

    -> (id, n_spans, n_dup_spans, dup_fraction): windows per document,
    windows occurring in >= min_docs documents, and their ratio
    (0.0 for documents shorter than k tokens; dup_fraction rounded to
    6 dp for cross-engine float stability).

    100 TB shape: identical to paragraph_dedup — one explode (stride-1
    windows are ~n_tokens rows, the same volume winnowing already
    proves out), one count-distinct hash aggregation keyed on the span
    HASH (64-bit key, not the span text: the shuffle carries 8 bytes
    per window no matter how long the tokens are), one join back, one
    per-doc aggregation. No pairwise work; boilerplate-heavy spans are
    exactly the high-df keys and the aggregation is the only place
    they concentrate (count buffers, not lists).

    ``portable=True`` swaps xxhash64 for the md5 60-bit lane the DuckDB
    oracle computes bit-identically (hash60_portable).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # shared ExactSubstr prologue (tokenize/barrier/hash/cache — see
    # _staged_span_hashes); the cache feeds BOTH the repeated-span
    # aggregate and the join-back side
    staged = _staged_span_hashes(
        df, k, text_col, id_col, portable, keep=("n_spans",)
    )
    e = staged.select(
        "id", F.explode("_h").alias("h")
    )
    repeated = (
        e.groupBy("h")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h", F.lit(True).alias("_rep"))
    )
    per_doc = (
        e.join(repeated, "h", "left")
        .groupBy("id")
        .agg(F.count(F.col("_rep")).cast("int").alias("n_dup_spans"))
    )
    result = (
        staged.select("id", "n_spans")
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.col("n_spans").cast("int").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.when(F.col("n_spans") > 0,
                       F.coalesce("n_dup_spans", F.lit(0))
                       / F.col("n_spans")).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_fraction"),
        )
    )
    return register_intermediates(result, staged)


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Exact duplicate-span REMOVAL — the acting half of the Lee et al.
    2021 ExactSubstr pass (``duplicate_spans`` is the measuring half):
    every token covered by a k-token window whose normalized text occurs
    in >= ``min_docs`` DISTINCT documents is cut from every document
    EXCEPT the span's keeper, then the survivors are reassembled.

    Keeper rule (deterministic, engine-neutral): per duplicated window
    text, the smallest document id containing it keeps ALL its
    occurrences; other documents lose every token position the window
    covers. A token falling under several duplicated windows is removed
    if ANY of them says remove. This is the paper's remove-all-but-one
    semantics in window form (their suffix array cuts one canonical
    byte-range; position-set union over fixed windows cuts the same
    regions without global offsets).

    -> (id, n_tokens, n_removed, clean_text): normalized token count,
    tokens cut, and the reassembled text (single-space joined — the
    same normalization the span hashing used). NULL/empty text yields
    (0, 0, '').

    100 TB shape: the measuring half's plan plus one bounded explode —
    windows explode once (~n_tokens rows carrying an 8-byte hash), the
    duplicated-window aggregation is the same count-distinct + min
    hash-agg, and the removal explode multiplies only DUPLICATED
    non-keeper windows by k before a distinct+collect per doc. The
    rebuild is a row-local array filter over sorted removed positions.
    No pairwise work anywhere; boilerplate-heavy spans concentrate in
    count/min buffers, never lists.

    ``portable=True`` swaps xxhash64 for the md5 60-bit lane the DuckDB
    oracle computes bit-identically (hash60_portable).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # shared ExactSubstr prologue; '' and NULL both mean zero tokens
    # here (unlike duplicate_spans' [''] — the rebuild must not
    # resurrect a phantom empty token). The cache feeds the window
    # aggregate, the removal join AND the rebuild.
    staged = _staged_span_hashes(
        df, k, text_col, id_col, portable, keep=("_toks",),
        empty_as_empty_array=True,
    )
    e = staged.select("id", F.posexplode("_h").alias("i", "h"))
    keepers = (
        e.groupBy("h")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.min("id").alias("keeper"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("h", "keeper")
    )
    removed = (
        e.join(keepers, "h")
        .filter(F.col("id") != F.col("keeper"))
        .select(
            "id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (k - 1))
            ).alias("pos"),
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("_rm"))
    )
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    # Mask-based rebuild (r11, r10 VERDICT #6): the per-token
    # array_contains filter cost O(n_tokens * |removed|) per row — a
    # heavily-duplicated long document paid a quadratic rebuild. Kept
    # positions are sequence(0, n-1) MINUS the removed set: array_except
    # builds one hash set over the removed positions and streams the
    # sequence through it (O(n + |removed|)), preserving the first
    # array's (ascending) order, then one O(1) element_at per survivor.
    # sequence(0, -1) would DESCEND for empty docs, hence the size guard.
    toks = F.col("_toks")
    kept = F.when(F.size(toks) > 0, F.array_except(
        F.sequence(F.lit(0), F.size(toks) - 1), rm
    )).otherwise(F.array().cast("array<int>"))
    result = (
        staged.join(removed, "id", "left")
        .select(
            "id",
            F.size("_toks").cast("int").alias("n_tokens"),
            F.size(rm).cast("int").alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(kept, lambda i: F.element_at(toks, i + 1)),
            ).alias("clean_text"),
        )
    )
    return register_intermediates(result, staged)


def duplicate_span_extents(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """VARIABLE-LENGTH duplicate spans — the maximal-span merge Lee et
    al. 2021's ExactSubstr actually emits (``duplicate_spans`` counts
    fixed k-token windows; this fuses adjacent/overlapping duplicated
    windows into maximal spans and reports their extents).  A run of
    duplicated window positions p_1 < ... < p_m in one document merges
    while each window's token range touches or overlaps the run's
    coverage (p_{j+1} <= p_j + k: coverage [s, e+k-1] meets
    [p, p+k-1] iff p <= e+k); the merged span covers tokens
    [s, e+k-1] — exactly the union the paper's suffix array reports as
    one variable-length match, recovered from fixed windows without
    global offsets.

    -> (id, span_start, span_len): one row per maximal duplicated span;
    span_start is the 0-based token position, span_len the token count
    (always >= k).  Documents with no duplicated window produce no rows.

    100 TB shape: duplicate_spans' plan — one stride-1 window explode
    carrying an 8-byte span hash, one count-distinct hash aggregation,
    one join back — plus a per-document sorted position list (bounded
    by the document's own token count, the same bound the removal
    path's position sets already carry) folded ROW-LOCALLY into
    segments: no window function over the corpus, no pairwise work,
    no Python.  The oracle twin re-derives the merge with a
    gaps-and-islands window CTE — two independent formulations of the
    same semantics.

    ``portable=True`` swaps xxhash64 for the md5 60-bit lane the DuckDB
    oracle computes bit-identically (hash60_portable).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # shared ExactSubstr prologue (tokenizes exactly as duplicate_spans);
    # the cache feeds the repeated-window aggregate and the position join
    staged = _staged_span_hashes(df, k, text_col, id_col, portable)
    e = staged.select("id", F.posexplode("_h").alias("i", "h"))
    repeated = (
        e.groupBy("h")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    positions = (
        e.join(repeated, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("i")).alias("_ps"))
    )
    # row-local segment fold over the sorted positions: extend the last
    # run while the next window touches its coverage, else open a new one
    segs = F.aggregate(
        F.col("_ps"),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0)
            & (p <= F.element_at(acc, -1)["e"] + k),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["s"].alias("s"),
                    p.cast("int").alias("e"),
                )),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(
                p.cast("int").alias("s"), p.cast("int").alias("e"),
            )))
        ),
    )
    result = (
        positions.select("id", F.explode(segs).alias("sp"))
        .select(
            "id",
            F.col("sp.s").cast("int").alias("span_start"),
            (F.col("sp.e") + k - F.col("sp.s")).cast("int").alias("span_len"),
        )
    )
    return register_intermediates(result, staged)


def cluster_best_keep(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Quality-aware survivor selection — the stage after clustering:
    real pipelines do NOT keep the smallest-id member of a near-dup
    cluster, they keep the BEST copy (longest / highest quality score;
    Dolma and RefinedWeb both select the representative by a quality
    signal). Resolves ``pairs`` into connected components
    (dedup_clusters) and picks, per cluster, the member maximizing
    ``quality_col`` (ties break to the smallest id — deterministic).

    Documents in no pair form singleton clusters of themselves, so the
    output enumerates EVERY cluster: -> (canonical_id, n_members,
    keep_id, keep_quality). The keep-list is the keep_id column; the
    drop-list is members minus keepers.

    100 TB shape: dedup_clusters' O(log diameter) rounds over the edge
    list, then ONE broadcast-or-shuffle join of the (id, canonical)
    labels onto the corpus — labels number |V(pairs)|, far smaller than
    the corpus — and ONE hash aggregation per cluster. The argmax is an
    aggregation buffer (max over a (quality, -id) struct), never a
    sort or a window over the corpus.
    """
    clusters = dedup_clusters(
        pairs, max_iter=max_iter, checkpoint_dir=checkpoint_dir
    )
    member = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(quality_col).alias("q"),
        )
        .join(clusters, "id", "left")
        .select(
            "id", "q",
            F.coalesce("canonical_id", F.col("id")).alias("canonical_id"),
        )
    )
    # lexicographic argmax(quality, then smallest id) as TWO hash
    # aggregations instead of one max-of-struct (whose struct buffer
    # forces SortAggregate — a full sort of the member set): level 1
    # groups by (cluster, quality) and keeps the min id, making the
    # quality values UNIQUE per cluster, so level 2's max_by(mid, q) is
    # deterministic and runs on a primitive (long, long) buffer —
    # HashAggregate end to end, and the second shuffle carries only
    # distinct (cluster, quality) rows. Edge semantics match the struct
    # max: grouping normalizes NaN (one group) and max_by treats NaN as
    # greatest; null qualities lose to any non-null one (max_by ignores
    # null orderings), and an all-null-quality cluster falls back to the
    # smallest id via the coalesce, exactly like the old struct compare.
    grp = member.groupBy("canonical_id", "q").agg(
        F.min("id").alias("mid"),
        F.count(F.lit(1)).alias("c"),
    )
    return grp.groupBy("canonical_id").agg(
        F.sum("c").cast("int").alias("n_members"),
        F.coalesce(F.max_by("mid", "q"), F.min("mid")).alias("keep_id"),
        F.max("q").alias("keep_quality"),
    )
