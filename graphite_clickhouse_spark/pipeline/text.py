"""Text analysis operators for large-scale training-data pipelines.

Hot paths are built-in `pyspark.sql.functions` (JVM-side, whole-stage
codegen); the one exception is the n-gram statistics kernel, which is an
Arrow-batched Counter pass because the expression-tree formulation is a
measured recomputation trap (see _gram_stats_kernel). Each operator is
oracle-checkable in DuckDB (same computation in ANSI-ish SQL).

Operators:
- token_count        whitespace tokenization count
- bpe_ish_tokens     BPE-like regex token count (words / digits / punct runs)
- quality_score      length / punctuation / stopword-ratio heuristics
- lang_id            n-gram/stopword-hit language heuristic
- fingerprint        md5 document fingerprint + simhash-style rolling hash
- tfidf_top_terms    per-doc top-k TF-IDF terms
- repetition_stats   Gopher repetition signals (top/dup n-gram fractions)
- gopher_quality_filter  Gopher-rule keep/drop document filter
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the heuristic language id —
#: deterministic and cheap; a real pipeline would plug fastText here.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}

#: Java's ASCII \s set, spelled out. The three regex engines this
#: repo's oracles span DISAGREE about \s: Java regex (Spark) matches
#: [ \t\n\x0B\f\r], RE2 (DuckDB) lacks \x0B, and Python re adds every
#: Unicode space (NBSP and friends). Spelling out Java's exact set keeps
#: Spark behavior identical while making the DuckDB oracles and the
#: Python reference kernels agree on vertical-tab / NBSP text (r7
#: finding — verified: RE2 leaves 'a\x0bb' intact under \s+, Python
#: collapses NBSP under \s+).
WS_CHARS = r" \t\n\x0B\f\r"
WS_RE = "[" + WS_CHARS + "]+"

#: target candidate-pair rows per partition of winnow_overlap_pairs'
#: pair-count aggregation.  250k pairs build a ~25 MB hash map — inside
#: the per-task managed-memory budget even at a 2 GiB / 32-thread heap
#: (SPILL.md's constraint probe), so the exchange widens with the
#: measured pair volume instead of spilling at a fixed session width.
PAIRS_PER_PARTITION = 250_000

#: BPE-ish pre-tokenizer: word pieces, digit runs, punctuation singles --
#: the GPT-2 style pre-split shape, minus unicode categories.
BPE_ISH_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9" + WS_CHARS + "]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty-string input -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS_RE)
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_REGEX), F.lit(0)))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of `lang`."""
    toks = tokens(F.lower(text))
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: char/token counts, alpha & punct
    ratios, stopword ratio, mean token length."""
    text = F.col(text_col)
    n_tokens = token_count(text)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(text, "[A-Za-z0-9" + WS_CHARS + "]", ""))
    sw = stopword_hits(text)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (alpha_chars / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (punct_chars / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (sw / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language id: argmax of per-language stopword hits
    (deterministic tie-break: lexicographically largest language name;
    'und' when no stopword of any language occurs)."""
    text = F.col(text_col)
    scores = [
        F.struct(stopword_hits(text, lang).alias("hits"), F.lit(lang).alias("lang"))
        for lang in sorted(STOPWORDS)
    ]
    best = F.greatest(*scores)
    return df.select(
        F.col(id_col),
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        best.getField("hits").alias("lang_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprints: md5 of the raw text plus a
    normalized md5 (lowercased, whitespace collapsed) for near-identity."""
    text = F.col(text_col)
    normalized = F.regexp_replace(F.lower(F.trim(text)), WS_RE, " ")
    return df.select(
        F.col(id_col),
        F.md5(text).alias("fp_raw"),
        F.md5(normalized).alias("fp_norm"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k TF-IDF terms over lowercased whitespace tokens.

    tf = raw term count in the document; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed sklearn formulation, so unseen-term idf stays finite);
    score = tf * idf. Ranking is (rounded score desc, term asc) — rounding
    to 9 dp absorbs last-ulp ln() differences across engines so the top-k
    cut is deterministic and oracle-comparable.

    Scale shape: one explode pass; tf and df are two aggregations of the
    same term-keyed frame (the df join shuffles on term, the vocabulary
    key — no driver-side vocabulary, no collect besides the N count).
    """
    from pyspark.sql import Window

    n_docs = docs.count()
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.col("tf") * (
        F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(score, 9).desc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .withColumn("score", F.round(score, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )




def _gram_stats_kernel(ns: tuple[int, ...]):
    """Arrow-batched per-doc n-gram statistics: for each n in `ns`,
    (total grams, top count, distinct count) via one Counter pass.

    Expression-tree formulations of this (sorted-array folds) are the
    measured recomputation trap: CollapseProject inlines the gram
    construction into every referencing expression and the fold is
    interpreted per element — 59 s for gopher_filter at sf0.1, still
    7 s with an explode-of-one Generate barrier forcing single
    evaluation. This kernel (the same Arrow escape hatch the dedup
    family uses) does it in 0.9 s."""
    import pandas as pd

    fields = ", ".join(
        f"total{n} int, best{n} int, distinct{n} int" for n in ns
    )

    def kern(tok_arrays):
        from collections import Counter

        cols: dict[str, list] = {}
        for n in ns:
            cols[f"total{n}"] = []
            cols[f"best{n}"] = []
            cols[f"distinct{n}"] = []
        for toks in tok_arrays:
            toks = list(toks) if toks is not None else []
            for n in ns:
                if len(toks) >= n:
                    grams = [
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    ]
                    c = Counter(grams)
                    cols[f"total{n}"].append(len(grams))
                    cols[f"best{n}"].append(max(c.values()))
                    cols[f"distinct{n}"].append(len(c))
                else:
                    cols[f"total{n}"].append(0)
                    cols[f"best{n}"].append(0)
                    cols[f"distinct{n}"].append(0)
        return pd.DataFrame(cols)

    return F.pandas_udf(kern, fields)


def repetition_stats(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, 'Scaling
    Language Models', appendix A1.1 — public) per document:

    - top_ngram_frac: fraction of n-gram occurrences taken by the single
      most frequent n-gram (boilerplate/templating detector)
    - dup_ngram_frac: fraction of n-gram occurrences that repeat an
      earlier occurrence

    One Arrow-batched Counter pass per partition (no explode-per-gram,
    no aggregation shuffle — the repartition only spreads a few-file
    corpus across cores; at 100 TB the file count already does)."""
    from graphite_clickhouse_spark.pipeline.dedup import tokens_projection

    base = tokens_projection(df, text_col, id_col).select(
        "id", F.filter(F.col("toks"), lambda t: t != "").alias("toks")
    )
    st = _gram_stats_kernel((n,))(F.col("toks")).alias("st")
    base = base.select("id", st)
    total = F.col(f"st.total{n}")
    return base.select(
        "id",
        total.alias("n_grams"),
        F.when(total > 0, F.col(f"st.best{n}") / total)
        .otherwise(F.lit(0.0)).cast("double").alias("top_ngram_frac"),
        F.when(total > 0, (total - F.col(f"st.distinct{n}")) / total)
        .otherwise(F.lit(0.0)).cast("double").alias("dup_ngram_frac"),
    )


def gopher_quality_filter(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_top_2gram_frac: float = 0.20,
    max_dup_3gram_frac: float = 0.18,
    min_stopword_ratio: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-rule document filter (Rae et al. 2021 A1.1 thresholds,
    C4/MassiveText-style): word-count bounds, mean-word-length band,
    top-2-gram and duplicate-3-gram caps, minimum stopword ratio.

    -> (id, n_words, mean_word_len, top_2gram_frac, dup_3gram_frac,
        stopword_ratio, keep). Word stats stay JVM expressions over the
    hoisted token array; both n-gram stats come from ONE Arrow Counter
    pass (ns=(2,3)); composes with exact/MinHash dedup on the same scan
    at 100 TB.
    """
    from graphite_clickhouse_spark.pipeline.dedup import tokens_projection

    base = tokens_projection(df, text_col, id_col).select(
        "id", F.filter(F.col("toks"), lambda t: t != "").alias("toks")
    )
    base = base.select(
        "id", "toks", _gram_stats_kernel((2, 3))(F.col("toks")).alias("st")
    )
    toks = F.col("toks")
    n_words = F.size(toks)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        / n_words,
    ).otherwise(F.lit(0.0))
    top2 = F.when(
        F.col("st.total2") > 0, F.col("st.best2") / F.col("st.total2")
    ).otherwise(F.lit(0.0))
    dup3 = F.when(
        F.col("st.total3") > 0,
        (F.col("st.total3") - F.col("st.distinct3")) / F.col("st.total3"),
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for lst in STOPWORDS.values() for w in lst])
    sw_hits = F.size(
        F.filter(F.transform(toks, F.lower), lambda t: F.array_contains(sw, t))
    )
    sw_ratio = F.when(n_words > 0, sw_hits / n_words).otherwise(F.lit(0.0))
    keep = (
        n_words.between(min_words, max_words)
        & mean_len.between(min_mean_word_len, max_mean_word_len)
        & (top2 <= max_top_2gram_frac)
        & (dup3 <= max_dup_3gram_frac)
        & (sw_ratio >= min_stopword_ratio)
    )
    return base.select(
        F.col("id"),
        n_words.alias("n_words"),
        mean_len.cast("double").alias("mean_word_len"),
        top2.cast("double").alias("top_2gram_frac"),
        dup3.cast("double").alias("dup_3gram_frac"),
        sw_ratio.cast("double").alias("stopword_ratio"),
        keep.alias("keep"),
    )


def clean_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Text normalization — the C4/RefinedWeb cleaning stage as pure
    expressions: strip C0/C1 control characters (tab and newline
    normalize with the rest of the whitespace), collapse whitespace runs
    to single spaces, trim. Returns (id, clean, n_removed) where
    n_removed is the character-count delta — the cheap signal for
    flagging documents that were mostly control garbage.

    Everything is JVM regexp_replace (two passes over the string, no
    UDF); at 100 TB this runs inside the scan projection.
    """
    raw = F.col(text_col)
    # \p{Cc} = Unicode control category (C0 + C1), same class DuckDB's
    # RE2 exposes — keeps the oracle bit-identical
    no_ctl = F.regexp_replace(raw, r"\p{Cc}", " ")
    collapsed = F.trim(F.regexp_replace(no_ctl, WS_RE, " "))
    return df.select(
        F.col(id_col),
        collapsed.alias("clean"),
        (F.length(raw) - F.length(collapsed)).alias("n_removed"),
    )


def normalize_for_dedup(text: Column) -> Column:
    """CCNet-style dedup-key normalization (Wenzek et al. 2020 — their
    dedup hashes a lowercased, digit-squashed, punctuation-stripped
    copy of each paragraph so trivial re-renderings collapse): fold
    case, squash every digit run's characters to '0' (prices, dates,
    counters — the classic near-identical-page variation), strip
    everything that is not [a-z0] or ASCII whitespace, collapse
    whitespace runs, trim. Pure JVM regexp chain in the scan
    projection — no UDF, no shuffle.

    Deliberate divergences from CCNet's Python reference, documented
    for the oracle's sake: accents are STRIPPED WITH their letters
    (removal, not unidecode folding — no portable accent folding
    exists across Spark/DuckDB), and the whitespace class is Java's
    ASCII \\s spelled out (WS_CHARS) so Spark, DuckDB RE2, and the
    Python twins agree byte-for-byte (the r7 vertical-tab finding)."""
    lowered = F.lower(text)
    digits0 = F.regexp_replace(lowered, "[0-9]", "0")
    stripped = F.regexp_replace(digits0, "[^a-z0" + WS_CHARS + "]", "")
    return F.trim(F.regexp_replace(stripped, WS_RE, " "))


def winnow_fingerprints(
    df,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram of the
    whitespace-normalized lowercased text, then in each window of
    `window` consecutive hashes select the minimum. The fingerprint SET
    is position-free, so the paper's rightmost-tie rule (which only
    affects recorded positions) collapses to a plain window min. Any
    match of length >= k + window - 1 between two documents is
    guaranteed to share a fingerprint, with ~2/(window+1) of positions
    selected.

    Expression-only: one transform builds the hash array, one transform
    + aggregate picks window minima, array_distinct dedups — no
    shuffle at all until the caller aggregates. Returns
    (id, n_grams, fingerprints array<bigint> sorted distinct); short
    documents (< window k-grams) keep all their gram hashes, so every
    non-empty document fingerprints.

    `portable=True` swaps xxhash64 for the md5-derived 60-bit lane both
    Spark and DuckDB compute identically (the oracle mode; xxhash64 is
    the production default).
    """
    from pyspark.sql import functions as F

    from ..pipeline.dedup import hash60_portable

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), WS_RE, " ")
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(0))

    # hoist the normalized text through a projection barrier so the
    # hash lambda does not re-normalize per element (CollapseProject),
    # and REPARTITION: a small corpus arrives as one parquet split,
    # which would serialize the CPU-bound per-gram hashing onto one
    # core (same trap tokens_projection documents); at scale the file
    # count already provides the parallelism
    sc = df.sparkSession.sparkContext
    parts = max(df.rdd.getNumPartitions(), sc.defaultParallelism)
    base = df.repartition(parts).select(
        F.col(id_col).alias("id"), norm.alias("_norm"), n_grams.alias("n_grams")
    )
    nm = F.col("_norm")

    def gh(i):
        sub = nm.substr(i + F.lit(1), F.lit(k))
        return hash60_portable(sub) if portable else F.xxhash64(sub)

    hashes = F.when(
        F.col("n_grams") <= 0, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(F.sequence(F.lit(0), F.col("n_grams") - 1), gh)
    )
    staged = base.select("id", "n_grams", hashes.alias("_h"))
    h = F.col("_h")
    w = window
    # Sliding-window min via a DOUBLING min table (sparse-table trick,
    # r11): m_{2p}[j] = min(m_p[j], m_p[j+p]) level by level, then
    # win[j] = min(m_p[j], m_p[j+w-p]) with p the largest power of two
    # <= w (overlapping windows are harmless for min). The naive
    # aggregate-over-slice fold costs O(n_grams * w) interpreted lambda
    # steps (HOFs are CodegenFallback); the doubling table is
    # O(n_grams * log2(w)) — measured 0.64 s -> 0.43 s at sf0.1 for the
    # k=16/w=8 bench shape, value-identical (plain min per window; the
    # fold's rightmost-tie rule only ever affected positions, which the
    # fingerprint SET drops). Each level lands in its OWN projection so
    # CollapseProject cannot inline a level into the next level's
    # lambda and re-evaluate it per element (the collapse-and-recompute
    # trap tokens_projection documents); levels are guarded total
    # functions of every row — sequence(1, 0) would DESCEND, so short
    # arrays short-circuit to empty instead of indexing element 0.
    def _pair_min(arr, off):
        def f(j):
            return F.least(
                F.element_at(arr, j), F.element_at(arr, j + F.lit(off))
            )
        return f

    def _level(arr, off):
        return F.when(
            F.size(arr) <= off, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - off), _pair_min(arr, off)
            )
        )

    prev, p = "_h", 1
    while p * 2 <= w:
        nxt = f"_m{p * 2}"
        staged = staged.select(
            "id", "n_grams", "_h", _level(F.col(prev), p).alias(nxt)
        )
        prev, p = nxt, p * 2
    mp = F.col(prev)
    win_min = mp if p == w else _level(mp, w - p)
    fps = F.when(
        F.size(h) < w, F.array_sort(F.array_distinct(h))
    ).otherwise(F.array_sort(F.array_distinct(win_min)))
    return staged.select("id", "n_grams", fps.alias("fingerprints"))


def winnow_overlap_pairs(
    df,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
):
    """Substring-level overlap pairs via shared winnowing fingerprints —
    what MOSS does across submissions, and what set-level Jaccard ops
    miss: a short quoted/contained passage barely moves whole-document
    similarity but deterministically shares fingerprints.

    Returns (id_a, id_b, shared, containment) with id_a < id_b,
    shared >= min_shared; containment = shared / min(|fps_a|, |fps_b|)
    (1.0 ~ one document's fingerprinted content is inside the other).

    Scale shape: fingerprints are ~2/(window+1) of gram positions, so
    the exploded (fp, id) stream is a small fraction of corpus text;
    pairs are generated per fingerprint BUCKET (never all-pairs), and
    fingerprints appearing in more than `max_fp_df` documents are
    dropped first — boilerplate n-grams are the skew risk AND carry no
    discriminative signal (the stopword cutoff every winnowing
    deployment applies).  r8 reshape (the one 2 GiB spiller in
    SPILL.md): the fp self-join (two sort-merge sorts over the full
    exploded stream, each spilling under constrained memory) is
    replaced by ONE groupBy(fp) -> sorted collect_list whose buffer is
    bounded by max_fp_df ids (8 KB at the default 1000), followed by a
    STREAMED combination explode (posexplode + slice; whole-stage
    codegen pipelines generator output, so no d^2 array is ever
    resident).  The hot-fp filter is a broadcast ANTI join: the hot set
    (df > max_fp_df) is the small boilerplate vocabulary — at 100 TB it
    is the eval-suite-sized side that must fit under the broadcast
    threshold, while the rare set (which the old shape shuffle-joined)
    is nearly all fingerprints.  Total: 3 shuffles (fp count, fp lists,
    pair count), zero join sorts.  The per-doc totals frame is one row
    per DOCUMENT, so it is NOT broadcast (at billions of docs it
    cannot be); it joins the pair aggregate as a plain shuffle join on
    the pair-participant ids — a set already collapsed by the
    shared >= min_shared filter — and AQE is free to pick a broadcast
    at runtime when the surviving side is small.
    """
    from pyspark.sql import functions as F

    # cache the fingerprinted frame: the per-doc totals, the hot-fp
    # count, and the pair generation all read it — without the cache
    # each consumer re-runs the full (expensive) winnowing expression,
    # the multi-reference recompute trap
    # (at cluster scale: persist to a table instead)
    fps = winnow_fingerprints(
        df, k=k, window=window, text_col=text_col, id_col=id_col,
        portable=portable,
    ).select("id", F.col("fingerprints")).cache()
    counts = fps.select("id", F.size("fingerprints").alias("n_fp"))
    e = fps.select("id", F.explode("fingerprints").alias("fp"))
    # hot fps are counted BEFORE any list is collected so a
    # 1M-document boilerplate fingerprint costs a 16-byte count buffer,
    # never a 1M-element list on one reducer.  The same count aggregate
    # yields the EXACT pair volume (sum of C(df,2) over kept fps) for
    # free — that number sizes the pair-aggregation exchange below.
    # This ONE action materializes both caches (fps feeds counts_fp),
    # so it replaces — not adds to — the old eager fps.count().
    counts_fp = e.groupBy("fp").agg(F.count(F.lit(1)).alias("df_")).cache()
    n_pairs = counts_fp.select(
        F.sum(
            F.when(
                F.col("df_") <= max_fp_df,
                F.col("df_") * (F.col("df_") - 1) / 2,
            )
        ).alias("n")
    ).first()["n"]
    hot = counts_fp.filter(F.col("df_") > max_fp_df).select("fp")
    buckets = (
        e.join(F.broadcast(hot), "fp", "left_anti")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    # sorted ids => id_a < id_b by construction; slice(ids, i+2, ...)
    # is every id after position i (posexplode's i is 0-based, slice is
    # 1-based)
    raw_pairs = (
        buckets.select(
            F.posexplode("ids").alias("i", "id_a"), F.col("ids")
        )
        .select(
            "id_a",
            F.explode(
                F.slice(
                    F.col("ids"), F.col("i") + F.lit(2), F.size("ids")
                )
            ).alias("id_b"),
        )
    )
    # Width the pair aggregation by the measured pair volume, not the
    # session's shuffle width.  Repartitioning on the group keys hoists
    # BOTH aggregation passes behind the exchange (raw pairs stream to
    # the shuffle writer, which holds no per-key state), and each
    # post-exchange hash map sees ~PAIRS_PER_PARTITION entries — a few
    # tens of MB — regardless of corpus size.  Pre-exchange partial
    # aggregation would be pure overhead here anyway: a pair occurs at
    # most once per fingerprint bucket, so map-side combining across
    # buckets hits only by coincidence while its hash map grows with
    # every pair in the task (the 2 GiB spiller in the r7 SPILL.md).
    sc = df.sparkSession.sparkContext
    width = max(
        sc.defaultParallelism, int((n_pairs or 0) // PAIRS_PER_PARTITION) + 1
    )
    pairs = (
        raw_pairs.repartition(width, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    # counts_fp stays cached: `hot` reads it lazily when the caller
    # executes the returned plan (same lifetime convention as `fps`)
    ca = counts.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a"))
    cb = counts.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b"))
    result = (
        pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a", "id_b", "shared",
            F.round(
                F.col("shared") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("containment"),
        )
    )
    # lifecycle: both caches are released after materialization via
    # lifecycle.unpersist_intermediates(result) (r9 review — missed by
    # the r8-VERDICT fix that covered the span/bigram operators)
    from .lifecycle import register_intermediates

    return register_intermediates(result, fps, counts_fp)


#: PII patterns shared by detection and masking. Deliberately limited to
#: constructs that mean the same thing in Java regex (Spark), RE2
#: (DuckDB oracle / ClickHouse), and Python re — character classes,
#: bounded quantifiers, non-capturing alternation; no lookaround or
#: possessive quantifiers, which would diverge across the three engines.
#: The phone pattern's first branch covers the common
#: North-American-style spellings: an optional +CC prefix, then
#: (ddd) ddd-dddd / ddd-ddd(d)-dddd with '-', '.' or ' ' separators.
#: The second branch (r7) covers international group spellings like
#: "+44 20 7946 0958" / "+49-30-12-3456": a mandatory +CC then 2-4
#: separator-led groups of 2-4 digits. Branch order matters and is
#: identical in all three engines (leftmost-first alternation), so the
#: NANP branch wins where both could match at the same start.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": (
        r"(?:\+\d{1,2}[-. ])?(?:\(\d{3}\) ?|\d{3}[-. ])\d{3,4}[-. ]\d{4}"
        r"|\+\d{1,3}(?:[-. ]\d{2,4}){2,4}"
    ),
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Detect and mask PII-shaped spans (emails, phone numbers, IPv4
    addresses) — the standard privacy scrub a pre-training corpus passes
    through before packing, with per-document counts kept for the
    removal audit (the C4/RefinedWeb lineage reports these rates;
    masking with typed placeholders preserves token positions for
    span-sensitive downstream filters).

    -> (id, clean_text, n_emails, n_phones, n_ipv4). Counts and masks
    AGREE by construction: each kind is counted on the text as already
    masked by the previous kinds (email -> phone -> ipv4), so n_<kind>
    is exactly the number of <KIND> placeholders that masking pass
    inserted — an IPv4 inside an email's host part is part of the one
    masked <EMAIL> span and does not also increment n_ipv4 (it counted
    double before r6). Pure JVM expressions, row-local: whole-stage
    codegen, no shuffle, scales with the scan.
    """
    stage = F.col(text_col)
    counts = {}
    for kind, token in (("email", "<EMAIL>"), ("phone", "<PHONE>"),
                        ("ipv4", "<IP>")):
        counts[kind] = F.size(
            F.regexp_extract_all(stage, F.lit(PII_PATTERNS[kind]), F.lit(0))
        )
        stage = F.regexp_replace(stage, PII_PATTERNS[kind], token)
    return df.select(
        F.col(id_col).alias("id"),
        stage.alias("clean_text"),
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ipv4"].alias("n_ipv4"),
    )


def c4_line_filter(
    df: DataFrame,
    min_words: int = 5,
    min_kept_lines: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The C4 line-level cleaning pass (Raffel et al. 2020, §2.2 — the
    rules every C4-lineage corpus applies before any dedup):

    - a line is KEPT iff it ends in a terminal punctuation mark
      (``. ! ? "``), contains at least ``min_words`` words, and does
      not contain the word "javascript" (case-insensitive);
    - the PAGE is kept iff at least ``min_kept_lines`` lines survive,
      the page does not contain the phrase "lorem ipsum"
      (case-insensitive), and does not contain a curly bracket.

    -> (id, n_lines, n_kept_lines, keep_page, clean_text): kept lines
    STRIPPED and rejoined with a newline (C4 emits ``line.strip()``, so
    the output lines are stripped too; independent of keep_page, so
    callers can audit what the filter WOULD keep on dropped pages).
    NULL/empty text yields (0, 0, false, '').

    Fidelity notes (r9 ADVICE): the word count splits on the full ASCII
    whitespace class (C4 uses Python ``line.split()``, which splits on
    ANY whitespace run — a tab-separated line is many words, not one),
    and both the predicate and the emitted lines use a full
    ASCII-whitespace strip, not a space-only trim (a CRLF page's
    ``"foo.\\r"`` line is C4-kept).  Python's str.split/strip
    additionally treat some Unicode spaces as whitespace; the explicit
    ASCII class is the deliberate, cross-engine-exact subset.

    100 TB shape: one row-local array filter inside the scan projection
    — split, per-line predicate (regexp + word count), rejoin.  No
    shuffle, no UDF, no join: whole-stage codegen end to end, scales
    with the scan like clean_text/pii_scrub.
    """
    t = F.col(text_col)
    lines = F.when(
        t.isNull() | (t == ""), F.array().cast("array<string>")
    ).otherwise(F.split(t, "\n"))

    # ASCII whitespace class, written as regex escapes so the same
    # pattern means the same thing in Java (Spark) and RE2 (DuckDB)
    ws = r"[ \t\r\n\x0B\f]"

    def _strip(line):
        # \A/\z anchors, not ^/$ (see the rlike note below)
        return F.regexp_replace(line, rf"\A{ws}+|{ws}+\z", "")

    def _keep(line):
        s = _strip(line)
        n_words = F.size(F.filter(F.split(s, ws + "+"), lambda w: w != ""))
        # \z, not $: Java's '$' also matches BEFORE a trailing line
        # terminator (\r,  , ...), RE2's '$' does not — a CRLF
        # document split on \n leaves lines ending in \r, which '$'
        # would keep in Spark and drop in the DuckDB oracle (the
        # canonical_url \z lesson; differential-fuzz pinned)
        return (
            s.rlike('[.!?"]\\z')
            & (F.instr(F.lower(s), "javascript") == 0)
            & (n_words >= min_words)
        )

    kept = F.transform(F.filter(lines, _keep), _strip)
    lorem = F.instr(F.lower(t), "lorem ipsum") > 0
    curly = F.instr(t, "{") > 0
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        (
            (F.size(kept) >= min_kept_lines)
            & ~F.coalesce(lorem, F.lit(False))
            & ~F.coalesce(curly, F.lit(False))
        ).alias("keep_page"),
        F.concat_ws("\n", kept).alias("clean_text"),
    )
