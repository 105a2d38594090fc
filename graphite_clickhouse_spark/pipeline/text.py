"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator is oracle-checkable
in DuckDB (same computation in ANSI-ish SQL).

Operators:
- token_count      whitespace tokenization count
- bpe_ish_tokens   BPE-like regex token count (words / digits / punct runs)
- quality_score    length / punctuation / stopword-ratio heuristics
- lang_id          n-gram/stopword-hit language heuristic
- fingerprint      md5 document fingerprint + simhash-style rolling hash
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

#: BPE-ish pre-tokenizer: word pieces, digit runs, punctuation singles —
#: the GPT-2 style pre-split shape, minus unicode categories.
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty-string input -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
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
    punct_chars = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
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
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(text).alias("fp_raw"),
        F.md5(normalized).alias("fp_norm"),
    )
