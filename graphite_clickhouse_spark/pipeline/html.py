r"""HTML boilerplate stripping — the text-extraction stage every
web-crawl training pipeline runs before any quality/dedup work (C4,
CCNet, RefinedWeb and Dolma all start from an HTML→text extractor;
this is the regex-chain "lite" form of that stage, the same scope as
W3C text/plain conversion: drop non-content containers, drop markup,
decode the entity subset that appears in running text, normalize
whitespace).

Spark-first: the whole extraction is a fixed chain of
`regexp_replace` expressions — JVM-side, whole-stage codegen, zero
UDF, embarrassingly parallel (row-local, no shuffle). Every pattern
is chosen to mean the same thing in Java regex (Spark) and RE2 (the
DuckDB oracle): inline flags `(?is)`, non-greedy `.*?`, ASCII
character classes, `\b` word boundaries — no lookaround, no
backreferences in patterns.

Extraction order (each step feeds the next):

  1. `<script ...>...</script>` and `<style ...>...</style>` removed
     WITH their content (non-content containers; removed before the
     comment pass so a `<!--` inside inline JS cannot swallow markup);
  2. HTML comments `<!-- ... -->` removed with their content (tags
     inside a comment go with it);
  3. every remaining tag `<...>` becomes a single SPACE (so
     `a</td><td>b` keeps its word boundary — jusText/trafilatura do
     the same before whitespace normalization);
  4. the running-text entity subset is decoded: `&lt; &gt; &quot;
     &#39; &apos; &nbsp;` first and `&amp;` strictly LAST (single-pass
     decode: `&amp;lt;` must yield the literal text `&lt;`, not `<`);
  5. whitespace collapses to single spaces and the result is trimmed
     (Java's ASCII `\s` set spelled out — see text.WS_CHARS for the
     three-engine divergence this avoids).

Unterminated `<script>`/`<style>`/comments keep their text (the
non-greedy body never matches without its closer); their tags still
fall to step 3. That is the documented truncated-page behavior, not
an error path.

Reference scope note: graphite-clickhouse has no HTML surface — this
module is part of the training-data-pipeline extension the build
brief adds as first-class (like pipeline/urls.py and
pipeline/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WS_RE

#: entity → replacement, decode order significant (`&amp;` LAST)
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(col: Column) -> Column:
    """Strip HTML to running text (pure expressions; see module doc).

    tests/test_pipeline.py pins the Spark output against the DuckDB
    twin on hostile inputs (differential fuzz, the canonical_url
    pattern)."""
    # 1. non-content containers, content and all
    u = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script[^>]*>", "")
    u = F.regexp_replace(u, r"(?is)<style\b[^>]*>.*?</style[^>]*>", "")
    # 2. comments
    u = F.regexp_replace(u, r"(?s)<!--.*?-->", "")
    # 3. remaining tags -> one space ([^>]* spans newlines by itself —
    # no dot, so no flag needed)
    u = F.regexp_replace(u, r"</?[A-Za-z!][^>]*>", " ")
    # 4. running-text entities, &amp; last
    for ent, rep in ENTITIES:
        u = F.regexp_replace(u, ent, rep)
    # 5. whitespace normalization
    return F.trim(F.regexp_replace(u, WS_RE, " "))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document HTML→text extraction: -> (id, clean_text,
    n_chars_raw, n_chars_clean, text_ratio) where text_ratio =
    clean/raw length rounded to 6 dp (the boilerplate-density signal
    crawl pipelines threshold on — markup-heavy pages score low).

    100 TB shape: row-local expression chain — no shuffle, no UDF, no
    join; the scan's only cost is the regex passes, all inside one
    whole-stage-codegen span. NULL html yields ('', 0, 0, 0.0) rather
    than a NULL row, so downstream filters see every document."""
    raw = F.coalesce(F.col(html_col), F.lit(""))
    clean = html_to_text(raw)
    n_raw = F.length(raw)
    return df.select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        n_raw.cast("int").alias("n_chars_raw"),
        F.length(clean).cast("int").alias("n_chars_clean"),
        F.round(
            F.when(n_raw > 0, F.length(clean) / n_raw).otherwise(F.lit(0.0)),
            6,
        ).alias("text_ratio"),
    )
