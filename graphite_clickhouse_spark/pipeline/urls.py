"""URL canonicalization + URL-level dedup — the keep-first-per-URL
stage every web-crawl training pipeline runs before content dedup
(CCNet/C4/Dolma all dedup by canonical URL: the same page is fetched
many times across snapshots with tracking query params, scheme/host
case noise, fragments, and trailing-slash variants).

Spark-first: canonicalization is a fixed chain of `regexp_replace` /
`lower` expressions (JVM-side, whole-stage codegen, zero UDF), chosen
to mean the same thing in Java regex (Spark) and RE2 (the DuckDB
oracle / ClickHouse) — character classes and bounded alternation only,
no lookaround. Dedup is one hash aggregation on the canonical string
(or its xxhash64 at 100 TB — same plan shape, narrower shuffle).

The canonical form (the common subset of the published pipelines):

  1. drop the fragment (`#...`);
  2. lowercase the scheme and host (path/query case is significant);
  3. fold `https` to `http` (snapshot-crawl dedup treats them as one
     resource) and strip a leading `www.`;
  4. strip explicit default ports (`:80` / `:443`);
  5. remove tracking parameters (`utm_*`, `fbclid`, `gclid`,
     `msclkid`, `ref`, `referrer`) wherever they sit in the query;
  6. tidy separators the removals leave behind (`?&` -> `?`,
     `&&` -> `&`, trailing `?`/`&`);
  7. drop one trailing slash from a non-root path, and the bare root
     slash itself.

Scheme-less strings (no '://') can't distinguish host from path, so
only the fragment/tracking rules (1, 5, 6) apply to them.

Reference scope note: graphite-clickhouse has no URL surface — this
module is part of the training-data-pipeline extension the build brief
adds as first-class (like pipeline/dedup.py and pipeline/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking parameters removed during canonicalization (step 5)
TRACKING_PARAMS = r"(?:utm_[a-z]+|fbclid|gclid|msclkid|ref|referrer)"


def canonical_url(col: Column) -> Column:
    """Canonicalize a URL column (pure expressions; see module doc).

    Every regex below is Java/RE2-portable; tests/test_pipeline.py pins
    the Spark output against the DuckDB twin on hostile inputs."""
    # 1. fragment — (?s) so a fragment containing newlines is removed to
    # the true end of the string; bare '$' would also diverge across
    # engines on trailing newlines (Java '$' matches BEFORE a final \n,
    # RE2 '$' is end-of-text), which is why every end anchor in this
    # chain is \z or (?s).*
    u = F.regexp_replace(col, r"(?s)#.*", "")
    # 2-4. scheme://host[:port] head: lowercase, https->http, strip
    # www. and default ports.  Lowercasing only the head keeps path
    # and query case significant, so split head/tail first.
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1))
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    head = F.regexp_replace(head, r"^https:", "http:")
    head = F.regexp_replace(head, r"^(http://)www\.", "$1")
    head = F.regexp_replace(head, r":(?:80|443)\z", "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    # 5+6. tracking params, exactly (no lookaround, Java/RE2-portable):
    # (a) '&param=...' anywhere — removal keeps the query well-formed;
    # (b) a LEADING '?param=...&' hands '?' to its successor;
    # (c) a sole '?param=...' drops with its '?'.
    u = F.regexp_replace(u, r"&" + TRACKING_PARAMS + r"=[^&#]*", "")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&#]*\z", "")
    # 7. trailing slash: non-root path ('/a/b/' -> '/a/b') and the bare
    # root ('http://h/' == 'http://h', RFC 3986 §6.2.3)
    u = F.regexp_replace(u, r"(://[^/?]+/[^?]*[^/?])/(\?|\z)", "$1$2")
    u = F.regexp_replace(u, r"(://[^/?]+)/(\?|\z)", "$1$2")
    return u


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-first-per-canonical-URL: -> (canonical_url, n_dups,
    keep_id) with one row per canonical URL, `keep_id` = the smallest
    document id claiming it (deterministic winner — crawl pipelines
    keep the earliest snapshot), `n_dups` = how many documents
    collapsed into it.

    100 TB shape: ONE hash aggregation keyed on the canonical string —
    map-side partial aggregation collapses per-task duplicates before
    the exchange, and URL cardinality is ~documents, so the shuffle is
    bounded by the table itself. No join, no window. Swap the group
    key for xxhash64(canonical) to shrink shuffle width when URLs are
    long; the plan shape is unchanged."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            canonical_url(F.col(url_col)).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_dups"),
            F.min("id").alias("keep_id"),
        )
    )


def url_domain(col: Column) -> Column:
    """Registered-host extraction for grouping: the URL's authority host,
    lowercased, userinfo/port stripped, leading ``www.`` folded.  (Full
    public-suffix-list eTLD+1 resolution is a lookup table the caller
    can join on top; the host is the stable, dependency-free key and is
    what FineWeb's per-domain accounting actually buckets on first.)"""
    host = F.regexp_extract(
        F.lower(col), r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )
    return F.regexp_replace(host, r"^www\.", "")


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    weight_col: str | None = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain corpus accounting — the aggregation behind every
    domain-level curation decision (FineWeb's per-domain filtering and
    the Dolma/RefinedWeb source audits): how many documents and how
    much text each domain contributes, so over-represented or junk
    domains can be capped or cut.

    -> (domain, n_docs, total_weight, mean_weight) — mean rounded to
    6 dp for cross-engine hash equality; with ``weight_col=None`` the
    weight columns are document counts only.

    100 TB shape: ONE hash aggregation keyed on the extracted domain
    (pure JVM regexp inside the scan projection — no UDF, no join);
    domain cardinality is tiny relative to documents, so the exchange
    carries one partial row per (task, domain).
    """
    d = df.select(
        url_domain(F.col(url_col)).alias("domain"),
        (F.col(weight_col) if weight_col else F.lit(1)).alias("w"),
    )
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("w").cast("long").alias("total_weight"),
        F.round(F.avg("w"), 6).alias("mean_weight"),
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    key_col: str = "doc_id",
    salt: str = "",
    num_buckets: int = 16,
    domain_col: str | None = None,
    broadcast_thresholds: bool = True,
) -> DataFrame:
    """Per-domain document cap — keep at most ``cap`` documents per
    domain, DETERMINISTICALLY (the FineWeb/Dolma follow-up to the
    `domain_stats` audit: collapse over-represented domains before
    training instead of letting one SEO farm dominate the mixture).

    Which documents survive is a pure function of (salt, key): documents
    rank within their domain by the consistent sampling coin
    hash60(salt:key) (pipeline/sampling.sample_hash — same coin as
    deterministic_sample, so the choice is reproducible across runs,
    cluster sizes, and engines), tie-broken by the raw key value (any
    orderable type — string/UUID ids work; a 60-bit coin collision
    within one domain is the only case the tie-break decides). The
    ``cap`` smallest (coin, key) pairs per domain survive.

    NULL-domain rows (NULL url) form their OWN capped group — they are
    capped like any domain, never silently dropped (the threshold join
    is null-safe); malformed non-URL strings all map to the
    empty-string domain and share one cap, which is usually the right
    quarantine behavior — pre-filter if not.

    -> the input rows that survive, plus a ``domain`` column when the
    domain was derived from ``url_col`` (with ``domain_col`` the
    caller already has the column; nothing is added). Raises if the
    input already has a ``domain`` column that isn't the one requested.

    100 TB shape — EXACT selection with NO window over the corpus (a
    window partitioned by domain serializes each mega-domain into one
    task, the classic skew cliff):

      1. salted candidate agg: group by (domain, coin % num_buckets),
         keep each group's ``cap`` smallest rank keys
         (slice(array_sort(collect_list))) — a mega-domain spreads over
         ``num_buckets`` parallel groups;
      2. threshold agg: per domain, the cap-th smallest key across the
         <= num_buckets * cap candidates (a true global top-cap key is
         in the top cap of its own bucket — pigeonhole, so this is
         exact, not approximate);
      3. one broadcast join of the tiny (domain, threshold) table back
         onto the scan + a row-local filter (rank_key <= threshold).

    Memory bound: step 1 buffers one (domain, bucket) group at a time
    (collect_list materializes before the slice), so size
    ``num_buckets`` to ~ largest-expected-domain / 10^6 rows. The
    threshold table has one row per domain; with millions of domains it
    is a few tens of MB — broadcastable. Pass
    ``broadcast_thresholds=False`` to shuffle-join instead if the
    domain cardinality ever outgrows the broadcast budget.
    """
    from .sampling import sample_hash

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if domain_col is None and "domain" in df.columns:
        raise ValueError(
            "input already has a 'domain' column — pass "
            "domain_col='domain' to cap on it, or rename it"
        )
    dom = F.col(domain_col) if domain_col else url_domain(F.col(url_col))
    # internal aliases so a caller-supplied domain column never collides
    base = df.withColumn("__domain", dom).withColumn(
        "__coin", sample_hash(F.col(key_col), salt)
    )
    # raw key as tie-break: casting to long would NULL out string ids
    # and drop the boundary row (struct comparison on NULL -> NULL)
    rank_key = F.struct(
        F.col("__coin").alias("h"), F.col(key_col).alias("k")
    )
    cand = base.groupBy(
        F.col("__domain").alias("__d"),
        F.pmod(F.col("__coin"), F.lit(num_buckets)).alias("__b"),
    ).agg(F.slice(F.array_sort(F.collect_list(rank_key)), 1, cap).alias("__cand"))
    thr = (
        cand.groupBy("__d")
        .agg(F.array_sort(F.flatten(F.collect_list("__cand"))).alias("__all"))
        .select(
            "__d",
            F.element_at(
                "__all", F.least(F.size("__all"), F.lit(cap))
            ).alias("__thr"),
        )
    )
    if broadcast_thresholds:
        thr = F.broadcast(thr)
    out = (
        # null-safe: NULL-domain rows must be CAPPED, not dropped
        base.join(thr, base["__domain"].eqNullSafe(thr["__d"]))
        .filter(rank_key <= F.col("__thr"))
        .drop("__d", "__thr", "__coin")
    )
    if domain_col is None:
        return out.withColumnRenamed("__domain", "domain")
    return out.drop("__domain")
