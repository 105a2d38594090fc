"""Deterministic sampling and source mixing for training-data pipelines.

Random sampling (df.sample) is the wrong tool at 100 TB: results change
with partitioning, retries re-draw, and no other engine can reproduce
the draw. CONSISTENT HASH sampling fixes all three — a document is kept
iff hash(salt:key) falls under the rate threshold, so the decision is a
pure function of the key: stable across runs, cluster sizes, engines
(the md5-derived hash60 both Spark and DuckDB compute bit-identically,
pipeline/dedup.hash60_portable), and monotone in the rate (a 10% sample
is a subset of the 20% sample with the same salt — the property that
makes staged data ablations comparable).

`mix_sources` applies per-source rates — the training-mixture knob
(upsample small high-quality sources, downsample crawl) — as one scan
with a broadcast-free CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60_portable

#: hash60 yields 60-bit values; rates map to a threshold in [0, 2^60]
_HASH_SPACE = 1 << 60


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform 60-bit hash of (salt, key) — the sampling coin."""
    return hash60_portable(
        F.concat(F.lit(f"{salt}:"), key.cast("string"))
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep each row iff hash(salt:key) < rate * 2^60 — a consistent
    ~rate-fraction sample, reproducible anywhere."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _HASH_SPACE)
    return df.filter(sample_hash(F.col(key_col), salt) < F.lit(threshold))


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-source consistent sampling rates in ONE scan: a source's rate
    becomes its hash threshold via a CASE chain (sources not listed get
    `default_rate`). Rates are capped at 1.0 — upsampling beyond 1x is an
    epoch-repetition concern, not a filter's.

    Thresholds are computed as exact INTEGERS on the driver (int(rate *
    2^60)) and embedded as literals: double->long casts round differently
    across engines (Spark truncates, DuckDB rounds half-even), so no
    float arithmetic may reach the comparison."""
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold_col = F.lit(int(float(default_rate) * _HASH_SPACE))
    for src, rate in sorted(weights.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {src!r} must be in [0, 1], got {rate}")
        threshold_col = F.when(
            F.col(source_col) == src, F.lit(int(float(rate) * _HASH_SPACE))
        ).otherwise(threshold_col)
    return df.filter(sample_hash(F.col(key_col), salt) < threshold_col)


def budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    source_col: str = "source",
    key_col: str = "doc_id",
    default_budget: int = 0,
    salt: str = "",
) -> DataFrame:
    """Token-BUDGET-based source mixing: keep a deterministic prefix of
    each source until its token quota fills — how real mixtures are
    specified ("300B tokens of web, 30B of code"), vs the rate-based
    `mix_sources` ("3% of web").

    Documents order by the consistent sampling coin hash(salt:key)
    within their source (a uniform random-but-reproducible order), and a
    document survives iff the cumulative tokens BEFORE it are inside the
    source's budget — so every budget admits at least one document, the
    overshoot is bounded by one document, and a bigger budget's
    selection is a SUPERSET of a smaller one's with the same salt (the
    staged-ablation property, same as rate sampling's monotonicity).

    One window shuffle partitioned by source; the per-source cumsum is
    the same pure integer math any engine reproduces. Skewed source
    sizes skew the window partitions — at 100 TB pair a very large
    source with `mix_sources` pre-thinning (rate ~ budget/source_tokens)
    so the window sees only a few x budget of tokens, not the full
    source.
    """
    from pyspark.sql import Window

    coin = sample_hash(F.col(key_col), salt)
    w = (
        Window.partitionBy(source_col)
        .orderBy(coin, key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for s, b in sorted(budgets.items()) for x in (s, int(b))]
            ),
            F.col(source_col).cast("string"),
        ),
        F.lit(int(default_budget)),
    )
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return (
        df.withColumn("_cum_before", cum_before)
        .filter(F.col("_cum_before") < budget)
        .drop("_cum_before")
    )
