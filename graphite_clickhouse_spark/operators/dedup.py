"""Version dedup — ReplacingMergeTree semantics done client-side in the
reference (Uniq: /root/reference/helper/point/func.go:28-51): on duplicate
(path, time) keep the row with max write-version.

Spark-first: a single `max_by` aggregation (one shuffle on the grouping
key, map-side partial aggregation for free). At 100 TB the shuffle is
unavoidable for a global dedup, but partial aggregation collapses
duplicates early; when the points table is bucketed/partitioned by path
the shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_versions(
    df: DataFrame,
    keys: tuple[str, ...] = ("path", "time"),
    version_col: str = "version",
    value_col: str = "value",
) -> DataFrame:
    """Keep, per key group, the value of the max-version row.

    max_by keeps the aggregation buffer primitive (long ordering +
    double value), so the dedup runs as a HashAggregate; the previous
    max-of-struct form forced SortAggregate + a full Sort on every
    deduped fetch (struct buffers are not hash-aggregatable). Equal
    versions within a key group are the reference's insertion-order
    tie-break, i.e. nondeterministic under concurrent writes to begin
    with (helper/point/func.go:28-51); real write paths assign unique
    versions per (path, time).
    """
    return df.groupBy(*keys).agg(
        F.max_by(F.col(value_col), F.col(version_col)).alias(value_col),
        F.max(version_col).alias(version_col),
    )


def dedup_versions_all_columns(
    df: DataFrame,
    keys: tuple[str, ...] = ("path", "time"),
    version_col: str = "version",
) -> DataFrame:
    """Row-preserving variant (keeps every column of the winning row) via
    max-struct — still a single aggregation, no window/sort needed."""
    payload = [c for c in df.columns if c not in keys]
    ordered = F.struct(
        F.col(version_col).alias("__v"), *[F.col(c).alias(c) for c in payload if c != version_col]
    )
    agg = df.groupBy(*keys).agg(F.max(ordered).alias("__w"))
    cols = [F.col(k) for k in keys]
    cols.append(F.col("__w.__v").alias(version_col))
    cols.extend(F.col(f"__w.{c}").alias(c) for c in payload if c != version_col)
    return agg.select(*cols)
