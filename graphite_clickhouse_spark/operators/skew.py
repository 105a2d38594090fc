"""Skew-aware aggregation — salting for hot keys (SURVEY.md brief: at
100 TB a handful of hot metric paths can dwarf every other shuffle
partition; AQE's skew-join handles joins, but a skewed AGGREGATION key
needs salting).

Two-phase shape: groupBy((keys, salt)) partial -> groupBy(keys) final.
Spark's map-side partial aggregation already collapses duplicates per
TASK; salting additionally splits one hot key's FINAL aggregation across
`salt_buckets` reducers, bounding any single reducer's load. The cost is
a second (tiny) shuffle over the partially-aggregated rows.

All decomposable aggregates are expressed by their merge algebra:
sum->sum, count->sum, min->min, max->max, avg->(sum,count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: agg -> (phase1 builder, phase2 merge builder)
_DECOMPOSED = {
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """`aggs`: output_name -> (function, column); function in
    sum/count/min/max/avg. Result equals a plain groupBy(keys).agg(...)
    but no reducer ever sees more than ~1/salt_buckets of one key's rows.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")

    phase1, phase2, finals = [], [], []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            phase1 += [F.sum(col).alias(f"__{name}_s"), F.count(col).alias(f"__{name}_c")]
            phase2 += [F.sum(f"__{name}_s").alias(f"__{name}_s"),
                       F.sum(f"__{name}_c").alias(f"__{name}_c")]
            finals.append((F.col(f"__{name}_s") / F.col(f"__{name}_c")).alias(name))
        elif fn in _DECOMPOSED:
            p1, p2 = _DECOMPOSED[fn]
            phase1.append(p1(F.col(col)).alias(f"__{name}"))
            phase2.append(p2(F.col(f"__{name}")).alias(f"__{name}"))
            finals.append(F.col(f"__{name}").alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1)
    merged = partial.groupBy(*keys).agg(*phase2)
    return merged.select(*keys, *finals)


def salted_distinct(df: DataFrame, cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """Skew-safe distinct: pre-dedup within (cols, partition-salt) before
    the global dedup shuffle — same two-phase idea for set semantics."""
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    return (
        df.select(*cols)
        .withColumn("__salt", salt)
        .dropDuplicates([*cols, "__salt"])
        .drop("__salt")
        .dropDuplicates(cols)
    )
