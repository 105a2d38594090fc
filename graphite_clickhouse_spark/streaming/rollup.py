"""Streaming rollup — the A1 resample as a Structured Streaming windowed
aggregation with late-data handling.

The reference has no streaming operators (ingest is carbon-clickhouse's
job, SURVEY §2.9); this is the Spark-native continuous materialization of
the same time-bucket aggregate the batch path computes: points arriving on
a stream are folded into fixed-width windows per path, with a watermark
bounding how late a point may arrive and still amend its bucket —
replacing the reference's "rely on ClickHouse GraphiteMergeTree to merge
late rows eventually" semantics with an explicit bound.

Output modes:
- append (production): a bucket is emitted once, when the watermark passes
  its end — downstream readers see each (path, time) exactly once;
- update/complete (debug/memory sink).

At scale this runs per-partition pre-aggregation before the stateful
shuffle (Spark does map-side partial aggregation for streaming aggs too),
and state is keyed (path, window) — evenly spread unless one path
dominates, in which case salt the path as for any skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.resample import AGG_FUNCTIONS


def streaming_resample(
    points: DataFrame,
    step_sec: int,
    function: str = "avg",
    max_lateness: str = "1 hour",
) -> DataFrame:
    """points stream (path, time, value[, version]) -> windowed rollup
    (path, time, value) where time = bucket start (epoch seconds).

    `max_lateness` is the watermark: points older than that relative to
    the max observed event time are dropped instead of amending closed
    buckets (the explicit version of the reference's eventual-merge)."""
    if function not in AGG_FUNCTIONS:
        raise ValueError(f"unknown aggregation function: {function}")
    order = (
        F.struct(F.col("time"), F.col("version"))
        if "version" in points.columns
        else F.col("time")
    )
    agg = AGG_FUNCTIONS[function](F.col("value"), order)
    ev = points.withColumn(
        "event_time", F.timestamp_seconds(F.col("time"))
    ).withWatermark("event_time", max_lateness)
    return (
        ev.groupBy(F.col("path"), F.window("event_time", f"{step_sec} seconds"))
        .agg(agg.alias("value"))
        .select(
            "path",
            F.unix_timestamp(F.col("window.start")).alias("time"),
            "value",
        )
    )
