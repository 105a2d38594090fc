"""Gap fill (densify) — the reference's FillNulls generator
(/root/reference/helper/point/func.go:53-118): each series is emitted on a
dense [start, stop) grid at fixed step with NaN in empty buckets.

Spark-first: build the grid with ``sequence() + explode`` against the
distinct path set and LEFT JOIN the aggregated points.  The grid side is
tiny ((stop-start)/step slots per path) and the join key (path, time) is
the same key the resample aggregation just shuffled on, so Catalyst reuses
the exchange; with AQE the join usually becomes a broadcast of the grid.

The array-form variant returns one row per series with a dense
``values array<double>`` — the reference's time-series IR
(render/data/ch_response.go:132-168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timemath import fill_nulls_bounds


def gap_fill(
    points: DataFrame,
    from_ts: int,
    until_ts: int,
    step: int,
    paths: DataFrame | None = None,
    use_nan: bool = True,
) -> DataFrame:
    """Dense (path, time, value) grid; missing buckets NaN (or NULL).

    `points` must already be bucket-aggregated to `step` (time = bucket
    start). `paths` optionally supplies the full path universe (so series
    with zero points in range still appear, cf. append-empty-series).
    """
    start, stop, _count = fill_nulls_bounds(from_ts, until_ts, step)
    if paths is None:
        paths = points.select("path").distinct()
    grid = paths.select(
        "path",
        F.explode(F.sequence(F.lit(start), F.lit(stop - step), F.lit(step))).alias("time"),
    )
    filled = grid.join(points, ["path", "time"], "left")
    if use_nan:
        filled = filled.withColumn(
            "value", F.coalesce(F.col("value"), F.lit(float("nan")))
        )
    return filled


def gap_fill_arrays(
    points: DataFrame,
    from_ts: int,
    until_ts: int,
    step: int,
    paths: DataFrame | None = None,
) -> DataFrame:
    """One row per series: (path, start, stop, step, values array<double>).

    Built without the explode/join: aggregate (time, value) pairs per path
    and scatter them into a dense array — a single shuffle on path, array
    construction stays in JVM codegen (no Python).
    """
    start, stop, count = fill_nulls_bounds(from_ts, until_ts, step)
    # single-F.expr clauses: request-time plan-build cost (see
    # resample_grouped — same driver-thread py4j-chatter rationale)
    pairs = points.where(f"time >= {start} AND time < {stop}").groupBy("path").agg(
        F.expr("map_from_entries(collect_list(struct(time, value))) AS by_time")
    )
    if paths is not None:
        pairs = paths.join(pairs, "path", "left")
    values = F.expr(
        f"transform(sequence({start}L, {stop - step}L, {step}L), "
        f"t -> coalesce(element_at(by_time, t), cast('NaN' AS double)))"
    )
    return pairs.select(
        "path",
        F.lit(start).alias("start"),
        F.lit(stop).alias("stop"),
        F.lit(step).alias("step"),
        values.alias("values"),
    )


def gap_fill_arrays_dynamic(
    points: DataFrame,
    from_ts: int,
    until_ts: int,
    path_specs: DataFrame | None = None,
) -> DataFrame:
    """Per-path-step variant of ``gap_fill_arrays`` for the unaggregated
    render path: each series densifies on ITS OWN grid
    (ch_response.go:85-95 calls FillNulls with data.GetStep(id)).

    ``points`` must be bucket-aggregated with per-row step already;
    ``path_specs`` (path, step), when given, supplies the universe —
    series with no points still get a grid. Only pass it when
    append-empty-series is on: the universe left-join cannot broadcast
    its small (left) side, and with the flag off the all-NaN series are
    dropped downstream anyway. Grid bounds per metric follow
    func.go:55-62 with the SHARED aligned window and the metric's own
    step.
    """
    start_expr = F.col("_from") - F.col("_from") % F.col("step")
    start_expr = F.when(start_expr < F.col("_from"), start_expr + F.col("step")).otherwise(start_expr)
    pairs = points.groupBy("path", "step").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("time"), F.col("value")))
        ).alias("by_time")
    )
    if path_specs is not None:
        pairs = path_specs.select("path", "step").join(pairs, ["path", "step"], "left")
    with_bounds = (
        pairs.withColumn("_from", F.lit(from_ts))
        .withColumn("start", start_expr)
        .withColumn(
            "stop", F.lit(until_ts) - F.lit(until_ts) % F.col("step") + F.col("step")
        )
    )
    idx = F.sequence(F.col("start"), F.col("stop") - F.col("step"), F.col("step"))
    values = F.transform(
        idx, lambda t: F.coalesce(F.element_at(F.col("by_time"), t), F.lit(float("nan")))
    )
    return with_bounds.select("path", "start", "stop", "step", values.alias("values"))
