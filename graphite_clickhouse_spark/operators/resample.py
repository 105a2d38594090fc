"""Time-bucket resample aggregation — the reference's "internal aggregation"
pushed into ClickHouse via ``{func}Resample(from,until,step)(Value,Time)``
(/root/reference/render/data/query.go:34-42, doc/aggregation.md:108-137)
and its local rollup twin doMetricPrecision
(/root/reference/helper/rollup/rules.go:370-407).

Spark-first: ``groupBy(path, floor(time/step)*step)`` — Catalyst plans a
partial (map-side) + final hash aggregate; with AQE the shuffle is sized at
runtime. This IS the aggregate pushdown: the reduction happens next to the
scan, exactly like -Resample inside ClickHouse shards.

Aggregation functions are the reference's closed map avg/sum/min/max/any/
anyLast (helper/rollup/aggr.go:7-14). ``any`` = first point of the
time-sorted bucket, ``anyLast`` = last; implemented order-insensitively via
min_by/max_by(value, (time, version)) so the result does not depend on
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rollup function name -> aggregation Column builder (value_col, order_col)
AGG_FUNCTIONS = {
    "avg": lambda v, o: F.avg(v),
    "sum": lambda v, o: F.sum(v),
    "min": lambda v, o: F.min(v),
    "max": lambda v, o: F.max(v),
    "any": lambda v, o: F.min_by(v, o),
    "anyLast": lambda v, o: F.max_by(v, o),
}

#: consolidateBy(...) -> rollup function (render/data/targets.go:150-172)
CONSOLIDATE_TO_AGG = {
    "last": "anyLast",
    "first": "any",
    "average": "avg",
    "avg": "avg",
    "sum": "sum",
    "min": "min",
    "max": "max",
}

#: internal -> whisper-style names reported in v3 responses (data.go:53-67)
AGG_DISPLAY_NAME = {"any": "first", "anyLast": "last"}


def time_bucket(time_col: Column, step: int) -> Column:
    """floor(time/step)*step — integer epoch-seconds bucket."""
    return (time_col - time_col % F.lit(step)).alias("time")


def resample(
    df: DataFrame,
    from_ts: int,
    until_ts: int,
    step: int,
    function: str = "avg",
    path_col: str = "path",
    time_col: str = "time",
    value_col: str = "value",
    version_col: str | None = "version",
) -> DataFrame:
    """Aggregate points into fixed-width time buckets per path.

    Returns (path, time, value) with `time` floored to the bucket start.
    Time range filter [from_ts, until_ts] is inclusive, matching
    ``Time >= from AND Time <= until`` (pkg/where/where.go:224-226).
    """
    if function not in AGG_FUNCTIONS:
        raise ValueError(f"unknown aggregation function: {function}")
    order = (
        F.struct(F.col(time_col), F.col(version_col))
        if version_col and version_col in df.columns
        else F.col(time_col)
    )
    agg = AGG_FUNCTIONS[function](F.col(value_col), order)
    return (
        df.filter(F.col(time_col).between(from_ts, until_ts))
        .groupBy(F.col(path_col), time_bucket(F.col(time_col), step))
        .agg(agg.alias(value_col))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _literal_lookup(pairs: list[tuple[str, str]], path_col: str):
    """(path -> value) as ONE map-literal expression. For dashboard-sized
    path sets this replaces the per-request createDataFrame + broadcast
    join of the function table: the join cost a py4j-heavy RDD build at
    plan time and a broadcast-materialization job at run time, ~40% of a
    small render's wall clock (r6 latency profile). One F.expr call =
    one py4j round trip, and the lookup rides the existing scan."""
    # Defensive last-wins dedup: Spark's default
    # spark.sql.mapKeyDedupPolicy=EXCEPTION turns a duplicated path into
    # a runtime DUPLICATE_MAP_KEY job abort (a 500 on the render path).
    # Resolvers return distinct paths today, so this is belt-and-braces
    # for future call sites (r6 advisor).
    entries = ", ".join(
        f"{_sql_str(p)}, {_sql_str(v)}" for p, v in dict(pairs).items()
    )
    return F.expr(f"element_at(map({entries}), {path_col})")


def resample_grouped(
    df: DataFrame,
    from_ts: int,
    until_ts: int,
    step: int,
    path_functions,
    path_col: str = "path",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Per-path aggregation function (rollup rules give each metric its own
    function). ``path_functions`` is either a small (path, agg_function)
    DataFrame — broadcast-joined — or a list of (path, agg_function)
    pairs, inlined as a map-literal lookup (no join, no broadcast; the
    caller guarantees df is already restricted to exactly those paths).
    Each function group then aggregates in one pass using conditional
    aggregates (no per-group job fan-out, single shuffle)."""
    if isinstance(path_functions, list):
        joined = df.withColumn(
            "agg_function", _literal_lookup(path_functions, path_col)
        )
    else:
        joined = df.join(F.broadcast(path_functions), path_col)
    # Whole clauses as single F.expr strings: this function runs at HTTP
    # request time on the driver thread, and per-Column py4j round trips
    # were the dominant plan-build cost of a small render (r6 latency
    # profile — the GIL serializes plan building across handler threads,
    # so chatty expression construction caps saturation throughput).
    # bare time column when no version: a single-field struct ordering
    # would force SortAggregate (struct buffers are not hash-aggregatable)
    order_expr = (
        f"struct({time_col}, version)" if "version" in df.columns else time_col
    )
    agged = (
        joined.where(f"{time_col} BETWEEN {int(from_ts)} AND {int(until_ts)}")
        .groupBy(
            F.col(path_col),
            F.expr(f"{time_col} - {time_col} % {int(step)} AS time"),
            F.col("agg_function"),
        )
        .agg(
            F.expr(f"avg({value_col}) AS _avg"),
            F.expr(f"sum({value_col}) AS _sum"),
            F.expr(f"min({value_col}) AS _min"),
            F.expr(f"max({value_col}) AS _max"),
            F.expr(f"min_by({value_col}, {order_expr}) AS _any"),
            F.expr(f"max_by({value_col}, {order_expr}) AS _anyLast"),
        )
    )
    value = F.expr(
        "CASE agg_function WHEN 'avg' THEN _avg WHEN 'sum' THEN _sum "
        "WHEN 'min' THEN _min WHEN 'max' THEN _max WHEN 'any' THEN _any "
        "WHEN 'anyLast' THEN _anyLast END"
    )
    return agged.select(path_col, "time", value.alias(value_col), "agg_function")


def resample_grouped_dynamic(
    df: DataFrame,
    from_ts: int,
    until_ts: int,
    path_specs: DataFrame,
    path_col: str = "path",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Per-path step AND function — the client-side rollup of the
    UNAGGREGATED fetch (internal-aggregation=false): each metric keeps its
    own retention precision, so one response mixes steps
    (helper/rollup/rules.go:409-421 RollupMetricAge via doMetricPrecision,
    render/data/data.go:134-142 SetSteps).

    ``path_specs`` is a small (path, step, agg_function) DataFrame —
    broadcast-joined — or a list of (path, step, agg_function) triples,
    inlined as two map-literal lookups (same contract as
    resample_grouped: the caller already restricted df to these paths).
    The bucket floors to the per-row step (absolute alignment
    t - t%precision, rules.go:381-389). Still one scan + one shuffle for
    all groups.
    """
    if isinstance(path_specs, list):
        joined = df.withColumn(
            "step",
            _literal_lookup(
                [(p, str(int(s))) for p, s, _fn in path_specs], path_col
            ).cast("long"),
        ).withColumn(
            "agg_function",
            _literal_lookup([(p, fn) for p, _s, fn in path_specs], path_col),
        )
    else:
        joined = df.join(F.broadcast(path_specs), path_col)
    # bare time column when no version: a single-field struct ordering
    # still forces SortAggregate (struct buffers are not
    # hash-aggregatable); the deduped unaggregated path relies on this
    order = (
        F.struct(F.col(time_col), F.col("version"))
        if "version" in df.columns
        else F.col(time_col)
    )
    v = F.col(value_col)
    fn = F.col("agg_function")
    bucket = (F.col(time_col) - F.col(time_col) % F.col("step")).alias("time")
    bucketed = joined.filter(F.col(time_col).between(from_ts, until_ts)).groupBy(
        F.col(path_col), bucket, F.col("step"), fn.alias("agg_function")
    )
    agged = bucketed.agg(
        F.avg(v).alias("_avg"),
        F.sum(v).alias("_sum"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
        F.min_by(v, order).alias("_any"),
        F.max_by(v, order).alias("_anyLast"),
    )
    value = (
        F.when(fn == "avg", F.col("_avg"))
        .when(fn == "sum", F.col("_sum"))
        .when(fn == "min", F.col("_min"))
        .when(fn == "max", F.col("_max"))
        .when(fn == "any", F.col("_any"))
        .when(fn == "anyLast", F.col("_anyLast"))
    )
    return agged.select(path_col, "time", "step", value.alias(value_col), "agg_function")
