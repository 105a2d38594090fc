"""Table loaders and index derivations.

Storage model (SURVEY.md §1.2, FIXTURES.md §1):
- points(date, path, time, value, version)   — partitioned by date
- path_index(level, path, is_leaf, version)  — derived from points paths
- tags_index(date, path, name, tags map, version)

The driver's testdata has no native graphite tables, so `points_from_events`
derives a deterministic points table from the synthetic `events` table —
the same derivation is expressed in DuckDB SQL by `POINTS_FROM_EVENTS_SQL`
so every graphite-semantics operator is oracle-checkable.
"""

from __future__ import annotations

import os
import stat

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: Inferred parquet schemas keyed on (path, directory mtime_ns) — METADATA
#: only, never data or results: a path-based spark.read.parquet runs a
#: schema-inference job (footer read) on EVERY call, which a catalog
#: deployment pays once at table registration (the metastore holds the
#: schema; streaming/ingest.py already passes its schemas explicitly for
#: the same reason).  The r10 build-time profile showed ~0.1-0.2 s per
#: load_table call going to this job, multiplied across every query and
#: bench rep.  File LISTING and data reads still happen fresh on every
#: call — only the schema is remembered, and the mtime key invalidates it
#: if the dataset directory is rewritten (parquet writers add/remove part
#: files, which bumps the directory mtime).
_SCHEMA_MEMO: dict[tuple[str, int], StructType] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # some testdata generations store events.ts as TIMESTAMP(NANOS), which
    # Spark can only read as long nanoseconds; the setting is a no-op for
    # micros-typed data (current generation) and safe to set dynamically.
    # events_ts_seconds() adapts to whichever type comes back.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns)
        if stat.S_ISDIR(st.st_mode):
            # directory datasets: rewriting a part file IN PLACE (same
            # filename) does not bump the directory mtime, so fold the
            # newest entry mtime + entry count into the key (r10 ADVICE)
            entries = list(os.scandir(path))
            newest = max(
                (e.stat().st_mtime_ns for e in entries), default=0
            )
            key = (path, st.st_mtime_ns, newest, len(entries))
    except OSError:
        # missing path: let the plain reader raise Spark's own error
        return spark.read.parquet(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_MEMO[key] = schema
    return spark.read.schema(schema).parquet(path)


def events_ts_seconds(ev: DataFrame) -> F.Column:
    """Epoch-seconds column for events.ts, whatever physical type the
    testdata was generated with: long nanoseconds (integer div keeps epoch
    seconds exact — double division would lose precision at 1e18) or a
    parquet timestamp (micros), which Spark surfaces as TIMESTAMP/_NTZ."""
    dt = ev.schema["ts"].dataType.simpleString()
    if dt == "bigint":
        return F.expr("ts div 1000000000")
    if dt == "timestamp_ntz":
        # NTZ wall-clock == UTC in this dataset. timestampdiff between two
        # NTZ operands is session-timezone-independent (a tz-pinned cast
        # route is NOT — the driver harness may run a non-UTC session) and
        # stays inside whole-stage codegen.
        return F.expr("timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', ts)")
    return F.col("ts").cast("long")


def points_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> points(path, time, value, version).

    path = 'ev.<event_type>.u<user_id%10>'; time = epoch seconds; version =
    event_id (unique -> deterministic version dedup).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.concat(
            F.lit("ev."), F.col("event_type"), F.lit(".u"), (F.col("user_id") % 10).cast("string")
        ).alias("path"),
        events_ts_seconds(ev).alias("time"),
        F.col("value"),
        F.col("event_id").alias("version"),
    )


#: DuckDB CTE body equivalent to points_from_events (oracle side).
POINTS_FROM_EVENTS_SQL = """
    SELECT 'ev.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR) AS path,
           CAST(floor(epoch(ts)) AS BIGINT) AS time,
           value,
           event_id AS version
    FROM events
"""


def tagged_points_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> tagged points with a MAP<STRING,STRING> tags column.

    Tagged path form `name?k1=v1&k2=v2` with sorted tag keys
    (reference finder/tagged.go:551-596); __name__ holds the metric name.
    """
    ev = load_table(spark, sf_dir, "events")
    user = F.concat(F.lit("u"), (F.col("user_id") % 10).cast("string"))
    return ev.select(
        F.concat(F.lit("ev?type="), F.col("event_type"), F.lit("&user="), user).alias("path"),
        F.create_map(
            F.lit("__name__"), F.lit("ev"),
            F.lit("type"), F.col("event_type"),
            F.lit("user"), user,
        ).alias("tags"),
        events_ts_seconds(ev).alias("time"),
        F.col("value"),
        F.col("event_id").alias("version"),
    )


def build_path_index(points_paths: DataFrame) -> DataFrame:
    """Distinct paths -> find-index rows for each metric AND every parent
    prefix (mirrors the reference's index-table encoding,
    doc/index-table.md:20-38: parents carry a trailing '.', level = node
    depth, leaf = the full metric name).

    Input: DataFrame with a `path` column (plain dotted names).
    Output: (path, level, is_leaf, path_rev) distinct.

    `path_rev` is the dot-segment-reversed name for LEAF rows (null for
    tree nodes and tagged paths). The reference duplicates every index row
    in reversed orientation at a level offset (doc/index-table.md:20-38,
    finder/index.go:19-21) so suffix-anchored globs become prefix scans;
    columnar storage lets us carry it as one extra column instead —
    StringStartsWith on `path_rev` pushes into the Parquet scan and prunes
    row groups by min/max stats exactly like a prefix on `path` does.

    Spark-first: posexplode over a transform(sequence(...)) — pure JVM
    expression work, no Python; the distinct() is the only shuffle and it
    runs on the (small) name universe, not the points table.
    """
    parts = F.split(F.col("path"), "[.]")
    n = F.size(parts)
    prefixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i < n, F.concat(F.array_join(F.slice(parts, F.lit(1), i), "."), F.lit("."))
        ).otherwise(F.col("path")),
    )
    idx = (
        points_paths.select("path")
        .distinct()
        .select(F.posexplode(prefixes).alias("pos", "node"), F.col("path").alias("full"))
        .select(
            F.col("node").alias("path"),
            (F.col("pos") + 1).alias("level"),
            (~F.col("node").endswith(".")).alias("is_leaf"),
        )
        .distinct()
    )
    rev = F.array_join(F.reverse(F.split(F.col("path"), "[.]")), ".")
    return idx.withColumn(
        "path_rev",
        F.when(F.col("is_leaf") & ~F.col("path").contains("?"), rev),
    )


def build_daily_path_index(points: DataFrame) -> DataFrame:
    """Daily find-index rows: (date, path, level, is_leaf, path_rev), one
    tree per calendar day a path received points (the reference's daily
    index rows, doc/index-table.md:20-38; queried with Date bounds by
    DateFinder / IndexFinder useDaily, finder/index.go:151-161).

    Written date-partitioned, a time-bounded find prunes to the days in
    range — the index scan cost tracks the QUERY window, not the total
    retention (the 100 TB lever: most dashboards ask for hours, not
    years). Input needs (path, date) columns; one distinct per day.
    """
    parts = F.split(F.col("path"), "[.]")
    n = F.size(parts)
    prefixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i < n, F.concat(F.array_join(F.slice(parts, F.lit(1), i), "."), F.lit("."))
        ).otherwise(F.col("path")),
    )
    rev = F.array_join(F.reverse(F.split(F.col("path"), "[.]")), ".")
    return (
        points.select("path", "date")
        .distinct()
        .select("date", F.posexplode(prefixes).alias("pos", "node"))
        .select(
            "date",
            F.col("node").alias("path"),
            (F.col("pos") + 1).alias("level"),
            (~F.col("node").endswith(".")).alias("is_leaf"),
        )
        .distinct()
        .withColumn(
            "path_rev",
            F.when(F.col("is_leaf") & ~F.col("path").contains("?"), rev),
        )
    )
