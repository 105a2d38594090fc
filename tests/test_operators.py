"""Spark operator tests — semantics pinned by FIXTURES.md §4 (bucket
alignment, per-bucket aggregation, version dedup, NaN grid)."""

import math

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.operators.dedup import (
    dedup_versions,
    dedup_versions_all_columns,
)
from graphite_clickhouse_spark.operators.gapfill import gap_fill, gap_fill_arrays
from graphite_clickhouse_spark.operators.resample import resample, resample_grouped

POINTS_SCHEMA = "path string, time long, value double, version long"


@pytest.fixture()
def points(spark):
    # rnow = 1000 (10s precision); mirrors tests/agg_merge shape:
    # two points inside the rnow bucket (t=999 illegal; use 1000,1001... wait
    # bucket is [1000,1010) so 1000 and 1001 collide)
    rows = [
        ("test.avg", 970, 3.0, 1),
        ("test.avg", 980, 0.0, 1),
        ("test.avg", 990, 1.0, 1),
        ("test.avg", 1000, 0.0, 1),
        ("test.avg", 1001, 2.0, 1),
        ("test.avg", 1002, 4.0, 1),
    ]
    return spark.createDataFrame(rows, POINTS_SCHEMA)


def test_resample_functions(spark, points):
    for fn, expect in [
        ("avg", 2.0),
        ("sum", 6.0),
        ("min", 0.0),
        ("max", 4.0),
        ("any", 0.0),       # first in time order
        ("anyLast", 4.0),   # last in time order
    ]:
        got = {
            r.time: r.value
            for r in resample(points, 970, 1009, 10, fn).collect()
        }
        assert got[1000] == expect, fn
        assert got[970] == 3.0 if fn != "sum" else True


def test_version_dedup(spark):
    rows = [
        ("m", 100, 1.0, 10),
        ("m", 100, 5.0, 20),  # higher version wins
        ("m", 110, 7.0, 5),
        ("n", 100, 2.0, 1),
    ]
    df = spark.createDataFrame(rows, POINTS_SCHEMA)
    got = {(r.path, r.time): r.value for r in dedup_versions(df).collect()}
    assert got == {("m", 100): 5.0, ("m", 110): 7.0, ("n", 100): 2.0}
    got2 = {
        (r.path, r.time): (r.value, r.version)
        for r in dedup_versions_all_columns(df).collect()
    }
    assert got2[("m", 100)] == (5.0, 20)


def test_gap_fill_nan_grid(spark):
    rows = [("m", 120, 1.0, 1), ("m", 240, 2.0, 1)]
    df = spark.createDataFrame(rows, POINTS_SCHEMA).select("path", "time", "value")
    filled = gap_fill(df, 120, 299, 60).orderBy("time").collect()
    assert [r.time for r in filled] == [120, 180, 240]
    assert filled[0].value == 1.0
    assert math.isnan(filled[1].value)
    assert filled[2].value == 2.0


def test_gap_fill_arrays(spark):
    rows = [("m", 120, 1.0, 1), ("m", 240, 2.0, 1)]
    df = spark.createDataFrame(rows, POINTS_SCHEMA).select("path", "time", "value")
    out = gap_fill_arrays(df, 120, 299, 60).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.start, r.stop, r.step) == (120, 300, 60)
    assert r.values[0] == 1.0 and math.isnan(r.values[1]) and r.values[2] == 2.0
    # empty series still appears when a path universe is supplied
    paths = df.sparkSession.createDataFrame([("m",), ("empty",)], "path string")
    out2 = {
        r.path: r.values for r in gap_fill_arrays(df, 120, 299, 60, paths=paths).collect()
    }
    assert all(math.isnan(v) for v in out2["empty"])


def test_resample_grouped_per_path_function(spark, points):
    more = points.union(
        points.sparkSession.createDataFrame(
            [("test.sum", 1000, 1.0, 1), ("test.sum", 1001, 2.0, 1)], POINTS_SCHEMA
        )
    )
    fns = spark.createDataFrame(
        [("test.avg", "avg"), ("test.sum", "sum")], "path string, agg_function string"
    )
    got = {
        (r.path, r.time): r.value
        for r in resample_grouped(more, 970, 1009, 10, fns).collect()
    }
    assert got[("test.avg", 1000)] == 2.0
    assert got[("test.sum", 1000)] == 3.0
