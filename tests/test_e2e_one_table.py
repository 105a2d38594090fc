"""E2E scenario parity — the reference's tests/one_table/test.toml corpus
(SURVEY §5): same input points (carbon plaintext, incl. `;tag=v` tagged
names and special-character tag values), same find / tags-autocomplete /
render expectations, served by our ingest + Engine + HTTP pipeline.

rnow = a fixed 10s-aligned timestamp (the scenario runs at precision=10s);
the reference's rollup fixture (tests/clickhouse/rollup/rollup.xml) drives
aggregation: default avg precision 10.
"""

import json
import pickle
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.operators.rollup import Pattern, Retention, Rules
from graphite_clickhouse_spark.plans.autocomplete import tag_values_df
from graphite_clickhouse_spark.render.pipeline import Engine, RenderRequest
from graphite_clickhouse_spark.server import serve_background
from graphite_clickhouse_spark.sources.tables import build_path_index
from graphite_clickhouse_spark.streaming.ingest import (
    parse_carbon_lines,
    tags_map_from_path,
)

RNOW = 1704154000  # 10s-aligned

INPUTS = {
    "test.plain1": [3.0, 0.0, 1.0, 2.0],
    "test.plain2": [2.0, 1.0, 1.5, 2.5],
    "test2.plain": [1.0, 2.0, 2.5, 3.5],
    "metric1;tag1=value1;tag2=value21;tag3=value3": [2.0, 2.5, 2.0, 3.0],
    "metric1;tag2=value22;tag4=value4": [1.0, 2.0, 0.0, 1.0],
    "metric1;tag1=value1;tag2=value23;tag3=value3": [0.5, 1.5, 4.0, 3.0],
    "metric2;tag2=value21;tag4=value4": [2.0, 1.0, 0.0, 1.0],
    "test_metric;minus=-;plus=+;percent=%;underscore=_;colon=:;hash=#;forward=/;host=127.0.0.1": [
        2.1, 0.1, 0.2, 1.5,
    ],
}
OFFSETS = [-30, -20, -10, 0]


@pytest.fixture(scope="module")
def engine(spark):
    lines = []
    for name, values in INPUTS.items():
        for off, v in zip(OFFSETS, values):
            lines.append(f"{name} {v} {RNOW + off}")
    points = parse_carbon_lines(
        spark.createDataFrame([(l,) for l in lines], "value string"), version=1
    ).cache()
    plain = points.filter(~F.col("path").contains("?"))
    tagged = points.withColumn("tags", tags_map_from_path("path")).filter(
        F.col("path").contains("?")
    )
    rules = Rules.from_xml(
        open("/root/reference/tests/clickhouse/rollup/rollup.xml").read()
    )
    return Engine(
        spark=spark,
        points=points,
        path_index=build_path_index(plain.select("path")),
        tagged_points=tagged,
        rules=rules,
    )


@pytest.fixture(scope="module")
def base_url(engine):
    srv, url = serve_background(engine)
    yield url
    srv.shutdown()


def fetch(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read()


class TestIngestNormalization:
    def test_semicolon_tags_canonicalized(self, engine):
        paths = {r.path for r in engine.points.select("path").distinct().collect()}
        assert "metric1?tag1=value1&tag2=value21&tag3=value3" in paths
        assert "test.plain1" in paths


class TestFindChecks:
    def test_find_test_is_tree_node(self, base_url):
        got = pickle.loads(fetch(f"{base_url}/metrics/find/?query=test&format=pickle"))
        assert got == [{"metric_path": "test", "isLeaf": False}]

    def test_find_glob_leaves(self, base_url):
        got = pickle.loads(fetch(f"{base_url}/metrics/find/?query=test.pl*&format=pickle"))
        assert got == [
            {"metric_path": "test.plain1", "isLeaf": True},
            {"metric_path": "test.plain2", "isLeaf": True},
        ]


class TestTagsChecks:
    def test_tag1_under_tag2_filter(self, engine):
        # TOML: query = "tag1;tag2=value21" -> ["value1"]
        got = [
            r.value
            for r in tag_values_df(
                engine.tagged_points, "tag1", exprs=["tag2=value21"]
            ).collect()
        ]
        assert got == ["value1"]

    def test_name_values(self, engine):
        # TOML: query = "name;tag2=value21;tag1=~value" -> ["metric1"]
        got = [
            r.value
            for r in tag_values_df(
                engine.tagged_points, "name", exprs=["tag2=value21", "tag1=~value"]
            ).collect()
        ]
        assert got == ["metric1"]

    def test_special_char_tag_values(self, engine):
        # TOML: query = "colon;percent=%" -> [":"]
        got = [
            r.value
            for r in tag_values_df(
                engine.tagged_points, "colon", exprs=["percent=%"]
            ).collect()
        ]
        assert got == [":"]


class TestRenderChecks:
    """TOML render_checks: from=rnow-10 until=rnow, targets test.plain* and
    test{1,2}.plain; expected start=rnow-10 stop=rnow+10 step=10."""

    def render(self, engine, target):
        df = engine.render(RenderRequest(target, RNOW - 10, RNOW, max_data_points=0))
        return {r.path: r for r in df.collect()}

    def test_plain_star(self, engine):
        got = self.render(engine, "test.plain*")
        assert set(got) == {"test.plain1", "test.plain2"}
        r = got["test.plain1"]
        assert (r.start, r.stop, r.step) == (RNOW - 10, RNOW + 10, 10)
        assert r.values == [1.0, 2.0]
        assert got["test.plain2"].values == [1.5, 2.5]

    def test_brace_expansion_target(self, engine):
        got = self.render(engine, "test{1,2}.plain")
        assert set(got) == {"test2.plain"}
        assert got["test2.plain"].values == [2.5, 3.5]
        assert got["test2.plain"].function == "avg"

    def test_series_by_tag_render(self, engine):
        # from the TOML's seriesByTag render checks: name=metric2
        got = self.render(engine, "seriesByTag('name=metric2')")
        assert set(got) == {"metric2?tag2=value21&tag4=value4"}
        assert got["metric2?tag2=value21&tag4=value4"].values == [0.0, 1.0]

    def test_sum_suffix_uses_sum_function(self, engine, spark):
        # rollup.xml: \.sum$ -> sum; two points in one 10s bucket
        pts = spark.createDataFrame(
            [("a.sum", RNOW - 10, 1.0, 1), ("a.sum", RNOW - 5, 2.0, 2)],
            "path string, time long, value double, version long",
        )
        eng = Engine(spark=spark, points=pts, rules=engine.rules)
        df = eng.render(RenderRequest("a.sum", RNOW - 10, RNOW, max_data_points=0))
        row = df.collect()[0]
        assert row.function == "sum"
        assert row.values == [3.0, None] or row.values[0] == 3.0
