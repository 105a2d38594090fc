"""End-to-end render pipeline tests on FIXTURES.md-style inputs."""

import math

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.operators.rollup import Pattern, Retention, Rules
from graphite_clickhouse_spark.render.pipeline import Engine, RenderRequest
from graphite_clickhouse_spark.sources.tables import build_path_index

POINTS_SCHEMA = "path string, time long, value double, version long"
RNOW = 1_700_000_000  # 10s-aligned


@pytest.fixture(scope="module")
def engine(spark):
    rows = []
    for name, vals in [
        ("test.plain1", [3.0, 0.0, 1.0, 2.0]),
        ("test.plain2", [2.0, 1.0, 1.5, 2.5]),
        ("test2.plain", [1.0, 2.0, 2.5, 3.5]),
    ]:
        for i, v in enumerate(vals):
            rows.append((name, RNOW - 30 + 10 * i, v, 1))
    # per-suffix rollup shapes (agg_merge): dup inside rnow bucket
    for suffix in ["avg", "sum", "min", "max"]:
        name = f"test.{suffix}"
        rows += [
            (name, RNOW - 30, 3.0, 1),
            (name, RNOW - 20, 0.0, 1),
            (name, RNOW - 10, 1.0, 1),
            (name, RNOW, 0.0, 1),
            (name, RNOW, 2.0, 2),  # higher version wins inside the bucket pair
            (name, RNOW + 1, 4.0, 1),
        ]
    points = spark.createDataFrame(rows, POINTS_SCHEMA)
    rules = Rules(
        [
            Pattern(regexp=r"\.sum$", function="sum"),
            Pattern(regexp=r"\.min$", function="min"),
            Pattern(regexp=r"\.max$", function="max"),
            Pattern(regexp="", function="avg", retention=[Retention(0, 10)]),
        ]
    )
    tagged = spark.createDataFrame(
        [
            ("metric1?tag1=value1&tag2=value21", {"__name__": "metric1", "tag1": "value1", "tag2": "value21"}, RNOW, 1.0, 1),
            ("metric1?tag2=value22&tag4=value4", {"__name__": "metric1", "tag2": "value22", "tag4": "value4"}, RNOW, 2.0, 1),
            ("metric2?tag2=value21", {"__name__": "metric2", "tag2": "value21"}, RNOW, 3.0, 1),
        ],
        "path string, tags map<string,string>, time long, value double, version long",
    )
    return Engine(
        spark=spark,
        points=points,
        path_index=build_path_index(points.select("path")),
        tagged_points=tagged,
        rules=rules,
    )


def test_find_glob(engine):
    got = sorted(r.path for r in engine.find_paths("test.plain*").collect())
    assert got == ["test.plain1", "test.plain2"]
    got = sorted(r.path for r in engine.find_paths("test.{plain1,plain2}").collect())
    assert got == ["test.plain1", "test.plain2"]
    got = sorted(r.path for r in engine.find_paths("*.plain").collect())
    assert got == ["test2.plain"]


def test_find_tree_non_leaf(engine):
    # path_index carries parents with trailing dot, non-leaf
    idx = engine.path_index
    rows = {r.path: (r.level, r.is_leaf) for r in idx.collect()}
    assert rows["test."] == (1, False)
    assert rows["test.plain1"] == (2, True)


def test_find_tagged(engine):
    got = sorted(
        r.path for r in engine.find_paths("seriesByTag('tag2=value21')").collect()
    )
    assert got == ["metric1?tag1=value1&tag2=value21", "metric2?tag2=value21"]
    got = sorted(
        r.path
        for r in engine.find_paths(
            "seriesByTag('name=metric1', 'tag2=~value2')"
        ).collect()
    )
    assert len(got) == 2 and all(p.startswith("metric1?") for p in got)


def test_render_basic(engine):
    req = RenderRequest("test.plain*", RNOW - 10, RNOW)
    out = {r.path: r for r in engine.render(req).collect()}
    r1 = out["test.plain1"]
    assert r1.step == 10 and list(r1.values) == [1.0, 2.0]
    assert out["test.plain2"].values == [1.5, 2.5]


def test_render_rollup_functions(engine):
    # bucket at RNOW holds {0.0(v1),2.0(v2)} dedup-> 2.0 plus 4.0 @ rnow+1
    expect = {"avg": 3.0, "sum": 6.0, "min": 2.0, "max": 4.0}
    for fn, want in expect.items():
        req = RenderRequest(f"test.{fn}", RNOW, RNOW + 9)
        rows = engine.render(req).collect()
        assert len(rows) == 1
        assert rows[0].values == [want], fn
        assert rows[0].function == fn


def test_render_gap_fill(engine):
    req = RenderRequest("test.plain1", RNOW - 30, RNOW + 30)
    rows = engine.render(req).collect()
    vals = rows[0].values
    assert vals[:4] == [3.0, 0.0, 1.0, 2.0]
    assert all(math.isnan(v) for v in vals[4:])


def test_render_max_data_points_inflates_step(engine):
    req = RenderRequest("test.plain1", RNOW - 30, RNOW, max_data_points=2)
    rows = engine.render(req).collect()
    assert rows[0].step == 20
    # from=ceil(From,20) drops the RNOW-30 point (query.go:417-420);
    # remaining buckets: [RNOW-20,RNOW)={0.0,1.0}, [RNOW,..)={2.0}
    assert rows[0].values == [0.5, 2.0]


def test_render_consolidate_by(engine):
    req = RenderRequest("test.plain1", RNOW - 30, RNOW, max_data_points=2,
                        consolidate_by="max")
    rows = engine.render(req).collect()
    assert rows[0].values == [1.0, 2.0]  # max of {0,1}, max of {2}


class TestRenderMulti:
    def test_multi_target_union(self, spark):
        from graphite_clickhouse_spark.render.pipeline import Engine, RenderRequest
        from graphite_clickhouse_spark.sources.tables import points_from_events

        points = points_from_events(spark, "/root/testdata/sf0.001")
        eng = Engine(spark=spark, points=points)
        reqs = [
            RenderRequest("ev.purchase.u1", 1704067200, 1704153600, max_data_points=24),
            RenderRequest("ev.click.u2", 1704067200, 1704153600, max_data_points=24),
        ]
        rows = eng.render_multi(reqs).collect()
        got = {(r.path, r.target) for r in rows}
        # ev.click.u2 has no points in the window: dropped by default
        # (append-empty-series=false, ch_response.go:98-107)
        assert got == {("ev.purchase.u1", "ev.purchase.u1")}

        eng_append = Engine(spark=spark, points=points, append_empty_series=True)
        rows = eng_append.render_multi(reqs).collect()
        got = {(r.path, r.target) for r in rows}
        assert got == {
            ("ev.purchase.u1", "ev.purchase.u1"),
            ("ev.click.u2", "ev.click.u2"),
        }
        empty = [r for r in rows if r.path == "ev.click.u2"][0]
        assert all(v != v for v in empty.values)  # all-NaN grid


class TestReversedIndex:
    """Reversed-path index orientation (finder/index.go:100-177): the
    engine picks path vs path_rev per query; results are identical either
    way, only the pushdown-friendly prefix changes."""

    QUERIES = ["*.plain", "test.plain*", "*.plain*", "test.{plain1,plain2}",
               "test2.plain", "*"]

    def test_direct_reversed_equivalence(self, spark, engine):
        for q in self.QUERIES:
            direct = Engine(
                spark=spark, points=engine.points, path_index=engine.path_index,
                index_reverse="direct",
            )
            reverse = Engine(
                spark=spark, points=engine.points, path_index=engine.path_index,
                index_reverse="reversed",
            )
            d = sorted(r.path for r in direct.find_paths(q).collect())
            r = sorted(r.path for r in reverse.find_paths(q).collect())
            assert d == r, q

    def test_path_rev_column(self, engine):
        rows = {r.path: r.path_rev for r in engine.path_index.collect()}
        assert rows["test.plain1"] == "plain1.test"
        assert rows["test."] is None  # tree nodes carry no reversed form
