"""TOML config loader: reference graphite-clickhouse.conf format ->
Settings -> wired Engine (blacklist, extra-prefix, feature flags, rollup,
limiters, find-cache)."""

import textwrap

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.config import (
    Settings,
    engine_from_settings,
    load_settings,
    parse_go_duration,
)

FULL_CONF = textwrap.dedent(
    """
    [common]
    listen = ":9090"
    max-cpu = 4
    max-metrics-in-find-answer = 500
    max-metrics-per-target = 12000
    append-empty-series = false
    target-blacklist = ["^secret[.]", "internal$"]

    [common.find-cache]
    type = "mem"
    size-mb = 0
    default-timeout = 10800
    short-timeout = 300
    find-timeout = 600
    short-duration = "3h"
    short-offset = 61

    [feature-flags]
    use-carbon-behaviour = true
    dont-match-missing-tags = true

    [clickhouse]
    url = "http://localhost:8123"
    data-timeout = "1m30s"
    index-timeout = "45s"
    extra-prefix = "graphite"
    wildcard-min-distance = 2
    tags-min-in-query = 1
    tagged-autocomplete-days = 3
    max-data-points = 4096
    internal-aggregation = true
    render-max-queries = 500
    render-concurrent-queries = 10
    find-max-queries = 100
    find-concurrent-queries = 8
    tags-max-queries = 100
    tags-concurrent-queries = 6
    rollup-conf = "none"
    rollup-default-precision = 120
    rollup-default-function = "max"

    [[data-table]]
    table = "graphite_data"
    reverse = false

    [logging]
    file = "/var/log/x.log"

    [prometheus]
    listen = ":9092"
    """
)


class TestParse:
    def test_durations(self):
        assert parse_go_duration("1m0s") == 60
        assert parse_go_duration("1m30s") == 90
        assert parse_go_duration("100ms") == pytest.approx(0.1)
        assert parse_go_duration("0s") == 0
        assert parse_go_duration(300) == 300
        assert parse_go_duration("2h") == 7200
        with pytest.raises(ValueError):
            parse_go_duration("nonsense")

    def test_full_conf(self):
        s = load_settings(FULL_CONF)
        assert s.max_metrics_in_find_answer == 500
        assert s.max_metrics_per_target == 12000
        assert s.blacklist is not None and s.blacklist.matches("secret.foo")
        assert not s.blacklist.matches("public.foo")
        assert s.find_cache is not None
        assert s.find_cache.default_timeout_sec == 10800
        assert s.find_cache.short_timeout_sec == 300
        assert s.find_cache.short_duration_sec == 3 * 3600
        assert s.flags.use_carbon_behaviour and s.flags.dont_match_missing_tags
        assert s.prefix is not None and s.prefix.prefix == "graphite"
        assert s.wildcard_min_distance == 2
        assert s.tags_min_in_query == 1
        assert s.max_data_points == 4096
        assert s.data_timeout_sec == 90
        assert s.index_timeout_sec == 45
        assert s.limiters["render"] == {"max": 500, "concurrent": 10, "adaptive": 0}
        assert s.limiters["tags"] == {"max": 100, "concurrent": 6, "adaptive": 0}
        # rollup-conf = "none" -> single default rule
        assert s.rules.lookup("any.metric", age=0) == (120, "max")
        # [prometheus] is consumed now (lookback-delta feeds the evaluator);
        # only its infra keys land in ignored
        assert "logging" in s.ignored and "prometheus.listen" in s.ignored
        assert "clickhouse.url" in s.ignored

    def test_empty_conf_defaults(self):
        s = load_settings("")
        assert s.max_metrics_per_target == 15000
        assert s.blacklist is None and s.prefix is None and s.find_cache is None
        assert not s.flags.use_carbon_behaviour
        assert s.rules.lookup("m", 0)[0] > 0  # super-default rule exists

    def test_rollup_xml_file(self, tmp_path):
        xml = tmp_path / "rollup.xml"
        xml.write_text(
            "<graphite_rollup>"
            "<pattern><regexp>^hot[.]</regexp><function>max</function>"
            "<retention><age>0</age><precision>10</precision></retention></pattern>"
            "<default><function>avg</function>"
            "<retention><age>0</age><precision>60</precision></retention></default>"
            "</graphite_rollup>"
        )
        s = load_settings(f'[clickhouse]\nrollup-conf = "{xml}"\n')
        assert s.rules.lookup("hot.cpu", 0) == (10, "max")
        assert s.rules.lookup("cold.cpu", 0) == (60, "avg")

    def test_data_table_rollup_wins(self, tmp_path):
        xml = tmp_path / "r.xml"
        xml.write_text(
            "<graphite_rollup><default><function>sum</function>"
            "<retention><age>0</age><precision>30</precision></retention>"
            "</default></graphite_rollup>"
        )
        s = load_settings(
            f'[clickhouse]\nrollup-conf = "none"\nrollup-default-precision = 99\n'
            f'[[data-table]]\ntable = "t"\nrollup-conf = "{xml}"\n'
        )
        assert s.rules.lookup("x", 0) == (30, "sum")

    def test_class_limiters(self):
        s = load_settings(FULL_CONF)
        lim = s.class_limiters()
        with lim.render.enter():
            pass  # acquires and releases


class TestWiredEngine:
    @pytest.fixture()
    def engine(self, spark):
        points = spark.createDataFrame(
            [
                ("m.cpu.user", 60, 1.0, 1),
                ("m.cpu.sys", 60, 2.0, 1),
                ("secret.hidden", 60, 3.0, 1),
            ],
            "path string, time long, value double, version long",
        )
        conf = textwrap.dedent(
            """
            [common]
            target-blacklist = ["^graphite[.]secret[.]"]
            [clickhouse]
            extra-prefix = "graphite"
            rollup-conf = "none"
            rollup-default-precision = 60
            rollup-default-function = "avg"
            """
        )
        return engine_from_settings(
            spark, load_settings(conf), points
        )

    def test_prefixed_find(self, engine):
        got = sorted(r.path for r in engine.find_paths("graphite.m.cpu.*").collect())
        assert got == ["graphite.m.cpu.sys", "graphite.m.cpu.user"]

    def test_partial_prefix_node(self, engine):
        got = [r.path for r in engine.find_paths("gra*").collect()]
        assert got == ["graphite."]

    def test_unprefixed_miss(self, engine):
        assert engine.find_paths("other.m.*").collect() == []

    def test_blacklisted_target_empty(self, engine):
        assert engine.find_paths("graphite.secret.*").collect() == []

    def test_render_through_prefix(self, engine):
        from graphite_clickhouse_spark.render.pipeline import RenderRequest

        rows = engine.render(
            RenderRequest("graphite.m.cpu.user", 0, 120, max_data_points=10)
        ).collect()
        assert [r.path for r in rows] == ["graphite.m.cpu.user"]
        vals = [v for v in rows[0].values if v == v]  # drop NaN
        assert vals == [1.0]


class TestFlagsWiring:
    def test_flags_reach_tagged_find(self, spark):
        tagged = spark.createDataFrame(
            [
                ("disk.io;dc=east", 60, 1.0, 1, {"__name__": "disk.io", "dc": "east"}),
                ("disk.io", 60, 2.0, 1, {"__name__": "disk.io"}),
            ],
            "path string, time long, value double, version long, "
            "tags map<string,string>",
        )
        base = dict(points=tagged, tagged_points=tagged)
        s_carbon = load_settings("[feature-flags]\nuse-carbon-behaviour = true\n")
        eng = engine_from_settings(spark, s_carbon, **base)
        got = sorted(
            r.path for r in eng.find_paths("seriesByTag('name=disk.io','dc=')").collect()
        )
        assert got == ["disk.io"]  # dc= matches metrics WITHOUT the tag
        s_plain = load_settings("")
        eng2 = engine_from_settings(spark, s_plain, **base)
        assert (
            eng2.find_paths("seriesByTag('name=disk.io','dc=')").collect() == []
        )  # without the flag, dc= means dc present-and-empty


def test_index_reverse_config():
    from graphite_clickhouse_spark.config import load_settings
    from graphite_clickhouse_spark.plans.glob import use_reverse

    s = load_settings(
        '[clickhouse]\nindex-reverse = "auto"\n'
        '[[clickhouse.index-reverses]]\nsuffix = ".sum"\nreverse = "direct"\n'
        '[[clickhouse.index-reverses]]\nprefix = "test2."\nreverse = "reversed"\n'
    )
    assert s.index_reverse == "auto"
    assert len(s.index_reverses) == 2
    # rules override the auto heuristic (finder/index_test.go:63-95)
    assert use_reverse("a*.b.c.d.sum", s.index_reverse, s.index_reverses) is False
    assert use_reverse("test2.b.c.d.e", s.index_reverse, s.index_reverses) is True


def test_try_split_query_config():
    from graphite_clickhouse_spark.config import load_settings

    s = load_settings(
        "[clickhouse]\ntry-split-query = true\nmax-node-to-split-index = 2\n"
    )
    assert s.try_split_query is True
    assert s.max_node_to_split_index == 2


class TestDataTableConfig:
    def test_routes_built_from_table_frames(self, spark):
        from graphite_clickhouse_spark.config import (
            engine_from_settings,
            load_settings,
        )

        conf = (
            '[[data-table]]\ntable = "hires"\nmax-age = "1h"\n'
            'target-match-all = "^app"\n'
            '[[data-table]]\ntable = "rollup"\nmin-age = "1h"\n'
            '[[data-table]]\ntable = "unmaterialized"\n'
        )
        settings = load_settings(conf)
        pts = spark.createDataFrame(
            [], "path string, value double, time long, version long")
        hires, roll = pts.limit(0), pts.limit(0)
        engine = engine_from_settings(
            spark, settings, pts,
            table_frames={"hires": hires, "rollup": roll},
        )
        assert len(engine.data_tables) == 2
        assert engine.data_tables[0].points is hires
        assert engine.data_tables[0].max_age == 3600
        assert engine.data_tables[0].target_match_all == "^app"
        assert engine.data_tables[1].min_age == 3600


class TestInlineTableNormalizer:
    """_join_inline_tables: Go-TOML lenient multi-line inline tables ->
    TOML 1.0 (tomllib); must not be confused by braces inside strings or
    comments."""

    def test_multiline_inline_tables_parse(self):
        from graphite_clickhouse_spark.config import load_settings

        s = load_settings(
            '[clickhouse]\n'
            'query-params = [\n'
            '  {\n'
            '    duration = "1h",\n'
            '    url = "http://x/?max_rows_to_read=1",\n'
            '    data-timeout = "5s"\n'
            '  },\n'
            '  { duration = "7h", data-timeout = "10s" }\n'
            ']\n'
        )
        tiers = s.render_tiers()
        assert [t[0] for t in tiers] == [3600, 7 * 3600]
        assert tiers[0][3].max_rows_to_read == 1

    def test_braces_in_strings_and_comments_untouched(self):
        from graphite_clickhouse_spark.config import (
            _join_inline_tables,
            load_settings,
        )

        txt = (
            '# note an unbalanced { brace in a comment\n'
            '[common]\n'
            'max-metrics-per-target = 7\n'
            '[clickhouse]\n'
            'extra-prefix = "ns{curly}"  # and } here\n'
        )
        # the comment's '{' must NOT open a fold region: line structure
        # survives and the document still parses
        assert _join_inline_tables(txt).count("\n") == txt.count("\n")
        s = load_settings(txt)
        assert s.max_metrics_per_target == 7
        assert s.prefix is not None and s.prefix.prefix == "ns{curly}"

    def test_escaped_quote_inside_basic_string(self):
        from graphite_clickhouse_spark.config import _join_inline_tables

        txt = 'a = "x\\"{y"\nb = 2\n'
        assert _join_inline_tables(txt) == txt


class TestQueryParamValidation:
    """config_test.go::TestGetQueryParamBroken + the config.go:602-618
    normalization rules."""

    def test_missing_duration_is_an_error(self):
        import pytest as _pytest

        from graphite_clickhouse_spark.config import load_settings

        with _pytest.raises(ValueError):
            load_settings(
                '[clickhouse]\nurl = "http://x/?max_rows_to_read=1000"\n'
                'query-params = [ { url = "http://x/?max_rows_to_read=2", '
                'data-timeout = "60s" } ]\n'
            )

    def test_tier_without_url_inherits_default_limits(self):
        from graphite_clickhouse_spark.config import load_settings

        s = load_settings(
            '[clickhouse]\nurl = "http://x/?max_rows_to_read=1000"\n'
            'query-params = [ { duration = "72h", data-timeout = "60s" } ]\n'
        )
        [tier] = s.query_params
        assert tier["limits"] is s.storage_limits  # reuse, not none
        s2 = load_settings(
            '[clickhouse]\nurl = "http://x/?max_rows_to_read=1000"\n'
            'query-params = [ { duration = "72h", '
            'url = "http://x/?max_rows_to_read=20000" } ]\n'
        )
        assert s2.query_params[0]["limits"] is not s2.storage_limits

    def test_concurrent_above_max_resets(self):
        from graphite_clickhouse_spark.config import load_settings

        s = load_settings(
            '[clickhouse]\nquery-params = [ { duration = "1h", '
            "max-queries = 2, concurrent-queries = 5 } ]\n"
        )
        assert s.query_params[0]["concurrent"] == 0
