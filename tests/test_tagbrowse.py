"""Legacy `_tag` pseudo-tree browse (reference finder/tag.go WrapTag +
finder/tag_test.go TestTagsMakeSQL semantics, asserted as result sets
over a real (path, tags) frame instead of SQL text)."""

import pytest

from graphite_clickhouse_spark.plans.tagbrowse import (
    TAG_INFO_ROOT,
    TAG_LIST,
    TAG_LIST_PARAM,
    TAG_SERIES,
    TAG_SERIES_ROOT,
    is_tag_query,
    parse_tag_query,
    tag_browse_rows,
    tag_series_paths,
)


class TestParseTagQuery:
    """MakeSQL's parse states (tag.go:149-215) for every row of the
    TestTagsMakeSQL table."""

    def test_states(self):
        cases = {
            "_tag": TAG_INFO_ROOT,
            "_tag.*": TAG_LIST,
            "_tag.t1": TAG_LIST,
            "_tag.p1=": TAG_LIST_PARAM,
            # ANY last group with Param set lists in param mode
            # (finder/tag.go:195-199 checks only Param != nil)
            "_tag.p1=.*": TAG_LIST_PARAM,
            "_tag.p1=.v1": TAG_LIST_PARAM,
            "_tag.t2._tag.*": TAG_LIST,
            "_tag.t2._tag.t2._tag.p3=.*": TAG_LIST_PARAM,
            "_tag.t2.cpu.*": TAG_SERIES,
            "_tag.t2.*": TAG_SERIES_ROOT,
        }
        for q, want in cases.items():
            assert parse_tag_query(q).state == want, q

    def test_tag_q_decomposition(self):
        tb = parse_tag_query("_tag.t2._tag.p3=.a.cpu.load")
        assert [(q.param, q.value) for q in tb.tag_qs] == [
            (None, "t2"), ("p3=", "a")
        ]
        assert tb.series_query == "cpu.load"
        assert tb.tag_prefix == "_tag.t2._tag.p3=.a."

    def test_routing_guard(self):
        assert is_tag_query("_tag") and is_tag_query("_tag.x")
        assert not is_tag_query("_tags") and not is_tag_query("cpu.load")


@pytest.fixture(scope="module")
def tag_frame(spark):
    return spark.createDataFrame(
        [
            ("cpu.load", ["t2", "p3=a", "host=h1"]),
            ("mem.used", ["t2", "p3=b"]),
            ("disk.io", ["t1"]),
        ],
        "path string, tags array<string>",
    )


class TestTagBrowseRows:
    def _rows(self, frame, q):
        return tag_browse_rows(frame, parse_tag_query(q))

    def test_info_root(self, tag_frame):
        assert self._rows(tag_frame, "_tag") == [("_tag", False)]

    def test_list_all_tags(self, tag_frame):
        # `k=v` tags display as their `k=` branch node (tag.go:268-284)
        assert self._rows(tag_frame, "_tag.*") == [
            ("host=", False), ("p3=", False), ("t1", False), ("t2", False)
        ]

    def test_list_exact_tag(self, tag_frame):
        assert self._rows(tag_frame, "_tag.t1") == [("t1", False)]

    def test_list_param_prefix(self, tag_frame):
        # `_tag.p3=` lists VALUES of the p3 key (TagListParam)
        assert self._rows(tag_frame, "_tag.p3=") == [
            ("a", False), ("b", False)
        ]

    def test_list_param_with_value_stays_param_mode(self, tag_frame):
        # `_tag.p3=.a` (no trailing glob): reference lists the VALUE
        # branch 'a.' (state TagListParam because Param != nil), not the
        # key branch 'p3=.' (finder/tag.go:195-199 + List:268-284)
        assert self._rows(tag_frame, "_tag.p3=.a") == [("a", False)]
        # '*' value -> all values of the key, still value-branch display
        assert self._rows(tag_frame, "_tag.p3=.*") == [
            ("a", False), ("b", False)
        ]

    def test_nested_tag_groups(self, tag_frame):
        # paths with t2, list their p3= values
        assert self._rows(tag_frame, "_tag.t2._tag.p3=") == [
            ("a", False), ("b", False)
        ]
        # paths with t2 AND p3=a -> remaining tag listing
        assert self._rows(tag_frame, "_tag.t2._tag.p3=.a._tag.*") == [
            ("host=", False), ("p3=", False), ("t2", False)
        ]

    def test_series_glob(self, tag_frame):
        assert self._rows(tag_frame, "_tag.t2.cpu.*") == [("cpu.load", True)]
        assert self._rows(tag_frame, "_tag.t2._tag.p3=.b.*") == [
            ("mem.used", True), ("_tag", False)
        ]

    def test_series_root_appends_tag_node(self, tag_frame):
        rows = self._rows(tag_frame, "_tag.t2.*")
        assert rows == [
            ("cpu.load", True), ("mem.used", True), ("_tag", False)
        ]

    def test_series_paths_key_value_equality(self, tag_frame):
        got = sorted(
            r.path
            for r in tag_series_paths(
                tag_frame, parse_tag_query("_tag.p3=.a.*")
            ).collect()
        )
        assert got == ["cpu.load"]
        # '*' value matches any value of the key
        got = sorted(
            r.path
            for r in tag_series_paths(
                tag_frame, parse_tag_query("_tag.p3=.*.*")
            ).collect()
        )
        assert got == ["cpu.load", "mem.used"]


class TestEngineIntegration:
    @pytest.fixture(scope="class")
    def engine(self, spark, tag_frame_cls):
        from graphite_clickhouse_spark.render.pipeline import Engine
        from graphite_clickhouse_spark.sources.tables import build_path_index

        points = spark.createDataFrame(
            [("cpu.load", 1.0, 60, 1), ("mem.used", 2.0, 60, 1),
             ("disk.io", 3.0, 60, 1)],
            "path string, value double, time long, version long",
        )
        return Engine(
            spark=spark,
            points=points,
            path_index=build_path_index(points.select("path")),
            tag_table=tag_frame_cls,
        )

    @pytest.fixture(scope="class")
    def tag_frame_cls(self, spark):
        return spark.createDataFrame(
            [
                ("cpu.load", ["t2", "p3=a", "host=h1"]),
                ("mem.used", ["t2", "p3=b"]),
                ("disk.io", ["t1"]),
            ],
            "path string, tags array<string>",
        )

    def test_find_tree_routes_tag_queries(self, engine):
        from graphite_clickhouse_spark.render.pipeline import find_tree_rows

        assert find_tree_rows(engine, "_tag") == [("_tag", False)]
        assert ("p3=", False) in find_tree_rows(engine, "_tag.*")

    def test_root_query_prepends_tag_node(self, engine):
        from graphite_clickhouse_spark.render.pipeline import find_tree_rows

        rows = find_tree_rows(engine, "*")
        assert rows[0] == ("_tag", False)
        assert ("cpu", False) in rows  # the normal tree follows

    def test_render_fetches_real_paths_with_abs_display(self, engine):
        from graphite_clickhouse_spark.render.pipeline import RenderRequest

        out = engine.render(
            RenderRequest("_tag.t2.cpu.*", 0, 120, max_data_points=10)
        ).collect()
        assert [r.path for r in out] == ["_tag.t2.cpu.load"]
        assert any(v == 1.0 for r in out for v in r.values if v == v)

    def test_render_of_list_query_is_empty(self, engine):
        from graphite_clickhouse_spark.render.pipeline import RenderRequest

        out = engine.render(
            RenderRequest("_tag.t2", 0, 120, max_data_points=10)
        ).collect()
        assert out == []

    def test_render_multi_mixed_targets(self, engine):
        from graphite_clickhouse_spark.render.pipeline import RenderRequest

        reqs = [
            RenderRequest("_tag.t1.disk.*", 0, 120, max_data_points=10),
            RenderRequest("cpu.*", 0, 120, max_data_points=10),
        ]
        rows = engine.render_multi(reqs).collect()
        got = sorted((r.target, r.path) for r in rows)
        assert got == [
            ("_tag.t1.disk.*", "_tag.t1.disk.io"),
            ("cpu.*", "cpu.load"),
        ]


def test_config_tag_table_enables_browse(spark, tmp_path):
    """[clickhouse] tag-table points at the tagger's parquet output and
    switches the browse on (finder/finder.go:92-94 WrapTag activation)."""
    from graphite_clickhouse_spark.config import (
        engine_from_settings,
        load_settings,
    )
    from graphite_clickhouse_spark.pipeline.tagger import (
        parse_rules,
        tagged_table,
    )
    from graphite_clickhouse_spark.render.pipeline import find_tree_rows
    from graphite_clickhouse_spark.sources.tables import build_path_index

    points = spark.createDataFrame(
        [("cpu.load", 1.0, 60, 1), ("web.req", 2.0, 60, 1)],
        "path string, value double, time long, version long",
    )
    rules = parse_rules(
        '[[rule]]\nregexp = "^cpu\\\\."\ntags = ["sys", "kind=host"]\n'
    )
    out_dir = str(tmp_path / "graphite_tag")
    tagged_table(points.select("path"), rules).select(
        "path", "tags"
    ).write.parquet(out_dir)

    s = load_settings(f'[clickhouse]\ntag-table = "{out_dir}"\n')
    assert s.tag_table_path == out_dir
    eng = engine_from_settings(
        spark, s, points, path_index=build_path_index(points.select("path"))
    )
    assert eng.tag_table is not None
    assert find_tree_rows(eng, "_tag.*") == [("kind=", False), ("sys", False)]
    assert find_tree_rows(eng, "_tag.sys.cpu.*") == [("cpu.load", True)]
    # untagged engines never see _tag routing
    s2 = load_settings("")
    eng2 = engine_from_settings(
        spark, s2, points, path_index=build_path_index(points.select("path"))
    )
    rows = find_tree_rows(eng2, "*")
    assert ("_tag", False) not in rows


def test_extra_prefix_composes_with_tag_browse(spark):
    """Wrapper order Blacklist(Prefix(Tag(base))): with an extra-prefix
    configured, the stripped inner query drives the tag browse and the
    display composes prefix + tag head + path (finder/finder.go:92-97)."""
    from graphite_clickhouse_spark.plans.guards import PrefixFinder
    from graphite_clickhouse_spark.render.pipeline import (
        Engine,
        RenderRequest,
    )
    from graphite_clickhouse_spark.sources.tables import build_path_index

    points = spark.createDataFrame(
        [("cpu.load", 1.0, 60, 1)],
        "path string, value double, time long, version long",
    )
    tag_frame = spark.createDataFrame(
        [("cpu.load", ["t2"])], "path string, tags array<string>"
    )
    eng = Engine(
        spark=spark,
        points=points,
        path_index=build_path_index(points.select("path")),
        tag_table=tag_frame,
        prefix=PrefixFinder("pre"),
    )
    # resolution: prefixed display names, like every other find
    got = [r.path for r in eng.find_paths("pre._tag.t2.cpu.*").collect()]
    assert got == ["pre.cpu.load"]
    # render display: prefix stays outermost around the tag head
    out = eng.render(
        RenderRequest("pre._tag.t2.cpu.*", 0, 120, max_data_points=10)
    ).collect()
    assert [r.path for r in out] == ["pre._tag.t2.cpu.load"]


def test_parse_tag_query_fuzz_total():
    """The parser is total over arbitrary dot-queries: it never raises,
    the state is one of the five, tag_prefix is a '.'-terminated prefix
    of the query, and prefix + series_query reassembles the input for
    series states (the MakeSQL loop consumes whole '.'-groups)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(
        alphabet=st.sampled_from("ab*=_tg123"), min_size=0, max_size=6
    )
    query = st.lists(seg, min_size=1, max_size=8).map(".".join)

    @given(query)
    @settings(max_examples=400, deadline=None)
    def run(q):
        from graphite_clickhouse_spark.plans.tagbrowse import (
            TAG_INFO_ROOT,
            TAG_LIST,
            TAG_LIST_PARAM,
            TAG_SERIES,
            TAG_SERIES_ROOT,
            parse_tag_query,
        )

        tb = parse_tag_query(q)
        assert tb.state in (
            TAG_INFO_ROOT, TAG_LIST, TAG_LIST_PARAM, TAG_SERIES,
            TAG_SERIES_ROOT,
        )
        if tb.tag_prefix:
            assert tb.tag_prefix.endswith(".")
            assert (q + ".").startswith(tb.tag_prefix) or q.startswith(
                tb.tag_prefix
            )
        if tb.series_query:
            assert tb.tag_prefix + tb.series_query == q

    run()


class TestParseTagQueryFuzz:
    def test_parse_never_raises_and_prefix_reconstructs(self):
        """Parser discipline: parse_tag_query accepts ANY `_tag...` string
        without raising, lands in one of the five states, and the consumed
        tag_prefix + series remainder re-concatenates to the query."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from graphite_clickhouse_spark.plans.tagbrowse import (
            TAG_INFO_ROOT,
            TAG_LIST,
            TAG_LIST_PARAM,
            TAG_SERIES,
            TAG_SERIES_ROOT,
            parse_tag_query,
        )

        seg = st.text(
            st.sampled_from(list("abz01*=_?{}")), min_size=0, max_size=6
        )
        query = st.builds(
            lambda segs: "_tag" + "".join("." + s for s in segs),
            st.lists(seg, max_size=8),
        )

        @settings(max_examples=300, deadline=None)
        @given(query)
        def check(q):
            tb = parse_tag_query(q)
            assert tb.state in (
                TAG_INFO_ROOT, TAG_LIST, TAG_LIST_PARAM,
                TAG_SERIES, TAG_SERIES_ROOT,
            )
            if tb.state == TAG_INFO_ROOT:
                assert q == "_tag"
                return
            # the consumed prefix plus the series remainder is the query
            assert tb.tag_prefix + tb.series_query == q or (
                tb.series_query == ""
                and tb.tag_prefix.rstrip(".") == q.rstrip(".")
            ), (q, tb.tag_prefix, tb.series_query)
            # param mode iff the LAST group carries param
            # (finder/tag.go:195-199)
            if tb.series_query == "" and tb.tag_qs:
                assert (tb.state == TAG_LIST_PARAM) == (
                    tb.tag_qs[-1].param is not None
                )

        check()
