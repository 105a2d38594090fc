"""Blacklist (P12), prefix namespace (P13), carbonlink union (S6/J4)."""

import pytest

from graphite_clickhouse_spark.plans.guards import (
    MATCHED,
    NOT_MATCHED,
    PARTIAL,
    Blacklist,
    PrefixFinder,
)


class TestBlacklist:
    def test_match_yields_empty(self):
        b = Blacklist([r"^secret\.", r"\.internal$"])
        assert b.matches("secret.metrics.cpu")
        assert b.matches("app.db.internal")
        assert not b.matches("app.public.cpu")

    def test_empty_blacklist(self):
        assert not Blacklist([]).matches("anything")


class TestPrefixFinder:
    def test_not_matched(self):
        p = PrefixFinder("graphite.prod")
        assert p.match("other.*").state == NOT_MATCHED

    def test_partial_returns_tree_node(self):
        p = PrefixFinder("graphite.prod")
        m = p.match("graphite")
        assert m.state == PARTIAL and m.part == "graphite."
        m2 = p.match("gra*.prod")
        assert m2.state == PARTIAL and m2.part == "graphite.prod."

    def test_matched_strips_prefix(self):
        p = PrefixFinder("graphite.prod")
        m = p.match("graphite.prod.app.*.cpu")
        assert m.state == MATCHED and m.inner_query == "app.*.cpu"

    def test_glob_nodes_match_prefix(self):
        p = PrefixFinder("graphite.prod")
        m = p.match("*.{prod,stage}.x")
        assert m.state == MATCHED and m.inner_query == "x"

    def test_attach(self):
        p = PrefixFinder("graphite.prod")
        assert p.attach("app.cpu") == "graphite.prod.app.cpu"

    def test_empty_prefix_passthrough(self):
        p = PrefixFinder("")
        m = p.match("a.b.*")
        assert m.state == MATCHED and m.inner_query == "a.b.*"
        assert p.attach("a.b") == "a.b"


class TestCarbonlinkUnion:
    def test_union_dedup_prefers_recent_version(self, spark):
        from graphite_clickhouse_spark.operators.dedup import dedup_versions
        from graphite_clickhouse_spark.streaming.ingest import points_with_recent

        storage = spark.createDataFrame(
            [("a.b", 60, 1.0, 100)], "path string, time long, value double, version long"
        )
        recent = spark.createDataFrame(
            [("a.b", 60, 9.0, 200), ("a.c", 60, 2.0, 200)],
            "path string, time long, value double, version long",
        )
        got = {
            (r.path, r.time): r.value
            for r in dedup_versions(points_with_recent(storage, recent)).collect()
        }
        assert got == {("a.b", 60): 9.0, ("a.c", 60): 2.0}


class TestStorageLimits:
    """URL read limits -> 403 scan guards (clickhouse.go:60-95; the
    error_handling scenario's max_rows_to_read=1 / max_memory_usage=1
    tiers)."""

    def test_from_url_parsing(self):
        from graphite_clickhouse_spark.plans.guards import StorageLimits

        lim = StorageLimits.from_url(
            "http://ch/?max_rows_to_read=500000000&max_result_bytes=1073741824"
            "&readonly=2&log_queries=1"
        )
        assert lim.max_rows_to_read == 500000000
        assert lim.max_result_bytes == 1073741824
        assert lim.max_memory_usage == 0
        # either per-query or per-user memory cap counts; smallest wins
        lim = StorageLimits.from_url(
            "http://ch/?max_memory_usage=100&max_memory_usage_for_user=50"
        )
        assert lim.max_memory_usage == 50
        assert StorageLimits.from_url("http://ch/?readonly=2") is None
        assert StorageLimits.from_url("") is None

    def test_rows_limit_trips_with_reference_message(self, spark):
        from graphite_clickhouse_spark.plans.guards import (
            StorageLimitError,
            StorageLimits,
        )

        df = spark.range(50).selectExpr("id as time")
        with pytest.raises(StorageLimitError) as ei:
            StorageLimits(max_rows_to_read=10).check_scan(df)
        # wording of helper/clickhouse/clickhouse_test.go:19-25
        assert str(ei.value).startswith(
            "Storage read limit for rows (controlled by 'max_rows_to_read' "
            "setting) exceeded, max rows: 10"
        )
        assert ei.value.http_status == 403

    def test_memory_limit_trips(self, spark):
        from graphite_clickhouse_spark.plans.guards import (
            StorageLimitError,
            StorageLimits,
        )

        df = spark.range(5)
        with pytest.raises(StorageLimitError) as ei:
            StorageLimits(max_memory_usage=1).check_scan(df)
        assert str(ei.value) == "Storage read limit for memory"

    def test_under_limit_passes(self, spark):
        from graphite_clickhouse_spark.plans.guards import StorageLimits

        StorageLimits(max_rows_to_read=100, max_memory_usage=1 << 30)\
            .check_scan(spark.range(5))
        StorageLimits().check_scan(spark.range(5))  # no caps -> no job


class TestPrefixFinderReferenceGoldens:
    """finder/prefix_test.go::TestPrefixFinderExecute, behaviorally."""

    def test_reference_table(self):
        from graphite_clickhouse_spark.plans.guards import (
            MATCHED,
            NOT_MATCHED,
            PARTIAL,
            PrefixFinder,
        )

        cases = [
            # (prefix, query, state, inner_query, part)
            ("ch", "*", PARTIAL, None, "ch."),
            ("ch.data", "*", PARTIAL, None, "ch."),
            ("ch.data", "ch.*", PARTIAL, None, "ch.data."),
            ("ch.data", "ch.data.*", MATCHED, "*", None),
            ("ch.data", "epta.*", NOT_MATCHED, None, None),
            ("ch.data", "ch.data._tag.daemon.h.hostname.top.cpu_avg",
             MATCHED, "_tag.daemon.h.hostname.top.cpu_avg", None),
            ("ch.data", "ch.d[a]", NOT_MATCHED, None, None),
            # malformed glob node: not-matched, never an exception
            # (prefix_test.go List "[bad regexp" row)
            ("hello", "[bad", NOT_MATCHED, None, None),
        ]
        for prefix, query, state, inner, part in cases:
            m = PrefixFinder(prefix).match(query)
            assert m.state == state, (prefix, query, m)
            if inner is not None:
                assert m.inner_query == inner, (prefix, query, m)
            if part is not None:
                assert m.part == part, (prefix, query, m)

    def test_abs_reattach(self):
        from graphite_clickhouse_spark.plans.guards import PrefixFinder

        assert PrefixFinder("hello").attach("world") == "hello.world"
