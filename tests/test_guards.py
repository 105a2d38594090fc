"""Blacklist (P12), prefix namespace (P13), carbonlink union (S6/J4)."""

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
