"""Feature-flag truth tables from the reference docs (doc/config.md:35-63)
— the exact example metrics and targets."""

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.plans.tagged import (
    FeatureFlags,
    parse_series_by_tag,
    tagged_predicate,
)


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        ("metric.two;env=prod", {"__name__": "metric.two", "env": "prod"}),
        (
            "metric.one;env=stage;dc=mydc1",
            {"__name__": "metric.one", "env": "stage", "dc": "mydc1"},
        ),
        (
            "metric.one;env=prod;dc=otherdc1",
            {"__name__": "metric.one", "env": "prod", "dc": "otherdc1"},
        ),
    ]
    return spark.createDataFrame(rows, "path string, tags map<string,string>")


def match(metrics, target, flags=FeatureFlags()):
    terms = parse_series_by_tag(target)
    pred = tagged_predicate(terms, F.col("tags"), flags=flags)
    return sorted(r.path for r in metrics.filter(pred).collect())


class TestUseCarbonBehaviour:
    def test_empty_eq_default_matches_nothing(self, metrics):
        assert match(metrics, "seriesByTag('dc=')") == []

    def test_empty_eq_carbon_matches_tagless(self, metrics):
        got = match(metrics, "seriesByTag('dc=')", FeatureFlags(use_carbon_behaviour=True))
        assert got == ["metric.two;env=prod"]


class TestDontMatchMissingTags:
    def test_ne_default_includes_missing(self, metrics):
        got = match(metrics, "seriesByTag('dc!=mydc1')")
        assert got == ["metric.one;env=prod;dc=otherdc1", "metric.two;env=prod"]

    def test_ne_flag_requires_tag(self, metrics):
        got = match(
            metrics, "seriesByTag('dc!=mydc1')", FeatureFlags(dont_match_missing_tags=True)
        )
        assert got == ["metric.one;env=prod;dc=otherdc1"]

    def test_notmatch_default_includes_missing(self, metrics):
        got = match(metrics, "seriesByTag('dc!=~otherdc')")
        assert got == ["metric.one;env=stage;dc=mydc1", "metric.two;env=prod"]

    def test_notmatch_flag_requires_tag(self, metrics):
        got = match(
            metrics, "seriesByTag('dc!=~otherdc')", FeatureFlags(dont_match_missing_tags=True)
        )
        assert got == ["metric.one;env=stage;dc=mydc1"]


class TestNeEmptyValue:
    def test_ne_empty_means_tag_present_nonempty(self, metrics):
        got = match(metrics, "seriesByTag('dc!=')")
        assert got == [
            "metric.one;env=prod;dc=otherdc1",
            "metric.one;env=stage;dc=mydc1",
        ]


class TestTaggedWhereReferenceSemantics:
    """finder/tagged_test.go::TestTaggedWhere, re-expressed behaviorally:
    the reference's vectors are ClickHouse WHERE strings; here each query
    form is evaluated against an in-memory tagged table and the MATCH SET
    must agree with what that WHERE selects. Error rows port directly."""

    SERIES = [
        ("rps?env=prod&host=a1", {"__name__": "rps", "env": "prod", "host": "a1"}),
        ("rps?env=dev&host=b2", {"__name__": "rps", "env": "dev", "host": "b2"}),
        ("cpu.usage?host=a1", {"__name__": "cpu.usage", "host": "a1"}),
        ("mem?host=a1&what=avg", {"__name__": "mem", "host": "a1", "what": "avg"}),
        ("mem?host=a1&what=max", {"__name__": "mem", "host": "a1", "what": "maxx"}),
        ("min?empty=", {"__name__": "min", "empty": ""}),
        ("value?what=avg", {"__name__": "value", "what": "avg"}),
        ("value?what=relax", {"__name__": "value", "what": "relax"}),
        ("value?other=1", {"__name__": "value", "other": "1"}),
    ]

    def _matches(self, spark, query):
        from pyspark.sql import functions as F

        from graphite_clickhouse_spark.plans.tagged import (
            parse_series_by_tag,
            tagged_predicate,
        )

        df = spark.createDataFrame(
            self.SERIES, "path string, tags map<string,string>"
        )
        terms = parse_series_by_tag(query)
        pred = tagged_predicate(terms, F.col("tags"))
        return sorted(r["path"] for r in df.filter(pred).collect())

    def test_error_rows(self, spark):
        import pytest as _pytest

        from graphite_clickhouse_spark.plans.tagged import (
            parse_series_by_tag,
            tagged_predicate,
        )

        for bad in ("seriesByTag()", "seriesByTag('')",
                    "seriesByTag('key=value)", "seriesByTag(key=value)",
                    "seriesByTag('name=m{in,ax')"):
            with _pytest.raises(Exception):
                terms = parse_series_by_tag(bad)
                from pyspark.sql import functions as F
                tagged_predicate(terms, F.col("tags"))

    def test_empty_terms_typed_400_beats_cost_guard(self, spark):
        # reference rejects empty seriesByTag at parse time
        # (tagged.go:433 ErrNotEnoughArgsSeriesByTag) BEFORE term counting:
        # with tags-min-in-query configured, an empty matcher list must
        # still raise the typed parse error (HTTP 400), not the costly-
        # series guard (403) — guard-order regression pinned per r8 ADVICE
        import pytest as _pytest

        from pyspark.sql import functions as F

        from graphite_clickhouse_spark.plans.tagged import (
            TaggedParseError,
            tagged_predicate,
        )

        with _pytest.raises(TaggedParseError):
            tagged_predicate([], F.col("tags"), min_positive_terms=1)
        with _pytest.raises(TaggedParseError):
            tagged_predicate([], F.col("tags"))

    def test_min_tags_enforced(self, spark):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from graphite_clickhouse_spark.plans.tagged import (
            parse_series_by_tag,
            tagged_predicate,
        )

        terms = parse_series_by_tag("seriesByTag('env=prod')")
        tagged_predicate(terms, F.col("tags"), min_positive_terms=1)
        with _pytest.raises(Exception):
            tagged_predicate(terms, F.col("tags"), min_positive_terms=2)

    def test_match_semantics(self, spark):
        # (query, expected paths) — expectations derived from the WHERE
        # strings in the reference table applied to SERIES
        cases = [
            ("seriesByTag('env=prod')", ["rps?env=prod&host=a1"]),
            ("seriesByTag('name=rps')",
             ["rps?env=dev&host=b2", "rps?env=prod&host=a1"]),
            # name=* : any series with a __name__ (all of them here)
            ("seriesByTag('name=*', 'host=a1')",
             ["cpu.usage?host=a1", "mem?host=a1&what=avg",
              "mem?host=a1&what=max", "rps?env=prod&host=a1"]),
            # unanchored regex gets a .* prefix: matches cpu.usage
            ("seriesByTag('name=~cpu.usage')", ["cpu.usage?host=a1"]),
            # ^-anchored alternation anchors the WHOLE group
            ("seriesByTag('name=~^cpu|mem')",
             ["cpu.usage?host=a1", "mem?host=a1&what=avg",
              "mem?host=a1&what=max"]),
            # wildcard value: what=* == tag exists
            ("seriesByTag('name=value','what=*')",
             ["value?what=avg", "value?what=relax"]),
            ("seriesByTag('name=value','what=*x')", ["value?what=relax"]),
            ("seriesByTag('name=value','what!=*x')",
             ["value?other=1", "value?what=avg"]),
            # empty regex == exists (grafana autocompletion workaround)
            ("seriesByTag('name=value','what=~')",
             ["value?what=avg", "value?what=relax"]),
            # ^value$ regex collapses to exact equality
            ("seriesByTag('name=mem','what=~^avg$')", ["mem?host=a1&what=avg"]),
            # brace values
            ("seriesByTag('name={avg,max}')", []),
            ("seriesByTag('name=m{in}')", ["min?empty="]),
            ("seriesByTag('name=m{in,em}')",
             ["mem?host=a1&what=avg", "mem?host=a1&what=max", "min?empty="]),
            ("seriesByTag('name=mem','what={avg,relax}')",
             ["mem?host=a1&what=avg"]),
            ("seriesByTag('name=mem','what!={avg,relax}')",
             ["mem?host=a1&what=max"]),
            # empty value matches the literal empty tag (carbon=false)
            ("seriesByTag('empty=')", ["min?empty="]),
            # ^-anchored alternation binds the WHOLE group: 'mem$'
            # alternative must match from the START (upstream emits
            # '^__name__=(cpu|mem$)'); naive rlike would let 'mem$'
            # match the 'relaxmem'-style suffix
            ("seriesByTag('what=~^avg|relax$')",
             ["mem?host=a1&what=avg", "value?what=avg", "value?what=relax"]),
            ("seriesByTag('name=value','what=~^ax$')", []),
        ]
        for query, want in cases:
            assert self._matches(spark, query) == want, query
