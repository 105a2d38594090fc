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
