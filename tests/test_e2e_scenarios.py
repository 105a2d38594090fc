"""Reference e2e scenario corpus, run generically from the original
test.toml files (SURVEY.md §5.2-5.3) — every (scenario, gch-template)
combination below executes ALL of the scenario's find/tags/render checks
against our ingest + merge + Engine pipeline.

Excluded scenario dirs and why: one_table (hand-ported in
test_e2e_one_table.py), find_cache (runs over HTTP in
test_e2e_find_cache.py — its checks assert X-Cached-Find headers),
limiter* (limiter infra has dedicated unit tests; checks are
timing-based), error_handling (proxy fault injection, runs over HTTP in
test_e2e_error_handling.py). tls runs BOTH here (engine-level checks)
and in test_e2e_tls.py (the same corpus over an mTLS channel using the
scenario's own certificates).
"""

from __future__ import annotations

import pytest

from e2e_toml import (
    ScenarioEngine,
    load_scenario,
    run_find_check,
    run_render_check,
    run_tags_check,
)

SCENARIOS = [
    "agg_internal",
    "agg_latest",
    "agg_merge",
    "agg_oneblock",
    "consolidateBy",
    "emptyseries_append",
    "emptyseries_noappend",
    "feature_flags_both_true",
    "feature_flags_dont_match_missing_tags",
    "feature_flags_false",
    "feature_flags_use_carbon_behaviour",
    "tags_min_in_query",
    "tls",
    "wildcard_min_distance",
    # GH issue #184 day-boundary regression corpus (midnight / 23h points,
    # daily index with date bounds, date-format=both)
    "issues/daytime",
]

# (scenario, template) pairs — scenarios with several gch templates run once
# per template, as the reference harness does (e2etesting.go:513-520)
PARAMS = []
for name in SCENARIOS:
    sc = load_scenario(name)
    for tpl in sc.templates:
        PARAMS.append(pytest.param(name, tpl.name, id=f"{name}-{tpl.name}"))


@pytest.fixture(scope="module")
def engines(spark):
    cache = {}

    def get(name: str, template: str) -> ScenarioEngine:
        key = (name, template)
        if key not in cache:
            sc = load_scenario(name)
            knobs = next(t for t in sc.templates if t.name == template)
            cache[key] = ScenarioEngine(spark, sc, knobs)
        return cache[key]

    return get


@pytest.mark.parametrize("name,template", PARAMS)
def test_scenario(name, template, engines):
    sc = load_scenario(name)
    se = engines(name, template)
    ran = 0
    for check in sc.cfg.get("find_checks", []):
        run_find_check(se, check, sc.precision)
        ran += 1
    for check in sc.cfg.get("tags_checks", []):
        run_tags_check(se, check, sc.precision)
        ran += 1
    for check in sc.cfg.get("render_checks", []):
        run_render_check(se, check, sc.precision)
        ran += 1
    assert ran > 0, "scenario had no checks"
