"""Reference e2e scenarios that need the HTTP surface: find_cache (cache
behavior goldens) and the limiter* family (limits configured from the
original gch templates must not reject normal traffic).

find_cache: the e2e harness runs each check with cache_ttl > 0 TWICE and
asserts the second response carries X-Cached-Find == cache_ttl, and
in_cache=true checks hit on the FIRST try because an earlier check's
day-truncated key already covers them (cmd/e2e-test/checks.go:20-57,
e2etesting.go FindChecks loop). The find-cache config mirrors
graphite-clickhouse-cached.conf.tpl (default 300s / short 60s /
short-duration 240s / find-timeout 120s); the cache clock is pinned to
the corpus RNOW so TTL classing matches the goldens' relative specs.

limiter{a,max,w,wn}: same input/checks corpus, with the per-class
limiters (max-queries / concurrent-queries / adaptive-queries) parsed
from the scenario's ORIGINAL config template and active on the serving
path — sequential golden checks must all pass untouched (the saturation
behavior itself is unit-tested in test_request_limiter.py).
"""

from __future__ import annotations

import json
import math
import pickle
import urllib.parse
import urllib.request

import pytest

from e2e_toml import RNOW, REFERENCE_TESTS, ScenarioEngine, load_scenario, resolve_ts
from graphite_clickhouse_spark.config import load_settings
from graphite_clickhouse_spark.plans.findcache import CacheConfig, FindCache
from graphite_clickhouse_spark.server import serve_background


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read(), r.headers.get("X-Cached-Find")


def _assert_header(got: str | None, check: dict, attempt: int, ctx: str):
    """checks.go compareFindMatch: expected header is cache_ttl when the
    response must be cached (second attempt, or in_cache on the first)."""
    if "cache_ttl" not in check:
        return
    expect_cached = bool(check.get("in_cache")) or attempt == 2
    want = str(check["cache_ttl"]) if expect_cached else None
    assert got == want, f"{ctx} attempt {attempt}: X-Cached-Find {got} != {want}"


def run_http_find_checks(sc, base, attempts=(1,)):
    for check in sc.cfg.get("find_checks", []):
        q = urllib.parse.quote(check["query"])
        url = f"{base}/metrics/find?query={q}&format=pickle"
        for attempt in attempts:
            body, hdr = _get(url)
            got = sorted((m["metric_path"], bool(m["isLeaf"]))
                         for m in pickle.loads(body))
            want = sorted((r["path"], bool(r["is_leaf"]))
                          for r in check["result"])
            assert got == want, f"find {check['query']!r}: {got} != {want}"
            _assert_header(hdr, check, attempt, f"find {check['query']!r}")


def run_http_tags_checks(sc, base, attempts=(1,)):
    for check in sc.cfg.get("tags_checks", []):
        parts = check["query"].split(";")
        tag, exprs = parts[0], [p for p in parts[1:] if p]
        params = [("tag", tag)] + [("expr", e) for e in exprs]
        url = f"{base}/tags/autoComplete/values?" + urllib.parse.urlencode(params)
        for attempt in attempts:
            body, hdr = _get(url)
            assert json.loads(body) == list(check["result"])
            _assert_header(hdr, check, attempt, f"tags {check['query']!r}")


def run_http_render_checks(sc, base, attempts=(1,)):
    for check in sc.cfg.get("render_checks", []):
        from_ts = resolve_ts(check["from"], sc.precision)
        until_ts = resolve_ts(check["until"], sc.precision)
        params = urllib.parse.urlencode(
            [("target", t) for t in check["targets"]]
            + [("from", from_ts), ("until", until_ts), ("format", "json")]
        )
        url = f"{base}/render?{params}"
        for attempt in attempts:
            body, hdr = _get(url)
            got = sorted(json.loads(body)["metrics"], key=lambda m: m["name"])
            want = sorted(check["result"], key=lambda r: r["name"])
            assert [g["name"] for g in got] == [w["name"] for w in want]
            for g, w in zip(got, want):
                assert g["startTime"] == resolve_ts(w["start"], sc.precision)
                assert g["stopTime"] == resolve_ts(w["stop"], sc.precision)
                assert g["stepTime"] == w["step"]
                wv = [float(v) for v in w["values"]]
                gv = [float("nan") if v is None else v for v in g["values"]]
                assert len(gv) == len(wv), (g, w)
                for a, b in zip(gv, wv):
                    assert (math.isnan(a) and math.isnan(b)) or \
                        math.isclose(a, b, rel_tol=1e-9), (gv, wv)
            _assert_header(hdr, check, attempt,
                           f"render {check['targets']} {check['from']}")


# ------------------------------------------------------------ find_cache


@pytest.fixture(scope="module", params=[0, 1], ids=["cached", "internal-aggr"])
def served(spark, request):
    sc = load_scenario("find_cache")
    knobs = sc.templates[request.param]
    se = ScenarioEngine(spark, sc, knobs)
    # [common.find-cache] of the scenario's gch templates; clock pinned
    # to the corpus RNOW so short/default classing matches the goldens
    se.engine.find_cache = FindCache(
        CacheConfig(
            default_timeout_sec=300, short_timeout_sec=60,
            short_duration_sec=240, find_timeout_sec=120,
        ),
        now_fn=lambda: float(RNOW),
    )
    se.engine.tagged_autocomplete_days = 0  # window vs real now is moot
    srv, base = serve_background(se.engine)
    yield sc, base
    srv.shutdown()


def test_find_checks(served):
    sc, base = served
    run_http_find_checks(sc, base, attempts=(1, 2))


def test_tags_checks(served):
    sc, base = served
    run_http_tags_checks(sc, base, attempts=(1, 2))


def test_render_checks_cache_classes_and_key_sharing(served):
    """Each render check runs twice (second must be range-class cached);
    in_cache checks hit on try ONE because the preceding check's
    day-truncated key covers their slightly different range."""
    sc, base = served
    run_http_render_checks(sc, base, attempts=(1, 2))


# -------------------------------------------------------------- limiter*


LIMITER_SCENARIOS = ["limitera", "limitermax", "limiterw", "limiterwn"]


@pytest.fixture(scope="module", params=LIMITER_SCENARIOS)
def limited(spark, request):
    sc = load_scenario(request.param)
    knobs = sc.templates[0]
    se = ScenarioEngine(spark, sc, knobs)
    se.engine.tagged_autocomplete_days = 0
    # the scenario's ORIGINAL gch config template is valid TOML (the
    # {{ .VAR }} placeholders sit inside strings): parse it directly so
    # the exact limiter keys drive the serving path
    tpl = (REFERENCE_TESTS / request.param / knobs.name).read_text()
    settings = load_settings(tpl)
    srv, base = serve_background(se.engine, settings=settings)
    yield request.param, sc, base, srv
    srv.shutdown()


def test_limiter_scenario_checks_pass_under_limits(limited):
    name, sc, base, _srv = limited
    run_http_find_checks(sc, base)
    run_http_tags_checks(sc, base)
    run_http_render_checks(sc, base)


def test_limiter_wiring_matches_template(limited):
    from graphite_clickhouse_spark.plans.limiter import (
        AdaptiveLimiter,
        RequestLimiter,
    )

    name, _sc, _base, srv = limited
    lim = srv.RequestHandlerClass.limiters.render
    if name == "limitera":  # render-adaptive-queries > 0
        assert isinstance(lim, AdaptiveLimiter)
    else:
        assert isinstance(lim, RequestLimiter)
