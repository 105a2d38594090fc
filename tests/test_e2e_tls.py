"""The reference's tls e2e scenario (/root/reference/tests/tls/) over an
encrypted mTLS channel using the scenario's OWN certificate chain.

In the reference the TLS hop sits between graphite-clickhouse and
ClickHouse ([clickhouse.tls]: ca-cert=tests/tls/ca.crt, client
cert/key, server-name=localhost; storage serves
tests/clickhouse/rollup_tls/server.{crt,key}). The Spark build has no
storage process boundary — the surviving encrypted hop is the serving
side, so this runner terminates mTLS on the engine's HTTP server with
the SAME certs in the SAME roles: the scenario's server cert + key on
the listener, ca.crt verifying the client certificate, and the client
connecting with client.{crt,key} and validating the server against
ca.crt for server-name localhost. Every find/tags/render golden of the
scenario then runs end-to-end through the encrypted channel.

(The scenario's checks also run engine-level in test_e2e_scenarios.py;
this file adds the transport.)
"""

from __future__ import annotations

import json
import math
import pickle
import ssl
import urllib.error
import urllib.parse
import urllib.request

import pytest

from e2e_toml import REFERENCE_TESTS, ScenarioEngine, load_scenario, resolve_ts
from graphite_clickhouse_spark.config import load_settings
from graphite_clickhouse_spark.server import serve_background

TLS_DIR = REFERENCE_TESTS / "tls"
SRV_DIR = REFERENCE_TESTS / "clickhouse" / "rollup_tls"


@pytest.fixture(scope="module")
def served(spark):
    sc = load_scenario("tls")
    se = ScenarioEngine(spark, sc, sc.templates[0])
    se.engine.tagged_autocomplete_days = 0
    settings = load_settings(
        "[common.tls]\n"
        f'cert = "{SRV_DIR}/server.crt"\n'
        f'key = "{SRV_DIR}/server.key"\n'
        f'ca-cert = "{TLS_DIR}/ca.crt"\n'
    )
    assert settings.server_tls is not None
    srv, base = serve_background(se.engine, settings=settings)
    ctx = ssl.create_default_context(cafile=str(TLS_DIR / "ca.crt"))
    ctx.check_hostname = False  # SAN covers 127.0.0.1 too; IP connect
    ctx.load_cert_chain(str(TLS_DIR / "client.crt"), str(TLS_DIR / "client.key"))
    yield sc, base.replace("http://", "https://"), ctx
    srv.shutdown()


def _get(url: str, ctx) -> bytes:
    with urllib.request.urlopen(url, timeout=120, context=ctx) as r:
        return r.read()


def test_handshake_requires_client_cert(served):
    _sc, base, _ctx = served
    bare = ssl.create_default_context(cafile=str(TLS_DIR / "ca.crt"))
    bare.check_hostname = False
    with pytest.raises((urllib.error.URLError, ssl.SSLError, OSError)):
        urllib.request.urlopen(f"{base}/alive", timeout=30, context=bare)


def test_find_checks_all_declared_formats(served):
    """Each find check runs in EVERY format its golden declares
    (`formats = ["pickle", "protobuf", "carbonapi_v3_pb"]`), decoded by
    the independent wire reader in tests/pbread.py."""
    import pbread

    sc, base, ctx = served
    for check in sc.cfg.get("find_checks", []):
        q = urllib.parse.quote(check["query"])
        extra = ""
        if "from" in check:
            extra = (f"&from={resolve_ts(check['from'], sc.precision)}"
                     f"&until={resolve_ts(check['until'], sc.precision)}")
        want = sorted((r["path"], bool(r["is_leaf"])) for r in check["result"])
        for fmt in check.get("formats", ["pickle"]):
            wire = {"carbonapi_v2_pb": "protobuf"}.get(fmt, fmt)
            body = _get(
                f"{base}/metrics/find?query={q}&format={wire}{extra}", ctx
            )
            if wire == "pickle":
                got = [(m["metric_path"], bool(m["isLeaf"]))
                       for m in pickle.loads(body)]
            elif wire == "protobuf":
                got = pbread.parse_find_v2(body)
            else:
                got = pbread.parse_find_v3(body)
            assert sorted(got) == want, (
                f"find {check['query']!r} [{fmt}]: {sorted(got)} != {want}"
            )


def test_tags_checks(served):
    sc, base, ctx = served
    for check in sc.cfg.get("tags_checks", []):
        parts = check["query"].split(";")
        params = urllib.parse.urlencode(
            [("tag", parts[0])] + [("expr", e) for e in parts[1:] if e]
        )
        body = _get(f"{base}/tags/autoComplete/values?{params}", ctx)
        assert json.loads(body) == list(check["result"]), check["query"]


def _values_close(gv, wv, ctx):
    assert len(gv) == len(wv), (ctx, gv, wv)
    for a, b in zip(gv, wv):
        assert (math.isnan(a) and math.isnan(b)) or math.isclose(
            a, b, rel_tol=1e-9
        ), (ctx, gv, wv)


def test_render_checks_all_declared_formats(served):
    """Each render check runs in every format its golden declares
    (json debug + protobuf v2 + pickle), goldens' per-format field
    subsets respected (v2 carries no path/consolidation; pickle carries
    pathExpression but no function)."""
    import pbread

    sc, base, ctx = served
    for check in sc.cfg.get("render_checks", []):
        from_ts = resolve_ts(check["from"], sc.precision)
        until_ts = resolve_ts(check["until"], sc.precision)
        want = sorted(check["result"], key=lambda r: r["name"])
        for fmt in check.get("formats", ["json"]):
            wire = {"carbonapi_v2_pb": "protobuf"}.get(fmt, fmt)
            params = urllib.parse.urlencode(
                [("target", t) for t in check["targets"]]
                + [("from", from_ts), ("until", until_ts), ("format", wire)]
            )
            body = _get(f"{base}/render?{params}", ctx)
            if wire == "json":
                series = [
                    {
                        "name": m["name"],
                        "start": m["startTime"],
                        "stop": m["stopTime"],
                        "step": m["stepTime"],
                        "values": [
                            float("nan") if v is None else v
                            for v in m["values"]
                        ],
                    }
                    for m in json.loads(body)["metrics"]
                ]
            elif wire == "protobuf":
                series = pbread.parse_render_v2(body)
            else:
                series = [
                    {
                        "name": m["name"],
                        "path": m["pathExpression"],
                        "start": m["start"],
                        "stop": m["end"],
                        "step": m["step"],
                        "values": [
                            float("nan") if v is None else v
                            for v in m["values"]
                        ],
                    }
                    for m in pickle.loads(body)
                ]
            series.sort(key=lambda m: m["name"])
            ctx_s = f"render {check['targets']} [{fmt}]"
            assert [g["name"] for g in series] == [w["name"] for w in want], (
                ctx_s, [g["name"] for g in series]
            )
            for g, w in zip(series, want):
                assert g["start"] == resolve_ts(w["start"], sc.precision), ctx_s
                assert g["stop"] == resolve_ts(w["stop"], sc.precision), ctx_s
                assert g["step"] == w["step"], ctx_s
                if wire == "pickle" and "path" in w:
                    assert g["path"] == w["path"], ctx_s
                _values_close(
                    g["values"], [float(v) for v in w["values"]], ctx_s
                )
