"""Service discovery (sd/ package) — ports of the reference's own tests.

TestWeight table: /root/reference/load_avg/load_avg_test.go (bit-exact).
TestNginx / TestNginxDC: /root/reference/sd/nginx/nginx_test.go — the
reference runs them against a real consul on 127.0.0.1:8500 behind the
`test_sd` build tag; here a faithful in-process consul KV fake (sorted
recurse listings, base64 values, flags, 404 on empty prefix) stands in,
so the scenarios run in CI.
TestNginxExpire: /root/reference/sd/nginx/tests/nginx_cleanup_test.go.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from graphite_clickhouse_spark.config import Settings, load_settings
from graphite_clickhouse_spark.sd import (
    KV,
    NginxSD,
    NotFoundError,
    Registrar,
    cleanup,
    new_sd,
    weight,
)
from graphite_clickhouse_spark.sd.nginx import split_node


class FakeConsulKV:
    """Just enough of consul's KV HTTP API for the nginx SD: PUT with
    ?flags, recursive GET (sorted, base64 values, 404 on no match),
    DELETE (200 regardless, like consul)."""

    def __init__(self):
        self.store: dict[str, tuple[bytes, int]] = {}
        store = self.store
        lock = threading.Lock()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _key(self):
                path = urlparse(self.path).path
                assert path.startswith("/v1/kv/")
                return path[len("/v1/kv/"):]

            def do_PUT(self):
                q = parse_qs(urlparse(self.path).query)
                flags = int(q.get("flags", ["0"])[0])
                body = self.rfile.read(
                    int(self.headers.get("Content-Length", 0))
                )
                with lock:
                    store[self._key()] = (body, flags)
                self._reply(200, b"true")

            def do_GET(self):
                q = parse_qs(urlparse(self.path).query, keep_blank_values=True)
                prefix = self._key()
                if "recurse" not in q:
                    prefix_keys = [prefix] if prefix in store else []
                else:
                    with lock:
                        prefix_keys = sorted(
                            k for k in store if k.startswith(prefix)
                        )
                if not prefix_keys:
                    self._reply(404, b"")
                    return
                out = [
                    {
                        "Key": k,
                        "Value": base64.b64encode(store[k][0]).decode(),
                        "Flags": store[k][1],
                    }
                    for k in prefix_keys
                ]
                self._reply(200, json.dumps(out).encode())

            def do_DELETE(self):
                with lock:
                    store.pop(self._key(), None)
                self._reply(200, b"true")

            def _reply(self, code, body):
                self.send_response(code)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()
        port = self.server.server_address[1]
        self.url = f"http://127.0.0.1:{port}/v1/kv/upstreams"

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def consul():
    kv = FakeConsulKV()
    yield kv
    kv.close()


HOST1, IP1 = "test_host1", "192.168.0.1"
HOST2, IP2 = "test_host2", "192.168.1.25"
PORT = ":9090"
DC1 = ["dc1", "dc2", "dc3"]
DC2 = ["dc2", "dc1", "dc3"]
CLOCK = lambda: 1682408721  # noqa: E731 — nginx_test.go pins timeNow


# --- load_avg.Weight: the reference's full test table -------------------

WEIGHT_TABLE = [
    # (weight, degraded_multiply, degraded_load, load, want)
    (100, 4, 1.0, 0, 200), (100, 4, 1.0, 0.1, 199),
    (100, 4, 1.0, 0.11, 199), (100, 4, 1.0, 0.2, 169),
    (100, 4, 1.0, 0.5, 130), (100, 4, 1.0, 0.9, 104),
    (100, 4, 1.0, 1, 100), (100, 4, 1.0, 1.1, 36),
    (100, 4, 1.0, 1.9, 12), (100, 4, 1.0, 2, 1),
    (100, 4, 1.0, 9, 1), (100, 4, 1.0, 10, 1), (100, 4, 1.0, 20, 1),
    (1000, 4, 1.0, 0, 2000), (1000, 4, 1.0, 0.1, 1999),
    (1000, 4, 1.0, 0.11, 1999), (1000, 4, 1.0, 0.2, 1698),
    (1000, 4, 1.0, 0.5, 1301), (1000, 4, 1.0, 0.9, 1045),
    (1000, 4, 1.0, 1, 1000), (1000, 4, 1.0, 1.1, 357),
    (1000, 4, 1.0, 1.9, 120), (1000, 4, 1.0, 2, 1),
    (1000, 4, 1.0, 3, 1), (1000, 4, 1.0, 4, 1), (1000, 4, 1.0, 9, 1),
    (1000, 4, 1.0, 10, 1), (1000, 4, 1.0, 20, 1),
    (100, 4, 0.8, 0, 200), (100, 4, 0.8, 0.8, 109),
    (100, 4, 0.8, 0.81, 50), (100, 4, 0.8, 0.9, 45),
    (100, 4, 0.8, 1, 40), (100, 4, 0.8, 1.1, 36),
    (100, 4, 0.8, 1.9, 12), (100, 4, 0.8, 2, 1), (100, 4, 0.8, 3, 1),
    (100, 4, 0.8, 4, 1), (100, 4, 0.8, 9, 1), (100, 4, 0.8, 10, 1),
    (100, 4, 0.8, 20, 1),
    (1000, 8, 0.8, 0, 2000), (1000, 8, 0.8, 0.8, 1096),
    (1000, 8, 0.8, 0.81, 188), (1000, 8, 0.8, 0.9, 143),
    (1000, 8, 0.8, 1, 97), (1000, 8, 0.8, 1.2, 18),
    (1000, 8, 0.8, 1.3, 1), (1000, 8, 0.8, 2, 1), (1000, 8, 0.8, 3, 1),
    (1000, 8, 0.8, 4, 1), (1000, 8, 0.8, 9, 1), (1000, 8, 0.8, 10, 1),
    (1000, 8, 0.8, 20, 1),
]


def test_weight_reference_table():
    for base, dm, dl, load, want in WEIGHT_TABLE:
        assert weight(base, dm, dl, load) == want, (base, dm, dl, load)


def test_weight_guards():
    # load_avg.go:20-22: zero weight / non-degrading multiplier floor at 1
    assert weight(0, 4, 1.0, 0.5) == 1
    assert weight(100, 1, 1.0, 0.5) == 1
    assert weight(100, 0.5, 1.0, 0.5) == 1


def test_split_node():
    assert split_node("dc1/host/1.2.3.4:9090") == ("dc1", "host", "1.2.3.4:9090", True)
    assert split_node("_/h/:9090") == ("_", "h", ":9090", True)
    assert split_node("toofew/only")[3] is False
    assert split_node("a/b/c/d")[3] is False


# --- nginx_test.go TestNginx (no datacenters) ---------------------------

def test_nginx_no_dc(consul):
    sd1 = NginxSD(consul.url, "graphite", HOST1, clock=CLOCK)
    sd2 = NginxSD(consul.url, "", HOST2, clock=CLOCK)  # "" -> graphite

    for sd in (sd1, sd2):
        with pytest.raises(NotFoundError):
            sd.list()

    sd1.update(IP1, PORT, None, 10)
    assert sd1.list() == ["_/test_host1/192.168.0.1:9090"]
    assert sd1.list_map() == {
        "_/test_host1/192.168.0.1:9090": '{"weight":10,"max_fails":0}'
    }

    sd2.update(IP2, PORT, None, 21)
    assert sd2.list_map() == {
        "_/test_host2/192.168.1.25:9090": '{"weight":21,"max_fails":0}'
    }

    # update in place
    sd2.update(IP2, PORT, None, 25)
    assert sd2.list_map() == {
        "_/test_host2/192.168.1.25:9090": '{"weight":25,"max_fails":0}'
    }

    # delete own record; the other hostname's survives
    sd2.delete(IP2, PORT, None)
    assert sd2.list() == []
    assert sd1.list_map() == {
        "_/test_host1/192.168.0.1:9090": '{"weight":10,"max_fails":0}'
    }

    # Nodes() sees every hostname in the namespace, sorted, with flags
    sd2.update(IP2, PORT, None, 25)
    sd2.update(IP1, PORT, None, 25)
    assert sd2.nodes() == [
        KV("_/test_host1/192.168.0.1:9090", '{"weight":10,"max_fails":0}', 1682408721),
        KV("_/test_host2/192.168.0.1:9090", '{"weight":25,"max_fails":0}', 1682408721),
        KV("_/test_host2/192.168.1.25:9090", '{"weight":25,"max_fails":0}', 1682408721),
    ]

    # Clear preserves the current listen address only
    sd2.clear(IP2, PORT)
    assert sd2.list_map() == {
        "_/test_host2/192.168.1.25:9090": '{"weight":25,"max_fails":0}'
    }

    sd1.clear("", "")
    assert sd1.list() == []
    sd2.clear("", "")
    with pytest.raises(NotFoundError):
        sd2.list()


# --- nginx_test.go TestNginxDC (primary + backups) ----------------------

def test_nginx_dc(consul):
    sd1 = NginxSD(consul.url, "", HOST1, clock=CLOCK)
    sd2 = NginxSD(consul.url, "graphite", HOST2, clock=CLOCK)

    sd1.update(IP1, PORT, DC1, 10)
    assert sorted(sd1.list()) == [
        "dc1/test_host1/192.168.0.1:9090",
        "dc2/test_host1/192.168.0.1:9090",
        "dc3/test_host1/192.168.0.1:9090",
    ]
    # first dc is the weighted primary, the rest nginx backups
    assert sd1.list_map() == {
        "dc1/test_host1/192.168.0.1:9090": '{"weight":10,"max_fails":0}',
        "dc2/test_host1/192.168.0.1:9090": '{"backup":1,"max_fails":0}',
        "dc3/test_host1/192.168.0.1:9090": '{"backup":1,"max_fails":0}',
    }

    sd2.update(IP2, PORT, DC2, 21)
    assert sd2.list_map() == {
        "dc2/test_host2/192.168.1.25:9090": '{"weight":21,"max_fails":0}',
        "dc1/test_host2/192.168.1.25:9090": '{"backup":1,"max_fails":0}',
        "dc3/test_host2/192.168.1.25:9090": '{"backup":1,"max_fails":0}',
    }

    sd2.delete(IP2, PORT, DC2)
    assert sd2.list() == []

    sd2.update(IP2, PORT, DC2, 25)
    sd2.update(IP1, PORT, DC2, 25)
    assert sd2.nodes() == [
        KV("dc1/test_host1/192.168.0.1:9090", '{"weight":10,"max_fails":0}', 1682408721),
        KV("dc1/test_host2/192.168.0.1:9090", '{"backup":1,"max_fails":0}', 1682408721),
        KV("dc1/test_host2/192.168.1.25:9090", '{"backup":1,"max_fails":0}', 1682408721),
        KV("dc2/test_host1/192.168.0.1:9090", '{"backup":1,"max_fails":0}', 1682408721),
        KV("dc2/test_host2/192.168.0.1:9090", '{"weight":25,"max_fails":0}', 1682408721),
        KV("dc2/test_host2/192.168.1.25:9090", '{"weight":25,"max_fails":0}', 1682408721),
        KV("dc3/test_host1/192.168.0.1:9090", '{"backup":1,"max_fails":0}', 1682408721),
        KV("dc3/test_host2/192.168.0.1:9090", '{"backup":1,"max_fails":0}', 1682408721),
        KV("dc3/test_host2/192.168.1.25:9090", '{"backup":1,"max_fails":0}', 1682408721),
    ]

    sd2.clear(IP2, PORT)
    assert sd2.list_map() == {
        "dc2/test_host2/192.168.1.25:9090": '{"weight":25,"max_fails":0}',
        "dc1/test_host2/192.168.1.25:9090": '{"backup":1,"max_fails":0}',
        "dc3/test_host2/192.168.1.25:9090": '{"backup":1,"max_fails":0}',
    }

    sd1.clear("", "")
    assert sd1.list() == []


# --- expiry cleanup (register.go Cleanup / nginx_cleanup_test.go) -------

def _sd_settings(url, expire=86400.0):
    s = Settings()
    s.sd_type = "nginx"
    s.sd_url = url
    s.sd_expire_sec = expire
    return s


def test_cleanup_expiry(consul):
    now = 1682408721 + 7200
    sd = NginxSD(consul.url, "graphite", HOST1, clock=CLOCK)  # stale reg
    sd.update(IP1, PORT, None, 10)
    fresh = NginxSD(consul.url, "graphite", HOST2, clock=lambda: now)
    fresh.update(IP2, PORT, None, 10)

    settings = _sd_settings(consul.url, expire=3600.0)
    # check-only lists the expired record, deletes nothing
    report = cleanup(settings, sd, check_only=True, now=now)
    assert [(n.key, a) for n, a in report] == [
        ("_/test_host1/192.168.0.1:9090", "expired"),
        ("_/test_host2/192.168.1.25:9090", ""),
    ]
    assert len(sd.nodes()) == 2

    # real pass deletes the stale one and keeps the fresh one
    report = cleanup(settings, sd, check_only=False, now=now)
    assert [(n.key, a) for n, a in report] == [
        ("_/test_host1/192.168.0.1:9090", "deleted"),
        ("_/test_host2/192.168.1.25:9090", ""),
    ]
    assert [n.key for n in sd.nodes()] == ["_/test_host2/192.168.1.25:9090"]

    # sd disabled or no expiry -> no-op (register.go:139)
    assert cleanup(Settings(), sd, check_only=False, now=now) == []


# --- the registration loop (register.go Register) -----------------------

def test_registrar_lifecycle(consul):
    settings = _sd_settings(consul.url)
    loads = iter([0.0, 0.5, 1.1])
    reg = Registrar(
        settings, ":9090",
        sd=NginxSD(consul.url, "graphite", "spark_host", clock=CLOCK),
        delay_sec=3600,  # loop never fires on its own in the test
        load_fn=lambda: next(loads),
        local_ip_fn=lambda: "10.0.0.5",
    )
    reg.start()
    try:
        # idle load 0.0 -> weight 2x base (200)
        assert reg.sd.list_map() == {
            "_/spark_host/10.0.0.5:9090": '{"weight":200,"max_fails":0}'
        }

        # next tick: load 0.5 -> 130
        reg.register_once()
        assert reg.sd.list_map() == {
            "_/spark_host/10.0.0.5:9090": '{"weight":130,"max_fails":0}'
        }

        # IP change: new record registered, old one deleted
        reg._local_ip_fn = lambda: "10.0.0.6"
        reg.register_once()
        assert reg.sd.list_map() == {
            "_/spark_host/10.0.0.6:9090": '{"weight":36,"max_fails":0}'
        }
    finally:
        reg.stop()
    # shutdown clears every record of this host (register.go:120-131)
    with pytest.raises(NotFoundError):
        reg.sd.list()


def test_registrar_explicit_listen_ip(consul):
    # listen "127.0.0.1:9090" (not ":port"): registered verbatim, no
    # local-IP probing (register.go:63-67 only fires for ":port")
    settings = _sd_settings(consul.url)
    reg = Registrar(
        settings, "127.0.0.1:9090",
        sd=NginxSD(consul.url, "graphite", "spark_host", clock=CLOCK),
        delay_sec=3600, load_fn=lambda: 1.0,
        local_ip_fn=lambda: pytest.fail("must not probe"),
    )
    reg.register_once()
    assert reg.sd.list() == ["_/spark_host/127.0.0.1:9090"]
    reg.sd.clear("", "")


def test_new_sd_rejects_unknown_type(consul):
    s = _sd_settings(consul.url)
    s.sd_type = "etcd"
    with pytest.raises(ValueError):
        new_sd(s, "h")


# --- config surface -----------------------------------------------------

def test_sd_config_parsing():
    s = load_settings(
        """
[common]
listen = ":9090"
service-discovery-type = "nginx"
service-discovery = "http://127.0.0.1:8500/v1/kv/upstreams"
service-discovery-ns = "graphite-test"
service-discovery-ds = ["dc1", "dc2"]
service-discovery-expire = "48h"
base_weight = 50
degraged-multiply = 8.0
degraged-load-avg = 0.8
"""
    )
    assert s.sd_type == "nginx"
    assert s.sd_url == "http://127.0.0.1:8500/v1/kv/upstreams"
    assert s.sd_namespace == "graphite-test"
    assert s.sd_dc == ("dc1", "dc2")
    assert s.sd_expire_sec == 48 * 3600
    assert s.base_weight == 50
    assert s.degraded_multiply == 8.0
    assert s.degraded_load == 0.8


def test_sd_config_defaults_applied():
    # config.go:779-799: ns "" -> graphite, expire floors at 24h,
    # weight/multiply/load fall back to 100/4.0/1.0
    s = load_settings(
        """
[common]
service-discovery-type = "nginx"
service-discovery = "http://c:8500/v1/kv/upstreams"
service-discovery-expire = "1h"
"""
    )
    assert s.sd_namespace == "graphite"
    assert s.sd_expire_sec == 86400.0
    assert (s.base_weight, s.degraded_multiply, s.degraded_load) == (100, 4.0, 1.0)


def test_sd_config_invalid_type():
    with pytest.raises(ValueError):
        load_settings('[common]\nservice-discovery-type = "zookeeper"\n')


def test_sd_disabled_by_default():
    s = load_settings("[common]\nlisten = \":9090\"\n")
    assert s.sd_url == ""


# --- CLI subcommands (graphite-clickhouse.go:95-300) --------------------

def test_cli_sd_commands(consul, tmp_path, capsys):
    from graphite_clickhouse_spark.__main__ import main

    conf = tmp_path / "gch.conf"
    conf.write_text(
        "[common]\n"
        'service-discovery-type = "nginx"\n'
        f'service-discovery = "{consul.url}"\n'
        'service-discovery-expire = "24h"\n'
    )
    sd = NginxSD(consul.url, "graphite", HOST1, clock=CLOCK)
    sd.update(IP1, PORT, None, 10)

    main(["--config", str(conf), "--sd-list"])
    out = capsys.readouterr().out
    assert "graphite/_/test_host1/192.168.0.1:9090" in out
    assert '{"weight":10,"max_fails":0}' in out
    assert "2023-04-25T" in out  # flags rendered as a UTC timestamp

    # sd-expired lists but keeps; sd-clean deletes (records are ancient)
    main(["--config", str(conf), "--sd-expired"])
    assert "expired" in capsys.readouterr().out
    assert len(sd.nodes()) == 1
    main(["--config", str(conf), "--sd-clean"])
    assert "deleted" in capsys.readouterr().out
    with pytest.raises(NotFoundError):
        sd.list()

    # sd-evict clears the named hostname's records
    sd.update(IP1, PORT, None, 10)
    main(["--config", str(conf), "--sd-evict", HOST1])
    with pytest.raises(NotFoundError):
        sd.list()
