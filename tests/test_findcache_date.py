"""Find-cache TTL classes/keys + date-mode day boundaries (no Spark)."""

import os
import time

import pytest

from graphite_clickhouse_spark.functions.date import (
    date_bounds,
    date_default,
    date_max,
    date_min,
    date_utc,
)
from graphite_clickhouse_spark.plans.findcache import (
    CacheConfig,
    FindCache,
    get_cache_timeout,
    target_key,
)

NOW = 1_700_000_000


class TestCacheTimeout:
    def test_short_for_live_queries(self):
        cfg = CacheConfig()
        ttl, klass = get_cache_timeout(NOW, NOW - 3600, NOW - 10, cfg)
        assert (ttl, klass) == (cfg.short_timeout_sec, "short")

    def test_default_for_long_ranges(self):
        cfg = CacheConfig()
        ttl, klass = get_cache_timeout(NOW, NOW - 7 * 86400, NOW, cfg)
        assert (ttl, klass) == (cfg.default_timeout_sec, "default")

    def test_default_for_old_until(self):
        cfg = CacheConfig()
        ttl, klass = get_cache_timeout(NOW, NOW - 7200, NOW - 3600, cfg)
        assert (ttl, klass) == (cfg.default_timeout_sec, "default")

    def test_short_disabled(self):
        cfg = CacheConfig(short_duration_sec=0)
        ttl, klass = get_cache_timeout(NOW, NOW - 60, NOW, cfg)
        assert klass == "default"


class TestFindCache:
    def test_roundtrip_and_expiry(self):
        c = FindCache()
        key = target_key(0, 86400, "a.*", "default")
        assert c.get(key, now=100) is None
        c.set(key, ["a.b", "a.c"], ttl_sec=60, now=100)
        assert c.get(key, now=150) == ["a.b", "a.c"]
        assert c.get(key, now=161) is None  # expired

    def test_day_truncated_keys_shared(self):
        # two requests within the same day-span share a key
        k1 = target_key(1700000000, 1700003600, "a.*", "short")
        k2 = target_key(1700000500, 1700004100, "a.*", "short")
        assert k1 == k2

    def test_lru_bound(self):
        c = FindCache(CacheConfig(max_entries=2))
        for i in range(3):
            c.set(f"k{i}", [str(i)], 600, now=100)
        assert c.get("k0", now=101) is None  # evicted
        assert c.get("k2", now=101) == ["2"]

    def test_find_cached_probe(self):
        c = FindCache()
        paths, key, ttl = c.find_cached(NOW - 60, NOW, "x.*", now=NOW)
        assert paths is None and "ttl=short" in key
        c.set(key, ["x.y"], ttl, now=NOW)
        paths2, _, _ = c.find_cached(NOW - 60, NOW, "x.*", now=NOW + 1)
        assert paths2 == ["x.y"]


class TestDateModes:
    def test_utc(self):
        assert date_utc(0) == "1970-01-01"
        assert date_utc(86399) == "1970-01-01"
        assert date_utc(86400) == "1970-01-02"

    def test_both_bounds_cover_default_and_utc(self):
        ts = 1700000000
        lo, hi = date_bounds(ts, ts, "both")
        assert lo <= date_utc(ts) <= hi
        assert lo <= date_default(ts) <= hi
        assert date_min(ts) == lo and date_max(ts) == hi

    def test_modes_dispatch(self):
        ts = 1700000000
        assert date_bounds(ts, ts, "utc") == (date_utc(ts), date_utc(ts))
        assert date_bounds(ts, ts, "default") == (date_default(ts), date_default(ts))


# -------------------------------------------------- pluggable backends


class _FakeMemcached:
    """Tiny in-test memcached TEXT-protocol server (get/set only)."""

    def __init__(self):
        import socket
        import threading

        self.store = {}
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        import time

        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            f = conn.makefile("rb")
            while True:
                line = f.readline()
                if not line:
                    break
                parts = line.strip().split()
                if parts and parts[0] == b"set":
                    key, _fl, exp, n = parts[1], parts[2], int(parts[3]), int(parts[4])
                    data = f.read(n)
                    f.read(2)
                    self.store[key] = (time.time() + exp, data)
                    conn.sendall(b"STORED\r\n")
                elif parts and parts[0] == b"get":
                    key = parts[1]
                    item = self.store.get(key)
                    if item and item[0] > time.time():
                        conn.sendall(
                            b"VALUE " + key + b" 0 " + str(len(item[1])).encode()
                            + b"\r\n" + item[1] + b"\r\nEND\r\n"
                        )
                    else:
                        conn.sendall(b"END\r\n")
            conn.close()

    def close(self):
        self._stop = True
        self.sock.close()


@pytest.fixture(params=["mem", "memcached"])
def backend(request):
    from graphite_clickhouse_spark.plans.cachebackend import (
        MemBackend,
        MemcachedBackend,
    )

    if request.param == "mem":
        yield MemBackend(64)
    else:
        srv = _FakeMemcached()
        yield MemcachedBackend((f"127.0.0.1:{srv.port}",))
        srv.close()


class TestBackends:
    def test_findcache_roundtrip_over_backend(self, backend):
        c = FindCache(CacheConfig(), backend=backend)
        c.set("k1", ["a.b", "a.c"], ttl_sec=60)
        assert c.get("k1") == ["a.b", "a.c"]
        assert c.get("nope") is None
        assert c.hits == 1 and c.misses == 1

    def test_bytes_roundtrip(self, backend):
        backend.set("key with spaces and ünïcode", b"\x00\xffbin", 60)
        assert backend.get("key with spaces and ünïcode") == b"\x00\xffbin"
        assert backend.get("missing") is None

    def test_config_wires_backend_type(self):
        from graphite_clickhouse_spark.config import load_settings
        from graphite_clickhouse_spark.plans.cachebackend import MemBackend

        conf = (
            '[common.find-cache]\ntype = "mem"\ndefault-timeout = 600\n'
        )
        s = load_settings(conf)
        assert s.find_cache.cache_type == "mem"
        assert isinstance(FindCache(s.find_cache).backend, MemBackend)
        conf2 = (
            '[common.find-cache]\ntype = "memcached"\n'
            'memcached-servers = ["127.0.0.1:11211"]\ndefault-timeout = 600\n'
        )
        s2 = load_settings(conf2)
        assert s2.find_cache.cache_type == "memcached"
        assert s2.find_cache.memcached_servers == ("127.0.0.1:11211",)

    def test_memcached_down_is_soft_miss(self):
        from graphite_clickhouse_spark.plans.cachebackend import (
            MemcachedBackend,
        )

        b = MemcachedBackend(("127.0.0.1:1",), timeout_sec=0.2)
        b.set("k", b"v", 60)  # must not raise
        assert b.get("k") is None


def test_utc_days_reference_vectors():
    """helper/date/date_test.go timestamps, UTC mode (the reference's
    default-mode rows depend on the host tz — the documented GH-184
    hazard its own comments call 'broken'; utc mode is the fixed path
    and what this engine pins)."""
    from graphite_clickhouse_spark.functions.date import date_utc

    assert date_utc(1668106870) == "2022-11-10"  # 19:01:10Z
    assert date_utc(1668124800) == "2022-11-11"  # midnight UTC
    assert date_utc(1668142799) == "2022-11-11"  # 04:59:59Z
    assert date_utc(1650776160) == "2022-04-24"  # issue #184 vector


def test_get_cache_timeout_reference_table():
    """render/handler_test.go::Test_getCacheTimeout verbatim (short TTL
    for live queries: range <= short-duration AND until within
    short-until-offset of now; else the default TTL)."""
    from graphite_clickhouse_spark.plans.findcache import (
        CacheConfig,
        get_cache_timeout,
    )

    cfg = CacheConfig(
        short_timeout_sec=60, default_timeout_sec=300,
        short_duration_sec=3 * 3600, short_until_offset_sec=120,
    )
    now = 1636985018
    table = [  # (from, until, want)
        (now - 600, now - 120, 60),
        (now - 10800, now, 60),
        (now - 10800, now - 120, 60),
        (now - 10800, now - 121, 300),
        (now - 10801, now, 300),
    ]
    for frm, until, want in table:
        got, _cls = get_cache_timeout(now, frm, until, cfg)
        assert got == want, (frm - now, until - now, got, want)
