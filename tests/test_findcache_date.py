"""Find-cache TTL classes/keys + date-mode day boundaries (no Spark)."""

import os
import time

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
