"""Find-result cache — the reference's find-cache ported driver-side
(render/handler.go:41-142, config find-cache, doc/config.md:8-33).

Caches RESOLVED PATH LISTS (the find step's output), not points: finds hit
the small index table but dominate interactive latency; point data is
always fetched fresh. Two TTL classes, exactly as the reference:

- short TTL for "live" queries (short range AND until close to now) —
  their results change as new metrics appear;
- default TTL otherwise (historical ranges are stable).

Keys truncate from/until to DAYS (targetKey, render/handler.go:41-43): any
request within the same day-span for the same target shares an entry.

In a Spark deployment this lives in the long-running driver process, the
same place the reference keeps its in-memory cache. Thread-safe; LRU
bounded.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass
from datetime import datetime, timezone


@dataclass(frozen=True)
class CacheConfig:
    """Defaults mirror doc/config.md find-cache sample."""

    default_timeout_sec: int = 600
    short_timeout_sec: int = 60
    short_duration_sec: int = 3 * 3600  # ranges up to this use the short class
    short_until_offset_sec: int = 120  # 'until' within this of now = live query
    max_entries: int = 65536
    #: TTL for /metrics/find and autocomplete requests (the reference's
    #: separate find-timeout class, find/handler.go:149); 0 -> default
    find_timeout_sec: int = 0
    #: backend: "mem" (in-process) or "memcached" (shared across
    #: replicas — the reference's MemcachedCache, cache.go:43-85)
    cache_type: str = "mem"
    memcached_servers: tuple = ()


def get_cache_timeout(
    now_ts: int, from_ts: int, until_ts: int, cfg: CacheConfig
) -> tuple[int, str]:
    """(timeout_sec, class) — getCacheTimeout, render/handler.go:46-59."""
    if cfg.short_duration_sec == 0:
        return cfg.default_timeout_sec, "default"
    duration = until_ts - from_ts
    if duration > cfg.short_duration_sec or now_ts - until_ts > cfg.short_until_offset_sec:
        return cfg.default_timeout_sec, "default"
    return cfg.short_timeout_sec, "short"


def _day(ts: int) -> str:
    return datetime.fromtimestamp(ts, tz=timezone.utc).strftime("%Y-%m-%d")


def target_key(from_ts: int, until_ts: int, target: str, ttl: str) -> str:
    """targetKey, render/handler.go:41-43 (day-truncated bounds)."""
    return f"{_day(from_ts)};{_day(until_ts)};{target};ttl={ttl}"


class FindCache:
    """Find-result cache over a pluggable byte backend (mem/memcached,
    plans/cachebackend.py). Values are JSON-encoded path lists; key
    shape and TTL classes live here, storage there — same split as
    the reference's BytesCache interface (cache.go:10-20)."""

    def __init__(self, cfg: CacheConfig | None = None, backend=None,
                 now_fn=None):
        from .cachebackend import make_backend

        self.cfg = cfg or CacheConfig()
        self.backend = backend if backend is not None else make_backend(
            self.cfg.cache_type, tuple(self.cfg.memcached_servers),
            self.cfg.max_entries,
        )
        #: clock used for TTL classing and expiry when callers pass no
        #: explicit now (overridable for harnesses pinned to a fixed now)
        self._now = now_fn or _time.time
        self.hits = 0
        self.misses = 0

    def get(self, key: str, now: float | None = None) -> list[str] | None:
        import json

        raw = self.backend.get(key, self._now() if now is None else now)
        if raw is None:
            self.misses += 1
            return None
        try:
            paths = json.loads(raw)
        except ValueError:
            self.misses += 1
            return None
        self.hits += 1
        return paths

    def set(self, key: str, paths: list[str], ttl_sec: int, now: float | None = None) -> None:
        import json

        self.backend.set(
            key, json.dumps(list(paths)).encode(), ttl_sec,
            self._now() if now is None else now,
        )

    def find_cached(
        self, from_ts: int, until_ts: int, target: str, now: float | None = None
    ) -> tuple[list[str] | None, str, int]:
        """One-shot probe: (paths-or-None, key, ttl) for a render/find
        request — the caller runs the real find on miss and `set`s."""
        now_ts = int(self._now() if now is None else now)
        ttl_sec, klass = get_cache_timeout(now_ts, from_ts, until_ts, self.cfg)
        key = target_key(from_ts, until_ts, target, klass)
        return self.get(key, now), key, ttl_sec

    def find_request_cached(
        self, from_ts: int, until_ts: int, key_base: str,
        now: float | None = None,
    ) -> tuple[list[str] | None, str, int]:
        """Probe for /metrics/find and autocomplete requests, which use
        the dedicated find-timeout TTL class (find/handler.go:136-149,
        autocomplete.go:315-321) instead of the range-based classes."""
        ttl_sec = self.cfg.find_timeout_sec or self.cfg.default_timeout_sec
        key = target_key(from_ts, until_ts, key_base, "find")
        return self.get(key, now), key, ttl_sec

    @property
    def find_timeout_sec(self) -> int:
        return self.cfg.find_timeout_sec or self.cfg.default_timeout_sec
