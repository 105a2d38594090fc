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

import threading
import time as _time
from collections import OrderedDict
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
    """Bounded TTL+LRU map: key -> list of resolved paths."""

    def __init__(self, cfg: CacheConfig | None = None):
        self.cfg = cfg or CacheConfig()
        self._data: OrderedDict[str, tuple[float, list[str]]] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key: str, now: float | None = None) -> list[str] | None:
        now = _time.time() if now is None else now
        with self._lock:
            item = self._data.get(key)
            if item is None or item[0] <= now:
                if item is not None:
                    del self._data[key]
                self.misses += 1
                return None
            self._data.move_to_end(key)
            self.hits += 1
            return item[1]

    def set(self, key: str, paths: list[str], ttl_sec: int, now: float | None = None) -> None:
        now = _time.time() if now is None else now
        with self._lock:
            self._data[key] = (now + ttl_sec, list(paths))
            self._data.move_to_end(key)
            while len(self._data) > self.cfg.max_entries:
                self._data.popitem(last=False)

    def find_cached(
        self, from_ts: int, until_ts: int, target: str, now: float | None = None
    ) -> tuple[list[str] | None, str, int]:
        """One-shot probe: (paths-or-None, key, ttl) for a render/find
        request — the caller runs the real find on miss and `set`s."""
        now_ts = int(_time.time() if now is None else now)
        ttl_sec, klass = get_cache_timeout(now_ts, from_ts, until_ts, self.cfg)
        key = target_key(from_ts, until_ts, target, klass)
        return self.get(key, now), key, ttl_sec
