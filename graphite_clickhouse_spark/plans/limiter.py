"""Concurrency limiter — the reference's per-class request limiters
(limiter/limiter.go, limiter/wlimiter.go; doc/config.md:104-138) as a
driver-side primitive.

The reference gates render/find/tags requests through capacity-C
semaphores with a queue timeout (503 when saturated). In a Spark
deployment the same guard belongs on the driver in front of job
submission: Spark serializes scheduling, so unbounded concurrent HTTP
requests only pile up memory. Optionally maps each class to a fair
scheduler pool so small finds aren't starved by a huge render.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager


class LimitExceeded(Exception):
    """Mapped to HTTP 503 by callers (limiter/limiter.go Enter timeout)."""


class RequestLimiter:
    """Capacity + max-queue semaphore: at most `capacity` running, at most
    `max_queue` waiting up to `queue_timeout_sec` (0 queue = fail fast)."""

    def __init__(self, capacity: int, max_queue: int = 0, queue_timeout_sec: float = 60.0):
        self.capacity = capacity
        self.queue_timeout_sec = queue_timeout_sec
        self.max_queue = max_queue
        self._sem = threading.BoundedSemaphore(capacity)
        self._waiting = 0
        self._lock = threading.Lock()

    @contextmanager
    def enter(self):
        # fast path: a free slot needs no queueing
        if not self._sem.acquire(blocking=False):
            with self._lock:
                if self._waiting >= self.max_queue:
                    raise LimitExceeded("limiter queue full")
                self._waiting += 1
            try:
                acquired = self._sem.acquire(timeout=self.queue_timeout_sec)
            finally:
                with self._lock:
                    self._waiting -= 1
            if not acquired:
                raise LimitExceeded("limiter timeout")
        try:
            yield
        finally:
            self._sem.release()


class ClassLimiters:
    """Per-request-class limiters (render/find/tags), as the reference
    configures independently (doc/config.md:104-138)."""

    def __init__(self, render: int = 8, find: int = 16, tags: int = 16, **kw):
        self.render = RequestLimiter(render, **kw)
        self.find = RequestLimiter(find, **kw)
        self.tags = RequestLimiter(tags, **kw)
