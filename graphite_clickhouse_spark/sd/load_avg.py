"""Normalized load average and the registration weight curve
(load_avg/load_avg.go, load_avg/load_avg_linux.go).

`weight()` is a bit-exact port validated against the reference's own
TestWeight table (load_avg/load_avg_test.go) — including the Go-specific
float detail that math.Log10(x) is computed as Log(x)*(1/Ln10), which
differs from libm log10 in the last ulp and changes the truncated result
(e.g. load 0.1 yields 199, not 200, at base weight 100).
"""

from __future__ import annotations

import math
import os
import threading

_store_lock = threading.Lock()
_stored = 0.0


def store(value: float) -> None:
    """load_avg.Store — latest normalized load, shared with the adaptive
    limiters."""
    global _stored
    with _store_lock:
        _stored = value


def load() -> float:
    """load_avg.Load."""
    with _store_lock:
        return _stored


def normalized_load() -> float:
    """1-minute load average divided by CPU count
    (load_avg_linux.go:14-31). Raises OSError where unsupported, like the
    reference's error return."""
    la = os.getloadavg()[0]
    cpus = os.cpu_count() or 1
    return la / cpus


def weight(base: int, degraded_multiply: float, degraded_load: float,
           normalized: float) -> int:
    """load_avg.Weight(weight, degraged, degragedLoadAvg, load):
    2x base when idle, log-decay toward base as load approaches 1.0 CPU,
    sharp penalty (the degraded multiplier) past `degraded_load`, floor 1
    from 2.0 upward."""
    if base <= 0 or degraded_multiply <= 1 or normalized >= 2.0:
        return 1
    if normalized > degraded_load:
        normalized *= degraded_multiply
    # Go math.Round: half away from zero (loads are non-negative here)
    normalized = math.floor(10 * normalized + 0.5) / 10
    if normalized == 0:
        return 2 * base
    normalized = math.log(normalized) * (1 / math.log(10))  # Go math.Log10
    w = base - int(base * normalized)
    if w <= 0:
        return 1
    return w
