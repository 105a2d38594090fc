"""Time/step arithmetic — driver-side, must be bit-compatible with the
reference because it changes result values.

Semantics sources (see SURVEY.md §2.4 A11, §2.5 W4):
- ceil/floor-to-multiplier, GCD/LCM: /root/reference/pkg/dry/math.go
- request alignment from=ceil(From,step), until=floor(Until,step)+step-1:
  /root/reference/render/data/query.go:417-420
- gap-fill grid bounds start=from-(from%step) rounded up,
  stop=until-(until%step)+step: /root/reference/helper/point/func.go:55-62
- common-step: LCM of per-metric steps, then maxDataPoints inflation
  step=max(lcm, ceil((until-from)/mdp)) rounded up to a multiple of lcm:
  /root/reference/render/data/query.go:381-415, common_step.go
"""

from __future__ import annotations

from math import gcd


def ceil_div(x: int, d: int) -> int:
    if x <= 0 or d <= 0:
        return 0
    return (x + d - 1) // d


def ceil_to_multiplier(x: int, m: int) -> int:
    return ceil_div(x, m) * m


def floor_to_multiplier(x: int, m: int) -> int:
    if x <= 0 or m <= 0:
        return 0
    return x // m * m


def lcm(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return abs(a // gcd(a, b) * b)


def lcm_many(steps: list[int]) -> int:
    out = 0
    for s in steps:
        out = s if out == 0 else lcm(out, s)
    return out


def common_step(
    steps: list[int],
    from_ts: int,
    until_ts: int,
    max_data_points: int,
    barrier_base: int = 0,
) -> int:
    """Final step for an aggregated fetch across metrics of one request.

    barrier_base carries the request-wide common-step barrier: the
    reference LCMs the per-timeframe step contributions of EVERY
    timeframe/target in a MultiTarget request through one shared
    commonStep (render/data/query.go:100-109 newQuery builds a single
    cStep for all conditions; setStep at :382-415 then rounds each
    timeframe's maxDataPoints-inflated step up to a multiple of the
    global LCM). 0 = single-group request, local LCM only.
    """
    base = lcm_many(steps)
    if barrier_base:
        base = lcm(base, barrier_base) if base else barrier_base
    if base <= 0:
        return 0
    step = max(base, ceil_div(until_ts - from_ts, max_data_points))
    return ceil_to_multiplier(step, base)


def max_step(steps: list[int]) -> int:
    """Unaggregated fetch uses max(steps) (query.go:386-392)."""
    return max(steps) if steps else 0


def align_from_until(from_ts: int, until_ts: int, step: int) -> tuple[int, int]:
    """Data-fetch window alignment (query.go:417-420)."""
    return ceil_to_multiplier(from_ts, step), floor_to_multiplier(until_ts, step) + step - 1


def fill_nulls_bounds(from_ts: int, until_ts: int, step: int) -> tuple[int, int, int]:
    """(start, stop, count) of the dense output grid (func.go:55-62).

    start = first multiple of step >= from; stop = floor(until,step)+step;
    count = (stop-start)/step. Buckets are [start, start+step, ...), value at
    bucket t aggregates points with t <= time < t+step.
    """
    start = from_ts - (from_ts % step)
    if start < from_ts:
        start += step
    stop = until_ts - (until_ts % step) + step
    return start, stop, (stop - start) // step
