"""Step math — bit-compatibility cases from pkg/dry/math.go and
render/data/query.go:381-420 semantics."""

from graphite_clickhouse_spark.functions.timemath import (
    align_from_until,
    ceil_to_multiplier,
    common_step,
    fill_nulls_bounds,
    floor_to_multiplier,
    lcm,
    max_step,
)


def test_ceil_floor():
    assert ceil_to_multiplier(10, 60) == 60
    assert ceil_to_multiplier(60, 60) == 60
    assert ceil_to_multiplier(61, 60) == 120
    assert floor_to_multiplier(61, 60) == 60
    assert floor_to_multiplier(60, 60) == 60
    # reference returns 0 for non-positive inputs
    assert ceil_to_multiplier(0, 60) == 0
    assert floor_to_multiplier(-5, 60) == 0


def test_lcm():
    assert lcm(10, 60) == 60
    assert lcm(30, 45) == 90
    assert lcm(7, 13) == 91


def test_common_step_lcm_and_mdp():
    # steps 10 & 60 -> lcm 60; window 1h, mdp huge -> 60
    assert common_step([10, 60], 0, 3600, 1_000_000) == 60
    # mdp forces inflation: 1h window, 10 points max -> 360, ceil to mult of 60
    assert common_step([10, 60], 0, 3600, 10) == 360
    # non-divisible inflation rounds up to the next multiple
    assert common_step([60], 0, 3600, 7) == 540  # ceil(3600/7)=515 -> 540
    assert max_step([10, 60, 30]) == 60


def test_align_and_grid():
    from_al, until_al = align_from_until(95, 247, 60)
    assert (from_al, until_al) == (120, 240 + 59)
    start, stop, count = fill_nulls_bounds(120, 299, 60)
    assert (start, stop, count) == (120, 300, 3)
    # from not on boundary rounds up
    start, stop, count = fill_nulls_bounds(121, 299, 60)
    assert (start, stop, count) == (180, 300, 2)


def test_fill_nulls_bounds_reference_vectors():
    """The grid vectors of helper/point/func_test.go TestFillNulls —
    the authority the wire-format goldens also lean on."""
    # "shorter with NaNs": from=1 until=13 step=2
    assert fill_nulls_bounds(1, 13, 2) == (2, 14, 6)
    # "longer than time interval, but wrong step": from=2 until=7 step=1
    assert fill_nulls_bounds(2, 7, 1) == (2, 8, 6)
    # wire-golden vectors (v2/v3_pb_test.go writer inputs)
    assert fill_nulls_bounds(4, 13, 5) == (5, 15, 2)
    assert fill_nulls_bounds(1, 5, 1) == (1, 6, 5)


def test_common_step_reference_vector():
    # render/data/common_step_test.go: contributions {0, 6, 8, 10}
    # converge on LCM = 120 (the zero contribution adds nothing)
    from graphite_clickhouse_spark.functions.timemath import common_step

    assert common_step([6, 8, 10], 0, 60, 1_000_000) == 120
    assert common_step([0, 6, 8, 10], 0, 60, 1_000_000) == 120


def test_dry_math_reference_table():
    """pkg/dry/math_test.go ported verbatim: zero/negative divisor and
    negative-operand edge behavior of the scalar helpers."""
    from math import gcd

    from graphite_clickhouse_spark.functions.timemath import (
        ceil_div,
        ceil_to_multiplier,
        floor_to_multiplier,
        lcm,
    )

    assert ceil_div(0, -1) == 0
    assert ceil_div(5, 2) == 3
    assert ceil_div(5, 5) == 1
    assert ceil_div(100001, 100000) == 2

    assert ceil_to_multiplier(0, -1) == 0
    assert ceil_to_multiplier(1, 0) == 0
    assert ceil_to_multiplier(1, -1) == 0
    assert ceil_to_multiplier(1, 2) == 2
    assert ceil_to_multiplier(4, 3) == 6
    assert ceil_to_multiplier(6, 3) == 6

    assert floor_to_multiplier(0, -1) == 0
    assert floor_to_multiplier(1, 0) == 0
    assert floor_to_multiplier(1, -1) == 0
    assert floor_to_multiplier(1, 2) == 0
    assert floor_to_multiplier(4, 3) == 3
    assert floor_to_multiplier(6, 3) == 6

    assert gcd(1, -1) == 1 and gcd(-1, 1) == 1 and gcd(-1, -1) == 1
    assert gcd(1, 2) == 1 and gcd(4, 3) == 1 and gcd(6, 3) == 3

    assert lcm(1, -1) == 1
    assert lcm(-1, 1) == 1
    assert lcm(-1, -1) == 1
    assert lcm(1, 2) == 2
    assert lcm(6, 3) == 6
    assert lcm(4, 3) == 12


def test_timestamp_truncate_reference_table():
    """helper/utils/utils_test.go::TestTimestampTruncate — cache-key
    timestamp truncation equals floor_to_multiplier(ts, seconds)."""
    from graphite_clickhouse_spark.functions.timemath import (
        floor_to_multiplier,
    )

    cases = [
        (1628876563, 2, 1628876562),
        (1628876563, 10, 1628876560),
        (1628876563, 60, 1628876520),
        (1628876563, 3600, 1628874000),
        (1628876563, 86400, 1628812800),
    ]
    for ts, dur, want in cases:
        assert floor_to_multiplier(ts, dur) == want, (ts, dur)


def test_set_from_until_reference_table():
    """render/data/query_test.go::TestSetFromUntil verbatim: from
    quantizes UP to the step grid, until DOWN plus step-1."""
    cases = [
        ((4, 9, 2), (4, 9)),
        ((4, 19, 3), (6, 20)),
        ((4, 29, 5), (5, 29)),
        ((7, 108, 7), (7, 111)),
        ((7, 108, 13), (13, 116)),
    ]
    for (f, u, s), want in cases:
        assert align_from_until(f, u, s) == want, (f, u, s)


def test_set_step_reference_vectors():
    """render/data/query_test.go::TestSetStep 'aggregated common step'
    self-contained rows: step = maxDataPoints-inflated interval rounded
    up to a multiple of LCM(per-metric steps)."""
    # steps {1,5,3,4}, interval 500s, mdp 10 -> LCM 60, 500/10=50 -> 60
    assert common_step([1, 5, 3, 4], 0, 500, 10) == 60
    # steps {1,5,8,4}, mdp 7 -> LCM 40, ceil(500/7)=72 -> 80
    assert common_step([1, 5, 8, 4], 0, 500, 7) == 80
    # same steps, mdp 6 -> ceil(500/6)=84 -> 120
    assert common_step([1, 5, 8, 4], 0, 500, 6) == 120
