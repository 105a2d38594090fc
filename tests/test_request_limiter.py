"""v3_pb request parsing (round-trip with an independent encoder) and the
request limiter."""

import struct
import threading
import time

import pytest

from graphite_clickhouse_spark.plans.limiter import (
    ClassLimiters,
    LimitExceeded,
    RequestLimiter,
)
from graphite_clickhouse_spark.render.request import parse_multi_fetch_request


def varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def ld(field, payload):
    return varint((field << 3) | 2) + varint(len(payload)) + payload


def vi(field, value):
    return varint(field << 3) + varint(value)


def encode_request(targets):
    body = b""
    for t in targets:
        fr = (
            ld(1, t["target"].encode())
            + vi(2, t["start"])
            + vi(3, t["stop"])
            + ld(5, t.get("pathexpr", t["target"]).encode())
            + vi(6, t.get("mdp", 0))
        )
        if "consolidate" in t:
            ff = ld(1, b"consolidateBy") + ld(2, t["consolidate"].encode())
            fr += ld(7, ff)
        body += ld(1, fr)
    return body


class TestParseV3Request:
    def test_roundtrip(self):
        body = encode_request(
            [
                {"target": "a.*.b", "start": 100, "stop": 200, "mdp": 50},
                {"target": "c.d", "start": 0, "stop": 60, "consolidate": "max"},
            ]
        )
        got = parse_multi_fetch_request(body)
        assert len(got) == 2
        assert (got[0].target, got[0].start_time, got[0].stop_time, got[0].max_data_points) == (
            "a.*.b", 100, 200, 50,
        )
        assert got[0].consolidate_by is None
        assert got[1].consolidate_by == "max"
        assert got[1].filter_functions == [("consolidateBy", ["max"])]

    def test_empty(self):
        assert parse_multi_fetch_request(b"") == []


class TestLimiter:
    def test_serializes_capacity(self):
        lim = RequestLimiter(capacity=1, max_queue=5, queue_timeout_sec=5)
        running = []
        peak = []

        def work(i):
            with lim.enter():
                running.append(i)
                peak.append(len(running))
                time.sleep(0.05)
                running.remove(i)

        ts = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert max(peak) == 1

    def test_timeout_raises(self):
        lim = RequestLimiter(capacity=1, max_queue=5, queue_timeout_sec=0.05)
        with lim.enter():
            with pytest.raises(LimitExceeded):
                with lim.enter():
                    pass

    def test_queue_full_fails_fast(self):
        lim = RequestLimiter(capacity=1, max_queue=0, queue_timeout_sec=10)
        with lim.enter():
            with pytest.raises(LimitExceeded):
                with lim.enter():
                    pass

    def test_class_limiters(self):
        cl = ClassLimiters(render=2, find=3, tags=4)
        with cl.render.enter(), cl.find.enter(), cl.tags.enter():
            pass


class TestAdaptiveLimiter:
    """limiter/alimiter.go ALimiter + getWeighted truth table."""

    def test_get_weighted_reference_table(self):
        from graphite_clickhouse_spark.plans.limiter import get_weighted

        # below the 0.6 threshold: nothing reserved
        assert get_weighted(10, 16, 0.0) == 0
        assert get_weighted(10, 16, 0.59) == 0
        # n <= 0: disabled
        assert get_weighted(0, 16, 2.0) == 0
        # normal band: int(n * load)
        assert get_weighted(10, 16, 0.6) == 6
        assert get_weighted(10, 16, 1.0) == 10
        # saturation: never reserve every slot
        assert get_weighted(10, 8, 1.0) == 7
        assert get_weighted(10, 1, 5.0) == 1

    def test_capacity_shrinks_under_load(self):
        from graphite_clickhouse_spark.plans.limiter import (
            AdaptiveLimiter,
            LimitExceeded,
        )

        load = [0.0]
        lim = AdaptiveLimiter(
            concurrent=4, adaptive_n=3, max_queue=0,
            queue_timeout_sec=0.1, loadavg_fn=lambda: load[0],
            check_delay_sec=0.0,
        )
        # idle box: all 4 slots usable
        with lim.enter(), lim.enter(), lim.enter(), lim.enter():
            pass
        # loaded box: int(3 * 1.0) = 3 reserved -> 1 effective slot
        load[0] = 1.0
        with lim.enter():
            with pytest.raises(LimitExceeded):
                with lim.enter():
                    pass
        # load drops: capacity recovers
        load[0] = 0.1
        with lim.enter(), lim.enter():
            pass

    def test_config_wires_adaptive(self):
        from graphite_clickhouse_spark.config import load_settings
        from graphite_clickhouse_spark.plans.limiter import (
            AdaptiveLimiter,
            RequestLimiter,
        )

        s = load_settings(
            "[clickhouse]\nrender-concurrent-queries = 4\n"
            "render-adaptive-queries = 2\nfind-concurrent-queries = 8\n"
        )
        cls = s.class_limiters()
        assert isinstance(cls.render, AdaptiveLimiter)
        assert cls.render.concurrent == 4 and cls.render.adaptive_n == 2
        assert isinstance(cls.find, RequestLimiter)
