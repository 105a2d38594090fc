"""applyInPandasWithState per-path rollup: bucket lifecycle (emit-once,
late-drop, amend-while-open), batch parity, version tie-breaks, idle
flush via processing-time timeout."""

import json
import os
import time as time_mod

import pytest

from graphite_clickhouse_spark.streaming.stateful import (
    stateful_streaming_resample,
)

SCHEMA = "path string, time long, value double, version long"


def _write_batchfile(dirpath, name, rows, mtime):
    p = dirpath / name
    p.write_text(
        "\n".join(
            json.dumps({"path": a, "time": t, "value": v, "version": ver})
            for a, t, v, ver in rows
        )
        + "\n"
    )
    os.utime(p, (mtime, mtime))
    return p


class TestStatefulResample:
    def test_bucket_lifecycle_two_batches(self, spark, tmp_path):
        """Batch 1 opens+closes buckets; batch 2's late point for a closed
        bucket is DROPPED while a point for a still-open bucket amends it."""
        src = tmp_path / "in"
        src.mkdir()
        now = time_mod.time()
        # batch 1: buckets 0 (two pts), 60, 240 on m.x; threshold=240-60=180
        # closes 0 and 60; 240 stays open
        _write_batchfile(
            src,
            "b1.json",
            [("m.x", 0, 1.0, 1), ("m.x", 30, 3.0, 1), ("m.x", 60, 5.0, 1),
             ("m.x", 240, 7.0, 1)],
            now - 20,
        )
        # batch 2: t=10 is late for emitted bucket 0 -> dropped;
        # t=250 amends open bucket 240; t=400 advances max_seen to 400,
        # threshold=340 -> closes 240 as avg(7,9)=8; bucket 360 stays open
        _write_batchfile(
            src,
            "b2.json",
            [("m.x", 10, 100.0, 1), ("m.x", 250, 9.0, 1), ("m.x", 400, 11.0, 1)],
            now - 10,
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        rolled = stateful_streaming_resample(
            stream, step_sec=60, function="avg", lateness_sec=60
        )
        q = (
            rolled.writeStream.outputMode("append")
            .format("memory")
            .queryName("sf_roll")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.path, r.time): (r.value, r.points)
            for r in spark.table("sf_roll").collect()
        }
        assert got == {
            ("m.x", 0): (2.0, 2),     # late 100.0 NOT folded in
            ("m.x", 60): (5.0, 1),
            ("m.x", 240): (8.0, 2),   # amended across batches
        }

    @pytest.mark.parametrize(
        "function,want",
        [("any", 5.0), ("anyLast", 7.0), ("sum", 18.0), ("min", 5.0), ("max", 7.0)],
    )
    def test_functions_and_version_tiebreak(self, spark, tmp_path, function, want):
        """any/anyLast order by (time, version): (60,v1)=5, (60,v2)=6,
        (90,v1)=7 -> first=5 (min key (60,1)), last=7 (max key (90,1))."""
        src = tmp_path / f"in_{function}"
        src.mkdir()
        now = time_mod.time()
        _write_batchfile(
            src,
            "b1.json",
            [("m.y", 60, 5.0, 1), ("m.y", 60, 6.0, 2), ("m.y", 90, 7.0, 1),
             ("m.y", 500, 0.0, 1)],  # advances max_seen -> closes bucket 60
            now - 20,
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        rolled = stateful_streaming_resample(
            stream, step_sec=60, function=function, lateness_sec=60
        )
        qn = f"sf_fn_{function}"
        q = (
            rolled.writeStream.outputMode("append")
            .format("memory")
            .queryName(qn)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.path, r.time): r.value for r in spark.table(qn).collect()}
        assert got == {("m.y", 60): want}

    def test_idle_timeout_flushes_open_buckets(self, spark, tmp_path):
        """A path that stops sending is flushed by the processing-time
        timeout when a later batch (other paths' data) runs."""
        src = tmp_path / "in_idle"
        src.mkdir()
        now = time_mod.time()
        # m.a has ONE open bucket (nothing past threshold) then goes idle
        _write_batchfile(src, "b1.json", [("m.a", 60, 4.0, 1)], now)

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        rolled = stateful_streaming_resample(
            stream, step_sec=60, function="avg", lateness_sec=60,
            idle_timeout_ms=500,
        )
        q = (
            rolled.writeStream.outputMode("append")
            .format("memory")
            .queryName("sf_idle")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time_mod.time() + 60
            while not spark.sql(
                "SELECT 1 FROM sf_idle LIMIT 1"
            ).take(1) and time_mod.time() < deadline:
                # keep feeding OTHER paths so batches keep running and the
                # idle path's timeout gets evaluated
                time_mod.sleep(0.7)
                _write_batchfile(
                    src,
                    f"feed_{int(time_mod.time() * 1000)}.json",
                    [("m.other", 60, 1.0, 1)],
                    time_mod.time(),
                )
            rows = {
                (r.path, r.time): (r.value, r.points)
                for r in spark.table("sf_idle").collect()
                if r.path == "m.a"
            }
        finally:
            q.stop()
        assert rows == {("m.a", 60): (4.0, 1)}


class TestManyPathsStress:
    def test_high_cardinality_state(self, spark, tmp_path):
        """State-budget stress: 5000 distinct paths in one micro-batch,
        each with an open bucket carried across to a second batch that
        flushes everything. Exercises the per-key state store at a
        cardinality where any O(paths) driver-side or per-group Python
        leak would blow up, and pins exact per-path results."""
        src = tmp_path / "in_many"
        src.mkdir()
        now = time_mod.time()
        n = 5000
        # batch 1: every path gets bucket 0 (two points) and bucket 120
        # (one point); threshold = 120-60 = 60 closes ONLY bucket 0
        _write_batchfile(
            src, "b1.json",
            [(f"m.p{i}", 0, float(i), 1) for i in range(n)]
            + [(f"m.p{i}", 30, float(i) + 2.0, 1) for i in range(n)]
            + [(f"m.p{i}", 120, 7.0, 1) for i in range(n)],
            now - 20,
        )
        # batch 2: one point far ahead on every path flushes bucket 120
        _write_batchfile(
            src, "b2.json",
            [(f"m.p{i}", 600, 1.0, 1) for i in range(n)],
            now - 10,
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        rolled = stateful_streaming_resample(
            stream, step_sec=60, function="avg", lateness_sec=60
        )
        q = (
            rolled.writeStream.outputMode("append")
            .format("memory")
            .queryName("sf_many")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.path, r.time): (r.value, r.points)
            for r in spark.table("sf_many").collect()
        }
        # every path closed bucket 0 (avg(i, i+2) = i+1) and bucket 120
        assert len(got) == 2 * n
        for i in range(0, n, 997):  # spot-check a spread of paths
            assert got[(f"m.p{i}", 0)] == (float(i) + 1.0, 2)
            assert got[(f"m.p{i}", 120)] == (7.0, 1)
