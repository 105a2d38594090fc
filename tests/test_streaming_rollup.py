"""Streaming windowed rollup: watermark + windowed agg over a file stream,
result parity with the batch resample operator."""

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.operators.resample import resample
from graphite_clickhouse_spark.streaming.ingest import parse_carbon_lines
from graphite_clickhouse_spark.streaming.rollup import streaming_resample


class TestStreamingResample:
    def test_matches_batch_resample(self, spark, tmp_path):
        src = tmp_path / "in"
        src.mkdir()
        lines = []
        for i in range(20):
            lines.append(f"a.b {float(i)} {60 + 30 * i}")   # 2 points per 60s bucket
            lines.append(f"c.d {float(2 * i)} {60 + 60 * i}")
        (src / "points.txt").write_text("\n".join(lines) + "\n")

        stream = spark.readStream.format("text").load(str(src))
        parsed = parse_carbon_lines(stream, version=1)
        rolled = streaming_resample(parsed, step_sec=60, function="avg")

        q = (
            rolled.writeStream.outputMode("complete")
            .format("memory")
            .queryName("roll")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.path, r.time): r.value for r in spark.table("roll").collect()
        }

        batch = parse_carbon_lines(
            spark.createDataFrame([(l,) for l in lines], "value string"), version=1
        )
        want = {
            (r.path, r.time): r.value
            for r in resample(batch, 0, 10**9, 60, "avg").collect()
        }
        assert got == want and len(got) > 10

    def test_anylast_in_stream(self, spark, tmp_path):
        src = tmp_path / "in2"
        src.mkdir()
        (src / "p.txt").write_text("m.x 1.0 60\nm.x 9.0 90\n")
        stream = spark.readStream.format("text").load(str(src))
        rolled = streaming_resample(
            parse_carbon_lines(stream, version=1), step_sec=60, function="anyLast"
        )
        q = (
            rolled.writeStream.outputMode("complete")
            .format("memory")
            .queryName("roll2")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.path, r.time): r.value for r in spark.table("roll2").collect()}
        assert got == {("m.x", 60): 9.0}
