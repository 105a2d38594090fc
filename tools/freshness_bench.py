#!/usr/bin/env python
"""Ingest -> query freshness: seconds from a carbon line hitting the TCP
receiver to the point being visible in /render (r7 judge next-round #3).

This is the SLA the reference's carbonlink path exists for
(render/data/carbonlink.go:52-93: render asks the carbon cache for
points not yet flushed to ClickHouse).  The Spark-native equivalent is
structural, not a side channel: the receiver spools lines, the
continuous text stream upserts points + indexes per micro-batch, and
the server's per-request `Engine.refresh_frames()` (throttled to
`refresh_interval_sec`, default 5 s) swaps in freshly-listed frames —
so a written point becomes visible after
flush -> micro-batch -> next refresh window.

Protocol: the full live pipeline in one process (CarbonLineReceiver ->
IngestJob.start_text_stream(available_now=False) -> Engine with
frame_loader -> real HTTP server).  Per trial: open a TCP connection,
send `fresh.probe<k> <v> <now>`, close (close flushes the spool file),
then poll `/render?target=fresh.probe<k>` every 100 ms until the point
appears; latency = visible - sent.  Two phases:

  - idle:  nothing else writing;
  - load:  background writers pushing ~N_LOAD_LPS carbon lines/s
           through the same receiver during the trials.

Writes BENCH_INGEST.json's "freshness" section (the throughput fields
are tools/ingest_bench.py's and are preserved).  Run SOLO.
"""
from __future__ import annotations

import json
import os
import socket
import sys
import tempfile
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIALS = int(os.environ.get("SPARK_GRAFT_FRESH_TRIALS", "16"))
POLL_S = 0.1
TRIAL_TIMEOUT_S = 60.0
N_LOAD_LPS = int(os.environ.get("SPARK_GRAFT_FRESH_LOAD_LPS", "30000"))


def percentile(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(p / 100 * (len(xs) - 1)))))
    return xs[i]


def send_lines(addr, payload: bytes) -> None:
    with socket.create_connection(addr) as s:
        s.sendall(payload)
    # connection close flushes the receiver's pending sub-batch


def visible(base: str, path: str, ts: int) -> bool:
    url = (
        f"{base}/render?format=json&target={path}"
        f"&from={ts - 120}&until={ts + 120}"
    )
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            body = json.loads(r.read() or b"{}")
    except Exception:
        return False
    if not isinstance(body, dict):
        return False
    for series in body.get("metrics", []):
        if series.get("name") == path and any(
            v is not None for v in series.get("values", [])
        ):
            return True
    return False


def run_trials(rx_addr, base: str, label: str, start_k: int) -> dict:
    lats: list[float] = []
    timeouts = 0
    for k in range(start_k, start_k + TRIALS):
        path = f"fresh.probe{k}"
        ts = int(time.time())
        t0 = time.monotonic()
        send_lines(rx_addr, f"{path} {k}.25 {ts}\n".encode())
        while True:
            if visible(base, path, ts):
                lats.append(time.monotonic() - t0)
                break
            if time.monotonic() - t0 > TRIAL_TIMEOUT_S:
                timeouts += 1
                break
            time.sleep(POLL_S)
        print(f"# {label} trial {k}: "
              f"{lats[-1]:.2f}s" if lats and not timeouts else
              f"# {label} trial {k}: TIMEOUT", file=sys.stderr)
    return {
        "trials": TRIALS,
        "timeouts": timeouts,
        "p50_s": round(percentile(lats, 50), 2) if lats else None,
        "p90_s": round(percentile(lats, 90), 2) if lats else None,
        "p99_s": round(percentile(lats, 99), 2) if lats else None,
        "max_s": round(max(lats), 2) if lats else None,
        "min_s": round(min(lats), 2) if lats else None,
        "loadavg": round(os.getloadavg()[0], 1),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from graphite_clickhouse_spark.render.pipeline import Engine
    from graphite_clickhouse_spark.server import serve_background
    from graphite_clickhouse_spark.session import get_spark
    from graphite_clickhouse_spark.streaming.ingest import (
        CarbonLineReceiver,
        IngestJob,
        tags_map_from_path,
    )

    work = tempfile.mkdtemp(prefix="freshness-bench-")
    spool = os.path.join(work, "spool")
    data = os.path.join(work, "data")

    spark = get_spark("freshness-bench")
    rx = CarbonLineReceiver(spool)
    job = IngestJob(data)

    # seed one point so the engine's initial frames exist, and run one
    # availableNow pass to create the table layout before going live
    seed_ts = int(time.time())
    send_lines(rx.address, f"fresh.seed 1 {seed_ts}\n".encode())
    time.sleep(2.5)  # rotate_seconds flush
    job.start_text_stream(
        spark, spool, os.path.join(work, "ckpt"), available_now=True
    ).awaitTermination()

    def load_frames():
        pts = job.read_points(spark)
        tagged = pts.filter(F.col("path").contains("?")).withColumn(
            "tags", tags_map_from_path("path")
        )
        return (
            pts.filter(~F.col("path").contains("?")),
            job.read_path_index(spark),
            tagged,
        )

    points, path_index, tagged = load_frames()
    engine = Engine(
        spark=spark, points=points, path_index=path_index,
        tagged_points=tagged,
    )
    engine.frame_loader = load_frames  # default 5 s refresh throttle
    srv, base = serve_background(engine)

    # go live: continuous micro-batches over the same spool/checkpoint
    stream = job.start_text_stream(
        spark, spool, os.path.join(work, "ckpt"), available_now=False
    )
    # wait for the live stream's first batch so trial 0 measures steady
    # state, not stream startup
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if visible(base, "fresh.seed", seed_ts):
            break
        time.sleep(0.2)

    idle = run_trials(rx.address, base, "idle", 0)

    # ---- load phase ----------------------------------------------------
    stop = threading.Event()
    sent_counter = [0]

    def load_writer():
        k = 0
        batch = 3000  # lines per connection
        while not stop.is_set():
            t0 = time.monotonic()
            ts = int(time.time())
            payload = b"".join(
                b"load.host%d.metric%d %d %d\n"
                % (i // 100, i % 100, i + k, ts)
                for i in range(batch)
            )
            send_lines(rx.address, payload)
            sent_counter[0] += batch
            k += 1
            # pace to ~N_LOAD_LPS across 2 writers
            elapsed = time.monotonic() - t0
            budget = batch / (N_LOAD_LPS / 2)
            if elapsed < budget:
                time.sleep(budget - elapsed)

    writers = [threading.Thread(target=load_writer, daemon=True)
               for _ in range(2)]
    t_load0 = time.monotonic()
    for t in writers:
        t.start()
    time.sleep(5)  # let the load reach the stream
    load = run_trials(rx.address, base, "load", TRIALS)
    load_window = time.monotonic() - t_load0
    stop.set()
    for t in writers:
        t.join(timeout=30)
    load["background_lines_per_s"] = round(sent_counter[0] / load_window)

    # the refresh throttle is the dominant term and is a config knob —
    # show what tightening it buys (staleness bound 5 s -> 1 s at the
    # cost of re-listing the table 5x as often)
    engine.refresh_interval_sec = 1.0
    idle_1s = run_trials(rx.address, base, "idle_refresh_1s", 2 * TRIALS)

    stream.stop()
    srv.shutdown()
    rx.close()

    result = {
        "metric": "carbon line -> visible in /render (seconds)",
        "pipeline": "tcp receiver -> spool -> continuous text stream -> "
                    "per-request frame refresh (5 s throttle)",
        "idle": idle,
        "under_load": load,
        "idle_refresh_interval_1s": idle_1s,
    }
    bi_path = os.path.join(REPO, "BENCH_INGEST.json")
    try:
        with open(bi_path) as fh:
            bi = json.load(fh)
    except (OSError, ValueError):
        bi = {}
    bi["freshness"] = result
    with open(bi_path, "w") as fh:
        fh.write(json.dumps(bi) + "\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
