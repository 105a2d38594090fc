"""Ingest throughput bench: the carbon write path, measured end-to-end.

Three measured stages, mirroring a production deployment of the
streaming ingest (SURVEY.md §2.9):

1. **receive**  — CarbonLineReceiver over real TCP sockets: N plaintext
   `path value ts` lines pushed through C concurrent connections into
   rotating spool files (lines/sec, measured until every line is
   durably spooled);
2. **ingest**   — IngestJob.start_text_stream (availableNow) over the
   spool: parse -> in-batch version dedup -> date-partitioned parquet
   points + daily path index + tags index (points/sec);
3. **compact**  — IngestJob.compact(): fold version duplicates, coalesce
   the small streaming files (sec, plus file count before/after — the
   amortized ReplacingMergeTree merge).

Prints ONE JSON line and writes BENCH_INGEST.json next to the repo's
other bench artifacts. Defaults: 2,000,000 points over 10,000 paths and
2 date partitions at local[32].

    python tools/ingest_bench.py            # full run
    SPARK_GRAFT_INGEST_POINTS=200000 python tools/ingest_bench.py
"""

from __future__ import annotations

import json
import os
import socket
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = int(os.environ.get("SPARK_GRAFT_INGEST_POINTS", "2000000"))
N_PATHS = int(os.environ.get("SPARK_GRAFT_INGEST_PATHS", "10000"))
N_CONNS = 4
BASE_TS = 1704067200  # 2024-01-01, spread over ~1.04 days -> 2 dates


def _gen_payloads() -> list[bytes]:
    """One pre-encoded byte blob per connection (generation excluded
    from the measured window)."""
    steps = max(1, N_POINTS // N_PATHS)
    per_conn: list[list[bytes]] = [[] for _ in range(N_CONNS)]
    n = 0
    for s in range(steps):
        ts = BASE_TS + s * 450
        for p in range(N_PATHS):
            if n >= N_POINTS:
                break
            per_conn[n % N_CONNS].append(
                b"bench.host%d.metric%d %d.5 %d\n" % (p // 100, p % 100, s + p, ts)
            )
            n += 1
    return [b"".join(chunks) for chunks in per_conn]


def _spool_lines(spool: str) -> int:
    total = 0
    for f in os.listdir(spool):
        if f.endswith(".txt"):
            with open(os.path.join(spool, f), "rb") as fh:
                total += sum(1 for _ in fh)
    return total


def _parquet_files(root: str) -> int:
    n = 0
    for dp, _dn, fn in os.walk(root):
        n += sum(1 for f in fn if f.endswith(".parquet"))
    return n


def main() -> None:
    from graphite_clickhouse_spark.session import get_spark
    from graphite_clickhouse_spark.streaming.ingest import (
        CarbonLineReceiver,
        IngestJob,
    )

    work = tempfile.mkdtemp(prefix="ingest-bench-")
    spool = os.path.join(work, "spool")
    payloads = _gen_payloads()
    n_sent = sum(p.count(b"\n") for p in payloads)

    # ---- stage 1: TCP receive -> spool ---------------------------------
    rx = CarbonLineReceiver(spool, rotate_lines=200_000)
    host, port = rx.address

    def send(payload: bytes) -> None:
        with socket.create_connection((host, port)) as s:
            s.sendall(payload)

    t0 = time.monotonic()
    threads = [threading.Thread(target=send, args=(p,)) for p in payloads]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rx.close()  # flushes + renames every spool file
    recv_sec = time.monotonic() - t0
    spooled = _spool_lines(spool)
    assert spooled == n_sent, (spooled, n_sent)

    # ---- stage 2: spool -> points + indexes ----------------------------
    spark = get_spark("ingest-bench")
    out = os.path.join(work, "data")
    job = IngestJob(out, version=1)
    t0 = time.monotonic()
    q = job.start_text_stream(spark, spool, os.path.join(work, "ckpt"))
    q.awaitTermination()
    ingest_sec = time.monotonic() - t0
    n_points = job.read_points(spark).count()

    # ---- stage 3: compact ----------------------------------------------
    files_before = _parquet_files(job.points_dir)
    t0 = time.monotonic()
    job.compact(spark)
    compact_sec = time.monotonic() - t0
    files_after = _parquet_files(job.points_dir)
    n_after = job.read_points(spark).count()

    result = {
        "metric": "carbon ingest throughput (receive -> parquet -> compact)",
        "points": n_sent,
        "paths": N_PATHS,
        "connections": N_CONNS,
        "receive_sec": round(recv_sec, 3),
        "receive_lines_per_sec": round(n_sent / recv_sec),
        "ingest_sec": round(ingest_sec, 3),
        "ingest_points_per_sec": round(n_sent / ingest_sec),
        "e2e_points_per_sec": round(n_sent / (recv_sec + ingest_sec)),
        "compact_sec": round(compact_sec, 3),
        "compact_points_per_sec": round(n_sent / compact_sec),
        "parquet_files_before_compact": files_before,
        "parquet_files_after_compact": files_after,
        "points_written": n_points,
        "points_after_compact": n_after,
        "loadavg_1m": round(os.getloadavg()[0], 1),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH_INGEST.json")
    # preserve the freshness section (tools/freshness_bench.py owns it)
    try:
        with open(path) as f:
            prev = json.load(f)
        if "freshness" in prev:
            result["freshness"] = prev["freshness"]
    except (OSError, ValueError):
        pass
    line = json.dumps(result)
    print(line)
    with open(path, "w") as f:
        f.write(line + "\n")
    spark.stop()

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
