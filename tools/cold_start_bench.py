#!/usr/bin/env python
"""Cold-start latency: what the FIRST dashboard load pays after a
driver restart (r7 judge next-round #2).

BENCH_LATENCY.json measures a warmed server; the reference
(graphite-clickhouse.go:518-559) is a Go binary that serves its first
request at native speed, so the warm numbers alone overstate parity.
This tool execs the real entrypoint (`python -m
graphite_clickhouse_spark --sf-events ...`) in a FRESH process and
records:

  - time_to_listening_s: exec -> "listening on" announced (session
    init, engine build, bind; with --warmup also the pre-bind queries);
  - first-request latency for one representative query per class
    (uncached find, small render, PromQL instant), fired sequentially
    in that order against the cold server;
  - the same three requests again (second round) — how much one
    request per class buys.

Two phases: plain startup and `--warmup` startup (the mitigation:
server.py::warmup_engine fires one query per class before the listener
is announced).  Results merge into BENCH_LATENCY.json under
"cold_start" (latency_bench.py preserves the key when it rewrites the
warm envelope).  Run SOLO; one fresh JVM per phase.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FROM_TS, UNTIL_TS = 1704067200, 1704153600  # one day inside the testdata

RENDER_Q = (
    f"/render?format=json&from={FROM_TS}&until={UNTIL_TS}"
    f"&target=ev.purchase.u1&maxDataPoints=100"
)
FIND_Q = (
    f"/metrics/find?format=json&query=ev.*.u1"
    f"&from={FROM_TS}&until={UNTIL_TS}&noCache=1"
)
PROM_Q = (
    "/api/v1/query?query=ev%7Btype%3D%22purchase%22%2Cuser%3D%22u1%22%7D"
    f"&time={UNTIL_TS}"
)
CLASSES = [("find", FIND_Q), ("render", RENDER_Q), ("prom_instant", PROM_Q)]


def fire(base: str, path: str) -> float:
    t0 = time.monotonic()
    with urllib.request.urlopen(base + path, timeout=600) as r:
        r.read()
    return time.monotonic() - t0


def run_phase(warmup: bool) -> dict:
    port = 9377 + int(warmup)
    cmd = [
        sys.executable, "-m", "graphite_clickhouse_spark",
        "--sf-events", SF_DIR, "--listen", f"127.0.0.1:{port}",
    ]
    # warmup is default-on since r9; the plain phase must opt out
    cmd.append("--warmup" if warmup else "--no-warmup")
    t_exec = time.monotonic()
    proc = subprocess.Popen(
        cmd, cwd=REPO, stderr=subprocess.PIPE, text=True, bufsize=1,
    )
    t_listen = None
    warmup_line = None
    try:
        for line in proc.stderr:
            if line.startswith("warmup:"):
                warmup_line = line.strip()
            if "listening on" in line:
                t_listen = time.monotonic() - t_exec
                break
        if t_listen is None:
            raise RuntimeError("server exited before announcing listener")
        base = f"http://127.0.0.1:{port}"
        out = {
            "time_to_listening_s": round(t_listen, 2),
            "warmup_log": warmup_line,
            "first_request_s": {},
            "second_request_s": {},
        }
        for key in ("first_request_s", "second_request_s"):
            for name, path in CLASSES:
                out[key][name] = round(fire(base, path), 3)
        # readiness-to-first-answer: what a dashboard that waits for the
        # port sees, end to end, for its first three panels
        out["first_round_total_s"] = round(
            sum(out["first_request_s"].values()), 2
        )
        return out
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def main() -> None:
    result = {
        "metric": "cold-start latency (fresh process, first request per class)",
        "sf": SF_DIR,
        "loadavg_start": round(os.getloadavg()[0], 1),
        "plain": run_phase(warmup=False),
        "with_warmup": run_phase(warmup=True),
    }
    bl_path = os.path.join(REPO, "BENCH_LATENCY.json")
    try:
        with open(bl_path) as fh:
            bl = json.load(fh)
    except (OSError, ValueError):
        bl = {}
    # the warm envelope's c1 p50s are the comparison row
    warm = {}
    for name, wl in (("find", "find_small"), ("render", "render_small"),
                     ("prom_instant", "prom_instant")):
        try:
            warm[name] = bl["workloads"][wl]["c1"]["p50_ms"] / 1000.0
        except (KeyError, TypeError):
            pass
    result["warmed_p50_s"] = warm
    bl["cold_start"] = result
    with open(bl_path, "w") as fh:
        fh.write(json.dumps(bl) + "\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
