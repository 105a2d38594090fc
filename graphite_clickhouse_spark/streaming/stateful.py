"""Custom stateful streaming operator: per-path rollup with explicit
bucket lifecycle, built on ``applyInPandasWithState``.

The watermark+window rollup (streaming/rollup.py) covers the common case
declaratively. This operator exists for the semantics Spark's built-in
windowed aggregation can NOT express:

- **per-key (per-path) lateness**: a bucket closes relative to the max
  event time seen *on that path*, not a single global watermark — the
  behaviour of a carbon-cache/carbon-aggregator flushing each metric
  independently;
- **explicit too-late accounting**: points arriving for an
  already-emitted bucket are dropped at the operator (the reference
  relies on ClickHouse's eventual GraphiteMergeTree merge; here the cut
  is explicit and observable);
- **idle flush**: a processing-time timeout flushes every open bucket of
  a path that stopped receiving points (end-of-stream / dead-metric
  flush) — no amount of watermark tuning does this for a stalled key.

State per path is a compact struct of parallel arrays (one slot per OPEN
bucket): running sum/count/min/max plus first/last point keyed by
(time, version) — enough to finalize any function in the reference's
closed rollup map avg/sum/min/max/any/anyLast
(/root/reference/helper/rollup/aggr.go:7-14) without keeping raw points.
State size is O(open buckets per path), independent of point rate: the
map-side work is all inside one Arrow batch per (path, micro-batch).

At 100 TB scale: state is hash-partitioned by path across executors by
the stateful-operator shuffle; per-path state stays tiny (a handful of
open buckets x ~10 doubles), so the state store grows with metric
cardinality only — same shape as carbon-cache's per-metric buffers.

**Per-executor state budget.** The state row for one path is 11 parallel
arrays (8 B/slot) x B open buckets + 2 longs + per-row store overhead:
``~88*B + ~250`` bytes in the JVM state store. B is bounded by
``lateness_sec / step_sec + 1`` for a path receiving in-order points
(older buckets flush as max_seen advances), so with the defaults
(lateness=1h, step=1m: B<=61, ~5.6 KB/path) a 16 GB executor holds
~2-3 M paths; at step=1h B<=2 (~0.4 KB/path), ~40 M paths. Size
executors as ``paths_per_executor = total_paths /
spark.sql.shuffle.partitions * partitions_per_executor`` and use the
RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider``)
beyond ~1 M paths/executor so state lives off-heap with incremental
checkpoints — the default HDFS-backed store keeps every row on the JVM
heap and doubles it during snapshot. The per-micro-batch PYTHON cost is
transient: groups stream through Arrow one path at a time, so Python
worker memory is O(one path's batch points), never O(state).

If per-key lateness is NOT needed, streaming/rollup.py's watermark
window is the JVM-side alternative: same rollup semantics under a single
global watermark, zero Python state, and the state store holds only
window aggregates.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: functions supported — parity with operators.resample.AGG_FUNCTIONS
_FINALIZERS = {
    "avg": lambda acc: acc[0] / acc[1],
    "sum": lambda acc: acc[0],
    "min": lambda acc: acc[2],
    "max": lambda acc: acc[3],
    "any": lambda acc: acc[4],      # first by (time, version)
    "anyLast": lambda acc: acc[7],  # last by (time, version)
}

OUTPUT_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("time", LongType()),      # bucket start (epoch sec)
        StructField("value", DoubleType()),
        StructField("points", LongType()),    # points folded into bucket
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType())),
        StructField("s", ArrayType(DoubleType())),    # sum
        StructField("n", ArrayType(LongType())),      # count
        StructField("mn", ArrayType(DoubleType())),
        StructField("mx", ArrayType(DoubleType())),
        StructField("fv", ArrayType(DoubleType())),   # first value
        StructField("ft", ArrayType(LongType())),     # first (time,
        StructField("fver", ArrayType(LongType())),   #        version)
        StructField("lv", ArrayType(DoubleType())),   # last value
        StructField("lt", ArrayType(LongType())),
        StructField("lver", ArrayType(LongType())),
        StructField("max_seen", LongType()),          # per-path max event time
        StructField("hwm", LongType()),               # buckets < hwm already emitted
    ]
)

_NEG_INF = -(1 << 62)


def _make_update_fn(step: int, lateness: int, function: str, timeout_ms: int):
    import numpy as np
    import pandas as pd

    finalize = _FINALIZERS[function]

    def _flush(st: dict, threshold: int | None) -> Tuple[list, int]:
        """Pop buckets whose END is <= threshold (None = flush all);
        return (rows, new_hwm_candidate)."""
        done = sorted(
            b for b in st if threshold is None or b + step <= threshold
        )
        rows = []
        for b in done:
            acc = st.pop(b)
            rows.append((b, float(finalize(acc)), int(acc[1])))
        hwm = done[-1] + step if done else _NEG_INF
        return rows, hwm

    def update(
        key: Tuple[str], pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        path = key[0]
        if state.exists:
            (bk, s, n, mn, mx, fv, ft, fver, lv, lt, lver, max_seen, hwm) = state.get
            st = {
                b: [s[i], n[i], mn[i], mx[i], fv[i], ft[i], fver[i], lv[i], lt[i], lver[i]]
                for i, b in enumerate(bk)
            }
        else:
            st, max_seen, hwm = {}, _NEG_INF, _NEG_INF

        if state.hasTimedOut:
            # idle/dead path: flush every open bucket, drop the state
            rows, _ = _flush(st, None)
            state.remove()
            if rows:
                yield pd.DataFrame(
                    {
                        "path": path,
                        "time": [r[0] for r in rows],
                        "value": [r[1] for r in rows],
                        "points": [r[2] for r in rows],
                    }
                )
            return

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            t = pdf["time"].to_numpy(np.int64)
            v = pdf["value"].to_numpy(np.float64)
            ver = (
                pdf["version"].to_numpy(np.int64)
                if "version" in pdf.columns
                else np.zeros(len(t), dtype=np.int64)
            )
            max_seen = max(max_seen, int(t.max()))
            b = t - t % step
            live = b >= hwm  # drop points for already-emitted buckets
            for bucket in np.unique(b[live]):
                m = live & (b == bucket)
                tt, vv, vr = t[m], v[m], ver[m]
                order = np.lexsort((vr, tt))  # by (time, version)
                fi, li = order[0], order[-1]
                acc = st.get(int(bucket))
                new = [
                    float(vv.sum()), int(m.sum()),
                    float(vv.min()), float(vv.max()),
                    float(vv[fi]), int(tt[fi]), int(vr[fi]),
                    float(vv[li]), int(tt[li]), int(vr[li]),
                ]
                if acc is None:
                    st[int(bucket)] = new
                else:
                    acc[0] += new[0]
                    acc[1] += new[1]
                    acc[2] = min(acc[2], new[2])
                    acc[3] = max(acc[3], new[3])
                    if (new[5], new[6]) < (acc[5], acc[6]):
                        acc[4], acc[5], acc[6] = new[4], new[5], new[6]
                    if (new[8], new[9]) >= (acc[8], acc[9]):
                        acc[7], acc[8], acc[9] = new[7], new[8], new[9]

        rows, flushed_to = _flush(st, max_seen - lateness)
        hwm = max(hwm, flushed_to)

        if st or max_seen != _NEG_INF:
            bk = sorted(st)
            cols = list(zip(*(st[b] for b in bk))) if bk else [[]] * 10
            state.update(
                (
                    bk,
                    list(cols[0]), list(cols[1]), list(cols[2]), list(cols[3]),
                    list(cols[4]), list(cols[5]), list(cols[6]),
                    list(cols[7]), list(cols[8]), list(cols[9]),
                    max_seen, hwm,
                )
            )
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)
        else:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "path": path,
                    "time": [r[0] for r in rows],
                    "value": [r[1] for r in rows],
                    "points": [r[2] for r in rows],
                }
            )

    return update


def stateful_streaming_resample(
    points: DataFrame,
    step_sec: int,
    function: str = "avg",
    lateness_sec: int = 3600,
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """Per-path stateful rollup over a points stream
    (path, time, value[, version]) -> append stream of finalized buckets
    (path, time, value, points).

    A bucket [b, b+step) on path P is emitted exactly once, when P's own
    max observed event time passes ``b + step + lateness_sec``; later
    points for it are dropped (explicit too-late cut). With
    ``idle_timeout_ms`` > 0, a path that receives no points for that long
    (processing time) has all its open buckets flushed and its state
    dropped — the carbon-cache "flush dead metrics" behaviour.

    Use the watermark rollup (streaming/rollup.py) unless you need these
    per-key semantics; this one pays a Python/Arrow hop per micro-batch.
    """
    if function not in _FINALIZERS:
        raise ValueError(f"unknown aggregation function: {function}")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return points.groupBy("path").applyInPandasWithState(
        _make_update_fn(step_sec, lateness_sec, function, idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
