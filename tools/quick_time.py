"""Quick A/B timer for individual contract queries.

Usage: python tools/quick_time.py <query> [query ...]

Times each named query with the bench's session + collect() action,
reporting min of $SPARK_GRAFT_QT_REPS (default 3) reps with caches
cleared between reps. NOT the published bench — a dev loop tool for
before/after comparison while optimizing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry
    from graphite_clickhouse_spark.session import get_spark

    spark = get_spark("quick-time")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_QT_REPS", "3"))
    qs = entry.queries()
    # warmup: executors + python worker pool
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(32, numPartitions=32).select(_noop("id")).collect()

    for name in sys.argv[1:]:
        times = []
        rows = 0
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = len(qs[name](spark, sf_dir).collect())
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(times):.3f}s reps={[round(t, 3) for t in times]}"
            f" rows={rows}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
