"""Split each contract query's timed region into BUILD vs EXECUTE.

Usage: python tools/profile_build.py [query ...]   (default: all)

For each query: time fn(spark, sf_dir) alone (Python plan construction,
pure driver/py4j work) and the subsequent collect() (analysis + jobs),
min of $SPARK_GRAFT_QT_REPS (default 3) reps, caches cleared between
reps. The bench times build+execute together (bench.py:332-336), so a
query whose BUILD column dominates is a py4j/plan-construction target
(guide §1 — know where the time goes before touching the operator).
Dev-loop tool; not the published bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry
    from graphite_clickhouse_spark.session import get_spark

    spark = get_spark("profile-build")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_QT_REPS", "3"))
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(32, numPartitions=32).select(_noop("id")).collect()

    names = sys.argv[1:] or list(qs)
    rows_out = []
    for name in names:
        builds, execs = [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        rows_out.append((name, min(builds), min(execs)))
        print(
            f"{name}: build={min(builds):.3f}s exec={min(execs):.3f}s "
            f"total={min(builds) + min(execs):.3f}s",
            flush=True,
        )
    print("\n# sorted by build time")
    for name, b, e in sorted(rows_out, key=lambda r: -r[1])[:15]:
        print(f"{b:7.3f}  {e:7.3f}  {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
