#!/usr/bin/env python
"""Pin optimized-plan fingerprints for the stable-tail contract queries.

The driver records correctness rows for only the FIRST 50 ``queries()``
entries; queries past position 49 ("the stable tail") ride on their last
driver-green certification.  Round 5's judge showed why a name-based
guard is not enough: a shared module (plans/glob.py) changed while a
tail query built on it (find_glob) sat outside the driver window — the
name-based guard could not see that the query's semantics might have
drifted.

This tool makes the guard CONTENT-AWARE: it records, for every tail
query, a hash of Catalyst's *optimized logical plan* at sf0.001.  The
plan is downstream of the query function AND every module it transitively
uses, so any semantic edit anywhere in the dependency cone changes the
fingerprint and tests/test_oracle.py::test_stable_tail_plans_unchanged
fails with instructions to rotate the query back into the window.

Normalization (must match tests/test_oracle.py::_plan_fingerprint):
  - exprIds (``#123``) are globally-incrementing per session -> ``#N``
  - lambda-variable ids (``x_1``) share a global counter     -> ``x_N``
  - ``Repartition <n>`` widths track defaultParallelism      -> ``N``

Run after an INTENTIONAL tail change (i.e. after rotating the edited
query into the top-50 window for driver re-certification):

    python tools/pin_tail_fingerprints.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PIN_PATH = os.path.join(REPO, "tests", "stable_tail_fingerprints.json")
FP_SF_DIR = "/root/testdata/sf0.001"


def plan_fingerprint(df) -> str:
    import hashlib
    import re

    # fingerprint from a CLEAN cache state: CacheManager substitutes any
    # live InMemoryRelation whose subtree matches into THIS plan during
    # optimization, so a fingerprint taken while earlier queries' caches
    # are alive differs from the same query fingerprinted fresh (r8
    # finding: ccnet_partition/dsir_weight drifted whenever a prior test
    # left the lm.py vocabulary frames cached). Queries that cache
    # DURING their own build (the lm.py family) stay deterministic:
    # their self-created entries are the same every time when the slate
    # starts empty.
    df.sparkSession.catalog.clearCache()
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+", "#N", s)
    s = re.sub(r"\b([A-Za-z]\w*?)_\d+\b", r"\1_N", s)
    # Repartition width follows defaultParallelism (core count) or a
    # measured data volume (winnow's exact-pair-volume exchange), not
    # query semantics — local[4] vs local[32] must fingerprint the same.
    # Covers both the round-robin node ("Repartition 32") and the keyed
    # one ("RepartitionByExpression [id_a#N, id_b#N], 32").
    s = re.sub(r"\bRepartition \d+\b", "Repartition N", s)
    s = re.sub(r"(RepartitionByExpression \[[^\]]*\]), \d+", r"\1, N", s)
    return hashlib.sha256(s.encode()).hexdigest()


def tail_names(entrymod) -> list[str]:
    return list(entrymod.queries())[50:]


def main() -> int:
    sys.path.insert(0, REPO)
    import importlib.util

    from graphite_clickhouse_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    # same session factory as tests/conftest.py: the fingerprint must be
    # computed under the config the guard test will use
    spark = get_spark("pin-tail", shuffle_partitions=4)
    qs = entrymod.queries()
    pins = {
        name: plan_fingerprint(qs[name](spark, FP_SF_DIR))
        for name in tail_names(entrymod)
    }
    spark.stop()
    with open(PIN_PATH, "w") as fh:
        json.dump({"sf_dir": FP_SF_DIR, "fingerprints": pins}, fh, indent=2)
        fh.write("\n")
    print(f"pinned {len(pins)} tail fingerprints -> {PIN_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
