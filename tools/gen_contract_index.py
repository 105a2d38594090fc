#!/usr/bin/env python
"""Regenerate the CONTRACT_INDEX block in __spark_entry__.py.

The index (r9 VERDICT next-round #8) keeps the 74-query driver contract
auditable: one line per query with its position, driver-window ('w',
positions 1-50) vs pinned-tail ('t') slot, and the last round that
semantically touched its code path. The window/tail axis is DERIVED
from QUERIES order; the touched axis is carried over from the existing
index (new queries default to the round passed via --round).

Usage:  python tools/gen_contract_index.py [--round rN] [--write]

Without --write it prints the block for manual inspection; with it, the
block between the CONTRACT_INDEX markers is replaced in place.
tests/test_oracle.py::test_contract_index_matches_queries asserts the
committed block matches QUERIES.
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADER = """\
#: CONTRACT INDEX (r9 VERDICT next-round #8) — one line per contract
#: query: position, driver window ('w', positions 1-50, recorded in
#: CORRECTNESS_r{N}.json) vs pinned tail ('t', positions 51+, guarded
#: by tests/stable_tail_fingerprints.json), and the last round that
#: semantically touched the query's code path ('r8-' = r8 or earlier).
#: GENERATED from QUERIES (tools/gen_contract_index.py);
#: tests/test_oracle.py::test_contract_index_matches_queries fails on
#: any drift.
"""


def render_index(entrymod, new_round: str = "r10") -> str:
    prior = getattr(entrymod, "CONTRACT_INDEX", {})
    lines = [HEADER.rstrip("\n")]
    lines.append("CONTRACT_INDEX: dict[str, tuple[int, str, str]] = {")
    for pos, name in enumerate(entrymod.QUERIES, 1):
        slot = "w" if pos <= 50 else "t"
        touched = prior.get(name, (None, None, new_round))[2]
        lines.append(f'    "{name}": ({pos}, "{slot}", "{touched}"),')
    lines.append("}")
    return "\n".join(lines) + "\n"


def main() -> int:
    sys.path.insert(0, REPO)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    rnd = "r10"
    if "--round" in sys.argv:
        rnd = sys.argv[sys.argv.index("--round") + 1]
    block = render_index(entrymod, new_round=rnd)
    if "--write" not in sys.argv:
        print(block)
        return 0
    path = os.path.join(REPO, "__spark_entry__.py")
    with open(path) as fh:
        src = fh.read()
    pattern = re.compile(
        r"#: CONTRACT INDEX.*?^CONTRACT_INDEX[^\n]*=\s*\{.*?^\}\n",
        re.S | re.M,
    )
    assert pattern.search(src), "CONTRACT_INDEX block not found"
    with open(path, "w") as fh:
        fh.write(pattern.sub(block.replace("\\", "\\\\"), src, count=1))
    print("CONTRACT_INDEX rewritten in __spark_entry__.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
