"""Finder wrappers: target blacklist (P12) and extra-prefix namespace (P13).

Reference: finder/blacklist.go:11-62 (reject queries matching config
regexes -> empty result) and finder/prefix.go:21-125 (serve the whole
metric tree under a configured prefix: queries are matched node-by-node
against the prefix, the prefix is stripped before the real find and
re-attached to results).

Both are pure driver-side query-compiler steps — no DataFrame work, which
is exactly how the reference structures them (wrappers around the finder,
not storage operators).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .glob import glob_to_regexp

NOT_MATCHED = "not_matched"
PARTIAL = "partial"
MATCHED = "matched"


class Blacklist:
    """finder/blacklist.go: a query matching ANY regex yields [] (the
    request succeeds with an empty body — not an error)."""

    def __init__(self, patterns: list[str]):
        self._res = [re.compile(p) for p in patterns]

    def matches(self, query: str) -> bool:
        return any(r.search(query) for r in self._res)


@dataclass
class PrefixMatch:
    state: str  # NOT_MATCHED | PARTIAL | MATCHED
    #: PARTIAL: the '.'-suffixed tree node to return as the only result
    part: str | None = None
    #: MATCHED: the query to run against the real (unprefixed) tree
    inner_query: str | None = None


class PrefixFinder:
    """finder/prefix.go: namespace the whole tree under `prefix`."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self._nodes = prefix.split(".") if prefix else []

    def match(self, query: str) -> PrefixMatch:
        if not self.prefix:
            return PrefixMatch(MATCHED, inner_query=query)
        qs = query.split(".")
        for qnode, pnode in zip(qs, self._nodes):
            if not re.match("^" + glob_to_regexp(qnode) + "$", pnode):
                return PrefixMatch(NOT_MATCHED)
        if len(qs) <= len(self._nodes):
            # query exhausted inside the prefix: answer with the tree node
            part = ".".join(self._nodes[: len(qs)]) + "."
            return PrefixMatch(PARTIAL, part=part)
        return PrefixMatch(MATCHED, inner_query=".".join(qs[len(self._nodes):]))

    def attach(self, path: str) -> str:
        """Re-attach the prefix to a result path (Abs, prefix.go:115-117)."""
        if not self.prefix:
            return path
        return f"{self.prefix}.{path}"
