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
            try:
                matched = re.match("^" + glob_to_regexp(qnode) + "$", pnode)
            except re.error:
                # malformed glob node (e.g. "[bad"): not-matched, never
                # a 500 (finder/prefix_test.go "[bad regexp" row)
                return PrefixMatch(NOT_MATCHED)
            if not matched:
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


# ---------------------------------------------------------------------------
# Storage read limits (helper/clickhouse/clickhouse.go:60-95)
#
# The reference appends ClickHouse query-string settings to the storage
# URL (max_rows_to_read, max_memory_usage, ...) and maps the resulting
# TOO_MANY_ROWS / MEMORY_LIMIT_EXCEEDED errors to HTTP 403 with a
# "Storage read limit ..." body. In the Spark build the engine IS the
# storage, so the same knobs become a guard on the pruned data scan:
# the guard counts AT MOST limit+1 rows (Spark's incremental
# CollectLimit job — first partitions only, escalating), i.e. its cost
# is bounded by the limit itself, exactly the work ClickHouse performs
# before aborting a limited query.


class StorageLimitError(ValueError):
    """Scan exceeded a configured storage read limit -> HTTP 403
    (clickhouse.go:73-75 extractClickhouseError)."""

    http_status = 403


#: driver-side estimate of one stored point's memory footprint
#: (path ref + UInt32 time + Float64 value + UInt32 version, plus
#: per-row bookkeeping) for the max_memory_usage analog
BYTES_PER_POINT = 40


@dataclass(frozen=True)
class StorageLimits:
    """Per-URL ClickHouse read limits, enforced against a Spark scan.

    Parsed from the [clickhouse] / [[clickhouse.query-params]] url query
    strings (config.go QueryParams carries the raw URL per tier;
    tests/error_handling/graphite-clickhouse.conf.tpl sets
    max_rows_to_read=1 / max_memory_usage=1 to force the 403 goldens).
    max_result_bytes is parsed for config parity but not enforced: the
    response size is bounded upstream by maxDataPoints * series count.
    """

    max_rows_to_read: int = 0  # 0 = unlimited
    max_memory_usage: int = 0  # bytes; 0 = unlimited
    max_result_bytes: int = 0  # parsed, unenforced

    @classmethod
    def from_url(cls, url: str) -> "StorageLimits | None":
        """Extract limits from a storage URL's query string; None when
        the URL carries no limit settings."""
        from urllib.parse import parse_qs, urlparse

        if not url:
            return None
        q = parse_qs(urlparse(url).query)

        def _i(*keys: str) -> int:
            vals = []
            for k in keys:
                for v in q.get(k, []):
                    try:
                        vals.append(int(v))
                    except ValueError:
                        pass
            vals = [v for v in vals if v > 0]
            return min(vals) if vals else 0

        lim = cls(
            max_rows_to_read=_i("max_rows_to_read"),
            # either per-query or per-user cap trips the memory error
            max_memory_usage=_i("max_memory_usage", "max_memory_usage_for_user"),
            max_result_bytes=_i("max_result_bytes"),
        )
        if not (lim.max_rows_to_read or lim.max_memory_usage
                or lim.max_result_bytes):
            return None
        return lim

    def row_caps(self) -> list[tuple[str, int]]:
        """[(kind, max_rows_allowed)] — memory converts to a row cap via
        the per-point estimate."""
        caps = []
        if self.max_rows_to_read > 0:
            caps.append(("rows", self.max_rows_to_read))
        if self.max_memory_usage > 0:
            caps.append(("memory", self.max_memory_usage // BYTES_PER_POINT))
        return caps

    def check_scan(self, df) -> None:
        """Raise StorageLimitError when the scan exceeds a limit. One
        bounded count (<= smallest cap + 1 rows read) covers all caps —
        the smallest cap is the one a sequential reader trips first."""
        caps = self.row_caps()
        if not caps:
            return
        cap = min(c for _, c in caps)
        n = df.limit(cap + 1).count()
        for kind, c in sorted(caps, key=lambda t: t[1]):
            if n > c:
                if kind == "rows":
                    raise StorageLimitError(
                        "Storage read limit for rows (controlled by "
                        "'max_rows_to_read' setting) exceeded, max rows: "
                        f"{self.max_rows_to_read}, current rows: {n}"
                    )
                raise StorageLimitError("Storage read limit for memory")
