"""Rollup rules engine — retention/aggregation rule model and lookup.

Semantics mirror /root/reference/helper/rollup/rules.go:
- Pattern = {rule_type ∈ {all, plain, tagged, tag_list}, regexp, function,
  retention: [(age, precision), ...]} (rules.go:16-28,137-152)
- Lookup(metric, age): scan patterns in order; the FIRST pattern with a
  function that matches fixes the function, the FIRST pattern with a
  retention whose age window covers `age` fixes the precision — the two can
  come from DIFFERENT patterns (rules.go:298-363).
- Retention selection within a pattern: entries sorted by age ascending;
  pick the last entry with entry.age <= age; if age < first entry's age the
  pattern contributes NO precision (falls through to later patterns).
- super-default: function avg, precision 60 (rules.go:37-43).
- rule_type separation: tagged metrics (name contains '?') match only
  tagged/tag_list/all patterns, plain metrics only plain/all
  (rules.go:60-135,285-295).

The lookup itself is driver-side scalar code: it runs over the RESOLVED
metric list (thousands of names after find, not the 100 TB points table),
then metrics are grouped by (function, precision) so each group is a single
DataFrame aggregation — the idiomatic Spark shape for "per-key dynamic
config" (broadcast small config, never per-row Python in the scan).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

SUPER_DEFAULT_FUNCTION = "avg"
SUPER_DEFAULT_PRECISION = 60

RULE_ALL = "all"
RULE_PLAIN = "plain"
RULE_TAGGED = "tagged"
RULE_TAG_LIST = "tag_list"


@dataclass
class Retention:
    age: int
    precision: int


@dataclass
class Pattern:
    regexp: str = ""
    function: str | None = None
    retention: list[Retention] = field(default_factory=list)
    rule_type: str = RULE_ALL
    _re: re.Pattern | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        if self.regexp and self.regexp != ".*":
            self._re = re.compile(self.regexp)
        # reference sorts retention by age and drops precision<=0 heads
        self.retention = sorted(self.retention, key=lambda r: r.age)

    def matches(self, metric: str) -> bool:
        return self._re is None or self._re.search(metric) is not None


def _tag_list_to_regexp(tag_list: str) -> str:
    """`tag_list` rules give a semicolon tag list compiled to a regex over
    the `name?k=v&...` form (rules.go:98-135): `name;tag=val` ->
    `^name\\?(.*&)?tag=val(&|$)` style."""
    parts = tag_list.split(";")
    out = []
    name = parts[0]
    if name:
        out.append("^" + re.escape(name) + r"\?")
    for t in parts[1:]:
        if t:
            out.append(r"(.*&)?" + re.escape(t) + r"(&|$)")
    return ".*".join(out) if out else ".*"


@dataclass
class Rules:
    patterns: list[Pattern] = field(default_factory=list)

    @classmethod
    def from_xml(cls, xml_text: str) -> "Rules":
        """Parse ClickHouse graphite_rollup XML (rules.go / xml.go parity;
        fixture: /root/reference/tests/clickhouse/rollup/rollup.xml)."""
        root = ET.fromstring(xml_text)
        if root.tag != "graphite_rollup":
            found = root.find("graphite_rollup")
            if found is None:
                raise ValueError("no <graphite_rollup> element")
            root = found
        patterns: list[Pattern] = []
        default: Pattern | None = None
        for el in list(root):
            if el.tag not in ("pattern", "default"):
                continue
            rule_type = RULE_ALL
            rt = el.findtext("rule_type")
            regexp = el.findtext("regexp") or ""
            if rt:
                rule_type = rt.strip()
            if el.tag == "default":
                regexp = ""
            retention = [
                Retention(int(r.findtext("age") or 0), int(r.findtext("precision") or 0))
                for r in el.findall("retention")
            ]
            if rule_type == RULE_TAG_LIST:
                regexp = _tag_list_to_regexp(regexp)
                rule_type = RULE_TAGGED
            pat = Pattern(
                regexp=regexp,
                function=(el.findtext("function") or None),
                retention=retention,
                rule_type=rule_type,
            )
            if el.tag == "default":
                # <default> is the FALLBACK: appended after every pattern
                # regardless of its position in the document
                # (helper/rollup/xml.go:99-106)
                default = pat
            else:
                patterns.append(pat)
        if default is not None:
            patterns.append(default)
        return cls(patterns)

    @classmethod
    def default(cls) -> "Rules":
        return cls([Pattern(function=SUPER_DEFAULT_FUNCTION,
                            retention=[Retention(0, SUPER_DEFAULT_PRECISION)])])

    @classmethod
    def single_default(cls, precision: int, function: str) -> "Rules":
        """rollup-conf = "none": one catch-all rule from
        rollup-default-precision / rollup-default-function
        (config/config.go, doc/config.md:194-195)."""
        return cls([Pattern(function=function, retention=[Retention(0, precision)])])

    def _candidates(self, metric: str) -> list[Pattern]:
        tagged = "?" in metric
        want = RULE_TAGGED if tagged else RULE_PLAIN
        return [p for p in self.patterns if p.rule_type in (RULE_ALL, want)]

    def lookup(self, metric: str, age: int) -> tuple[int, str]:
        """-> (precision, function) for one metric at a given age."""
        function: str | None = None
        precision: int | None = None
        for p in self._candidates(metric):
            # skip patterns with nothing left to contribute
            can_give_function = function is None and p.function is not None
            can_give_precision = precision is None and bool(p.retention)
            if not can_give_function and not can_give_precision:
                continue
            if not p.matches(metric):
                continue
            if function is None and p.function is not None:
                function = p.function
            if precision is None and p.retention:
                ret = p.retention
                for i, r in enumerate(ret):
                    if age < r.age:
                        if i > 0:
                            precision = ret[i - 1].precision
                        break
                    if i == len(ret) - 1:
                        precision = r.precision
                        break
            if function is not None and precision is not None:
                return precision, function
        return (
            precision if precision is not None else SUPER_DEFAULT_PRECISION,
            function if function is not None else SUPER_DEFAULT_FUNCTION,
        )

    def lookup_many(
        self, metrics: list[str], age: int, consolidate_overrides: dict[str, str] | None = None
    ) -> dict[tuple[int, str], list[str]]:
        """Group metrics by (precision, function) — each group becomes one
        resample aggregation (the reference fans out one ClickHouse query
        per aggregation group, render/data/query.go:179-221)."""
        groups: dict[tuple[int, str], list[str]] = {}
        for m in metrics:
            precision, function = self.lookup(m, age)
            if consolidate_overrides and m in consolidate_overrides:
                function = consolidate_overrides[m]
            groups.setdefault((precision, function), []).append(m)
        return groups
