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
            try:
                self._re = re.compile(self.regexp)
            except re.error as exc:
                # one error type at the parse boundary: the reference's
                # compile() wraps regexp.Compile errors the same way
                raise ValueError(
                    f"can't compile regexp {self.regexp!r}: {exc}"
                ) from exc
        # reference sorts retention by age and drops precision<=0 heads
        self.retention = sorted(self.retention, key=lambda r: r.age)

    def matches(self, metric: str) -> bool:
        return self._re is None or self._re.search(metric) is not None


def _tag_list_to_regexp(tag_list: str) -> str:
    """`tag_list` rules compile a semicolon tag list to a regex over the
    `name?k=v&...` form — exact port of buildTaggedRegex
    (helper/rollup/rules.go:86-135, itself mirroring ClickHouse's
    Graphite.cpp): parts are regexps themselves (NOT escaped), the name
    part must come first, remaining tags sort lexically, and the
    produced shape is `^name\\?(.*&)?tag=val&(.*&)?tag2=val2(&.*)?$`
    (or `[\\?&]tag=val(&.*)?$` without a name part)."""
    # splitTags drops empties (pkg/dry RemoveEmptyStrings semantics,
    # strings_test.go — whitespace-only elements are NOT empty and stay)
    tags = [v for v in tag_list.split(";") if v]
    if not tags:
        return ".*"
    if "=" in tags[0]:
        prefix = r"[\?&]"
    else:
        if len(tags) == 1:
            return "^" + tags[0] + r"\?"  # only a name part
        prefix = "^" + tags[0] + r"\?(.*&)?"
        tags = tags[1:]
    return prefix + "&(.*&)?".join(sorted(tags)) + "(&.*)?$"


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
    def from_json(cls, text: str) -> "Rules":
        """Parse the ClickHouse JSON response for system.graphite_retentions
        (helper/rollup/remote.go:29-111 parseJson — what `rollup-conf =
        "auto"` loads from the server): consecutive rows sharing
        (regexp, function) merge their retentions, rows with precision
        '0' (or empty age/precision) carry no retention, is_default rows
        fold into one trailing catch-all pattern, and tag_list rows
        expand exactly like the XML form."""
        import json as _json

        doc = _json.loads(text)
        if not isinstance(doc, dict) or not isinstance(doc.get("data", []), list):
            raise ValueError("rollup JSON: top-level 'data' array expected")

        def _parse_i32(s: str, row: dict) -> int:
            # strconv.ParseInt(s, 10, 32): optional sign, decimal digits,
            # bounded to int32 — integers >= 2^31 are a range error, not
            # silently accepted (remote.go:42-52)
            body = s[1:] if s[:1] in "+-" else s
            if not (body.isascii() and body.isdigit()):
                raise ValueError(f"can't parse retention row: {row!r}")
            v = int(s)
            if not (-(2 ** 31) <= v <= 2 ** 31 - 1):
                raise ValueError(
                    f"rollup JSON: retention value out of int32 range: {s!r}"
                )
            # Go then narrows with uint32(age) — two's-complement wrap
            return v & 0xFFFFFFFF

        groups: list[dict] = []
        default_function = ""
        default_ret: list[Retention] = []
        for d in doc.get("data", []):
            if not isinstance(d, dict):
                raise ValueError(f"rollup JSON: row is not an object: {d!r}")
            for key in ("regexp", "function", "age", "precision"):
                if d.get(key) is not None and not isinstance(d[key], str):
                    # Go unmarshals these into string fields; any other
                    # JSON type (including a bare integer age/precision)
                    # is an unmarshal error there too
                    raise ValueError(
                        f"rollup JSON: {key} must be a string: {d[key]!r}"
                    )
            rt_raw = d.get("rule_type")
            if rt_raw is not None:
                # RuleType.UnmarshalJSON -> Set(lower(s)): anything other
                # than the four known names is an error (rules.go:38-61)
                if not isinstance(rt_raw, str) or rt_raw.lower() not in (
                    RULE_ALL, RULE_PLAIN, RULE_TAGGED, RULE_TAG_LIST
                ):
                    raise ValueError(f"invalid rule type {rt_raw!r}")
            isdef = d.get("is_default")
            if isdef is not None and (
                isinstance(isdef, bool) or not isinstance(isdef, int)
            ):
                # Go's IsDefault is an int field: a string "1", a bool, or
                # ANY number written with a fraction point is an unmarshal
                # error there ("cannot unmarshal number 1.0 into ... int"),
                # so integral floats like 1.0 must be rejected too — Go
                # json decides by the literal's spelling, not its value
                raise ValueError(
                    f"rollup JSON: is_default must be an integer: {isdef!r}"
                )
            age = d.get("age") or ""
            prec = d.get("precision") or ""
            has_ret = age != "" and prec != "" and prec != "0"
            if isdef == 1:
                if d.get("function"):
                    default_function = d["function"]
                if has_ret:
                    default_ret.append(
                        Retention(_parse_i32(age, d), _parse_i32(prec, d))
                    )
                continue
            regexp = d.get("regexp", "") or ""
            function = d.get("function", "") or ""
            rule_type = (d.get("rule_type") or RULE_ALL).lower()
            if (
                not groups
                or groups[-1]["regexp"] != regexp
                or groups[-1]["function"] != function
            ):
                groups.append({
                    "regexp": regexp, "function": function,
                    "rule_type": rule_type, "retention": [],
                })
            if has_ret:
                groups[-1]["retention"].append(
                    Retention(_parse_i32(age, d), _parse_i32(prec, d))
                )
        patterns: list[Pattern] = []
        for g in groups:
            regexp, rule_type = g["regexp"], g["rule_type"]
            if rule_type == RULE_TAG_LIST:
                regexp = _tag_list_to_regexp(regexp)
                rule_type = RULE_TAGGED
            patterns.append(Pattern(
                regexp=regexp,
                function=g["function"] or None,
                retention=g["retention"],
                rule_type=rule_type,
            ))
        if default_function or default_ret:
            patterns.append(Pattern(
                regexp="", function=default_function or None,
                retention=default_ret,
            ))
        return cls(patterns)

    @classmethod
    def from_compact(cls, text: str) -> "Rules":
        """Parse the compact rollup form (helper/rollup/compact.go:15-64):
        one rule per line, ``regexp;function;age:precision,...`` — the
        format the reference's own test fixtures use. Split on the LAST
        two semicolons like the reference, so regexps may contain ';'."""
        patterns: list[Pattern] = []
        for line in text.split("\n"):
            if not line.strip():
                continue
            p2 = line.rfind(";")
            if p2 < 0:
                raise ValueError(f"can't parse line: {line!r}")
            p1 = line.rfind(";", 0, p2)
            if p1 < 0:
                raise ValueError(f"can't parse line: {line!r}")
            regexp = line[:p1].strip()
            function = line[p1 + 1:p2].strip()
            retention = []
            if line[p2 + 1:].strip():
                for r in line[p2 + 1:].split(","):
                    parts = r.split(":")
                    if len(parts) != 2:
                        raise ValueError(f"can't parse line: {line!r}")
                    age_s, prec_s = parts[0].strip(), parts[1].strip()
                    # the reference parses with ParseUint(..., 10, 32)
                    # (helper/rollup/compact.go): '-'/'+' prefixes and
                    # out-of-range values are parse errors, not rules —
                    # a negative age would also corrupt retention-
                    # interval ordering in lookup()
                    if not (age_s.isascii() and age_s.isdigit()
                            and prec_s.isascii() and prec_s.isdigit()):
                        raise ValueError(f"can't parse line: {line!r}")
                    age_v, prec_v = int(age_s), int(prec_s)
                    if age_v >= 1 << 32 or prec_v >= 1 << 32:
                        raise ValueError(f"can't parse line: {line!r}")
                    retention.append(Retention(age_v, prec_v))
            patterns.append(
                Pattern(regexp=regexp, function=function or None,
                        retention=retention)
            )
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
        precision, function, _, _ = self.lookup_verbose(metric, age)
        return precision, function

    def lookup_verbose(
        self, metric: str, age: int
    ) -> tuple[int, str, "Pattern | None", "Pattern | None"]:
        """-> (precision, function, aggr_pattern, retention_pattern):
        which patterns supplied the function and the precision — the
        reference's verbose Lookup (rules.go:285), backing the CLI
        `match` debug command (graphite-clickhouse.go:299-324)."""
        function: str | None = None
        precision: int | None = None
        aggr_pattern: Pattern | None = None
        retention_pattern: Pattern | None = None
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
                aggr_pattern = p
            if precision is None and p.retention:
                ret = p.retention
                for i, r in enumerate(ret):
                    if age < r.age:
                        if i > 0:
                            precision = ret[i - 1].precision
                            retention_pattern = p
                        break
                    if i == len(ret) - 1:
                        precision = r.precision
                        retention_pattern = p
                        break
            if function is not None and precision is not None:
                return precision, function, aggr_pattern, retention_pattern
        return (
            precision if precision is not None else SUPER_DEFAULT_PRECISION,
            function if function is not None else SUPER_DEFAULT_FUNCTION,
            aggr_pattern,
            retention_pattern,
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


# ---------------------------------------------------------------------------
# GraphiteMergeTree background-merge equivalent
# ---------------------------------------------------------------------------


def rollup_specs_df(spark, rules: "Rules", paths_df):
    """Distributed (path -> function, retention ladder) binding.

    Spark-side twin of Rules.lookup for UNBOUNDED path sets (a storage
    merge touches every metric, unlike a render which sees a resolved
    list): the ordered pattern list is tiny and driver-resident, so the
    first-match-wins selection compiles to ONE stacked CASE WHEN
    projection over the distinct paths — per path the FIRST matching
    pattern with a function fixes the function and the FIRST with a
    retention fixes the ladder (ClickHouse selectPatternForPath
    semantics; the reference client mirrors it at
    helper/rollup/rules.go:298-363). The previous formulation joined a
    broadcast pattern table with a non-equi `rlike` predicate
    (BroadcastNestedLoopJoin) + a min_by aggregate + an anti-join union
    for the no-match default — 2 extra Exchanges and 2 extra scans of
    the path universe for what a codegen'd projection expresses
    directly; a CASE chain over tens-of-patterns rule sets stays well
    inside codegen limits.

    Returns (path, function, ladder array<struct<age int, precision int>>).
    """
    from pyspark.sql import functions as F

    paths = paths_df.select("path").distinct()
    tagged = F.instr("path", "?") > 0

    def match_cond(p) -> "F.Column":
        type_ok = F.when(tagged, F.lit(p.rule_type != RULE_PLAIN)).otherwise(
            F.lit(p.rule_type in (RULE_ALL, RULE_PLAIN))
        )
        if not p.regexp:
            return type_ok
        return type_ok & F.col("path").rlike(p.regexp)

    def ladder_lit(retention) -> "F.Column":
        return F.array(
            *[
                F.struct(
                    F.lit(r.age).cast("int").alias("age"),
                    F.lit(r.precision).cast("int").alias("precision"),
                )
                for r in retention
            ]
        )

    fn = F.lit(SUPER_DEFAULT_FUNCTION)
    ladder = F.array(
        F.struct(
            F.lit(0).cast("int").alias("age"),
            F.lit(SUPER_DEFAULT_PRECISION).cast("int").alias("precision"),
        )
    )
    # build the chains back-to-front so earlier patterns take precedence
    for p in reversed(rules.patterns):
        if p.function is not None:
            fn = F.when(match_cond(p), F.lit(p.function)).otherwise(fn)
        if p.retention:
            ladder = F.when(match_cond(p), ladder_lit(p.retention)).otherwise(ladder)
    return paths.select("path", fn.alias("function"), ladder.alias("ladder"))


def graphite_merge(
    df,
    rules: "Rules",
    now_ts: int,
    path_col: str = "path",
    time_col: str = "time",
    value_col: str = "value",
    version_col: str = "version",
):
    """GraphiteMergeTree merge, as a batch Spark job: round each row's time
    to the retention precision for its age, version-dedup rows whose
    (path, time) collide, then aggregate each (path, bucket) with the
    metric's rollup function.

    This is what ClickHouse does to the points table in background merges /
    OPTIMIZE FINAL (tests/clickhouse/rollup/init.sql:1-18 GraphiteMergeTree;
    semantics pinned by the reference e2e corpus: tests/agg_merge — bucket
    collisions aggregate; tests/agg_latest — equal post-rounding times
    dedup by write-version; rows younger than the first retention age or in
    the future stay raw, matching CH's `time_of_merge` age guard).

    One pass over the points: broadcast-joined specs, two key-compatible
    aggregations (dedup on (path,time,bucket), then rollup on
    (path,bucket)) — partial aggregation collapses duplicates map-side.
    """
    from pyspark.sql import functions as F

    from .resample import AGG_FUNCTIONS  # noqa: F401  (closed function map)

    specs = rollup_specs_df(df.sparkSession, rules, df.select(path_col))
    j = df.join(specs, path_col)
    age = F.lit(now_ts) - F.col(time_col)
    # last ladder entry with entry.age <= age; younger/future rows stay raw
    applicable = F.filter("ladder", lambda x: x["age"] <= age)
    precision = F.when(
        (age >= 0) & (F.size(applicable) > 0),
        F.element_at(applicable, -1)["precision"],
    ).otherwise(F.lit(1))
    bucket = F.col(time_col) - F.col(time_col) % precision
    rows = j.select(
        path_col,
        bucket.alias("__bucket"),
        F.col(time_col).alias("__t"),
        value_col,
        version_col,
        "function",
    )
    # 1) ReplacingMergeTree step: equal (path, raw time) -> max version
    # row. max_by keeps the aggregation buffer primitive (long ordering +
    # double value), so both aggregates below run as HashAggregate; the
    # previous max-of-struct form forced SortAggregate + a full Sort per
    # aggregation (struct buffers are not hash-aggregatable). Version
    # ties within a (path, time) cell are ClickHouse-"any row" semantics
    # to begin with (ReplacingMergeTree keeps an arbitrary max-version
    # row); real graphite writes carry unique versions per cell.
    # `function` rides as a GROUP KEY, not a first() aggregate: it is
    # functionally dependent on path (one spec per path), so the groups
    # are identical — and First's buffer holds the string value, which
    # is not hash-aggregatable and forced both aggregations back to
    # SortAggregate despite the primitive max_by buffers.
    dedup = rows.groupBy(path_col, "__bucket", "__t", "function").agg(
        F.max_by(F.col(value_col), F.col(version_col)).alias(value_col),
        F.max(version_col).alias(version_col),
    )
    # 2) rollup step: aggregate the bucket with the metric's function.
    # After the dedup each (path, bucket) group holds one row per __t,
    # so ordering by __t alone is the same (t, version) order the
    # any/anyLast semantics need — and keeps the buffer primitive.
    v = F.col(value_col)
    order = F.col("__t")
    fn = F.col("function")
    agged = dedup.groupBy(path_col, "__bucket", "function").agg(
        F.avg(v).alias("_avg"),
        F.sum(v).alias("_sum"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
        F.min_by(v, order).alias("_any"),
        F.max_by(v, order).alias("_anyLast"),
        F.max(version_col).alias(version_col),
    )
    value = (
        F.when(fn == "avg", F.col("_avg"))
        .when(fn == "sum", F.col("_sum"))
        .when(fn == "min", F.col("_min"))
        .when(fn == "max", F.col("_max"))
        .when(fn == "any", F.col("_any"))
        .when(fn == "anyLast", F.col("_anyLast"))
        .otherwise(F.col("_avg"))
    )
    out = agged.select(
        path_col,
        F.col("__bucket").alias(time_col),
        value.alias(value_col),
        version_col,
    )
    if "date" in df.columns:
        out = out.withColumn(
            "date", F.to_date(F.timestamp_seconds(F.col(time_col)))
        )
    return out
