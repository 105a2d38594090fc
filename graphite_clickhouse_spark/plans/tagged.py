"""seriesByTag expression -> Spark Column predicate compiler.

Reference semantics (/root/reference/finder/tagged.go):
- parse `seriesByTag('k=v', 'k2=~re', ...)` into TaggedTerms
  {key, op ∈ {=, !=, =~, !=~}, value} (tagged.go:28-47,389-438)
- `name` / `__name__` is tag `__name__` (tagged.go:318-325)
- `=` with empty value means "tag absent or empty"
- wildcard values in `=` terms are expanded like globs (tagged.go:84-128)
- terms are cost-sorted so the cheapest drives the scan (tagged.go:51-76)
  -> in Spark conjunct ordering is Catalyst's job; we keep the semantic
  guardrail (min non-negative terms) only.

The engine stores tags as MAP<STRING,STRING> (SURVEY.md §1.2): predicates
compile to map lookups — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .glob import glob_to_regexp, has_wildcard

TERM_RE = re.compile(r"^\s*([^=!~\s]+)\s*(!=~|=~|!=|=)\s*(.*)$")
SERIES_BY_TAG_RE = re.compile(r"^seriesByTag\s*\((.*)\)\s*$", re.DOTALL)


class TaggedParseError(ValueError):
    http_status = 400


class CostlySeriesByTagError(TaggedParseError):
    """tags-min-in-query / tags-min-in-autocomplete rejection
    (finder/tagged.go:23 ErrCostlySeriesByTag, HTTP 403)."""

    http_status = 403

    def __init__(self) -> None:
        super().__init__("seriesByTag argument has too much wildcard and regex terms")


@dataclass
class TaggedTerm:
    key: str
    op: str  # '=', '!=', '=~', '!=~'
    value: str

    @property
    def is_positive(self) -> bool:
        return self.op in ("=", "=~") and self.value != ""


@dataclass(frozen=True)
class FeatureFlags:
    """Tag-matching feature flags (doc/config.md:35-63, applied in
    finder/tagged.go:130-282). Both default false, as in the reference.

    - use_carbon_behaviour: `t=` (empty =) matches metrics WITHOUT tag t
      (otherwise it matches metrics where t is present and empty).
    - dont_match_missing_tags: `t!=v` / `t!=~re` require tag t present
      (otherwise metrics missing t also match).
    """

    use_carbon_behaviour: bool = False
    dont_match_missing_tags: bool = False


class RegexSyntaxError(TaggedParseError):
    """Invalid =~/!=~ regex. The reference surfaces ClickHouse's re2
    compile failure as HTTP 400 "Incorrect regex syntax"
    (helper/clickhouse/clickhouse.go:88); we validate at plan time."""

    http_status = 400

    def __init__(self) -> None:
        super().__init__("Incorrect regex syntax")


def _validate_regex(value: str) -> None:
    try:
        re.compile(value)
    except re.error:
        raise RegexSyntaxError() from None


def parse_series_by_tag(target: str) -> list[TaggedTerm]:
    """`seriesByTag('tag1=value1', 'name=~cpu.*')` -> [TaggedTerm...]."""
    m = SERIES_BY_TAG_RE.match(target.strip())
    if not m:
        raise TaggedParseError(f"not a seriesByTag call: {target}")
    inner = m.group(1).strip()
    args: list[str] = []
    i = 0
    while i < len(inner):
        ch = inner[i]
        if ch in "'\"":
            j = inner.find(ch, i + 1)
            if j == -1:
                raise TaggedParseError(f"unterminated string in: {target}")
            args.append(inner[i + 1 : j])
            i = j + 1
        elif ch in ", \t\n":
            i += 1
        else:
            raise TaggedParseError(f"unexpected char {ch!r} in: {target}")
    return parse_tagged_conditions(args)


def parse_tagged_conditions(exprs: list[str]) -> list[TaggedTerm]:
    terms = []
    for e in exprs:
        if not e:
            continue
        m = TERM_RE.match(e)
        if not m:
            raise TaggedParseError(f"cannot parse tagged term: {e}")
        key, op, value = m.group(1), m.group(2), m.group(3)
        if key in ("name", "__name__"):
            key = "__name__"
        terms.append(TaggedTerm(key, op, value))
    # __name__ first, then positives before negatives (cost order,
    # tagged.go:51-76) — semantic no-op in Spark but keeps plans readable.
    terms.sort(key=lambda t: (t.key != "__name__", not t.is_positive))
    return terms


def term_predicate(
    term: TaggedTerm, tags_col: Column, flags: FeatureFlags = FeatureFlags()
) -> Column:
    """One TaggedTerm -> boolean Column over a MAP<STRING,STRING> column.

    Flag semantics from finder/tagged.go:130-282 (see FeatureFlags)."""
    v = tags_col.getItem(term.key)
    if term.op == "=":
        if term.value == "":
            if flags.use_carbon_behaviour:
                return v.isNull()  # tag absent (tagged.go:135-139)
            return v.isNotNull() & (v == "")  # Eq(Tag1,'key=') (tagged.go:150-156)
        if has_wildcard(term.value):
            return v.isNotNull() & v.rlike("^" + glob_to_regexp(term.value) + "$")
        return v == term.value
    if term.op == "!=":
        if term.value == "":
            # tag exists and non-empty, regardless of flags (tagged.go:158-162)
            return v.isNotNull() & (v != "")
        if has_wildcard(term.value):
            base = ~v.rlike("^" + glob_to_regexp(term.value) + "$")
        else:
            base = v != term.value
        if flags.dont_match_missing_tags:
            return v.isNotNull() & base  # (tagged.go:164-167)
        return v.isNull() | base
    if term.op == "=~":
        if term.value in ("", "*"):
            # where.Match special case (pkg/where/match.go:205-208):
            # empty/star regex degrades to "tag present"
            return v.isNotNull()
        _validate_regex(term.value)
        return v.isNotNull() & v.rlike(term.value)
    if term.op == "!=~":
        if term.value in ("", "*"):
            if flags.dont_match_missing_tags:
                return v.isNotNull() & F.lit(False)
            return v.isNull()
        _validate_regex(term.value)
        if flags.dont_match_missing_tags:
            return v.isNotNull() & ~v.rlike(term.value)  # (tagged.go:194-199)
        return v.isNull() | ~v.rlike(term.value)
    raise TaggedParseError(f"unknown op: {term.op}")


def tagged_predicate(
    terms: list[TaggedTerm],
    tags_col: Column,
    min_positive_terms: int = 0,
    flags: FeatureFlags = FeatureFlags(),
) -> Column:
    """AND of all terms. Guardrail: at least `min_positive_terms` positive
    (non-negated, non-empty) terms required — the reference's
    tags-min-in-query rejection (tagged.go:357-363; config default 0,
    doc/config.md:352)."""
    # reference counting (tagged.go:325-363): only `=` terms whose value
    # has no glob wildcard count; under use-carbon-behaviour an empty `t=`
    # is wildcard-like (matches every metric without the tag) so it stops
    # counting too
    non_wildcards = sum(
        1
        for t in terms
        if t.op == "="
        and not has_wildcard(t.value)
        and not (flags.use_carbon_behaviour and t.value == "")
    )
    if min_positive_terms > 0 and non_wildcards < min_positive_terms:
        raise CostlySeriesByTagError()
    pred = term_predicate(terms[0], tags_col, flags)
    for t in terms[1:]:
        pred = pred & term_predicate(t, tags_col, flags)
    return pred
