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

from .glob import has_wildcard

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


def _star_mask_regexp(value: str) -> str:
    """Tagged `=` wildcard semantics (tagged.go concatMask:125-128 +
    where.Like): `*` is the ONLY wildcard and crosses everything — it
    compiles to ClickHouse LIKE `%`, not the path-glob `[^.]*` (a dotted
    tag value like `1.2.3` or an FQDN must match `1.*`). All other
    characters are literal. Upstream hands the value to LIKE unescaped,
    so a literal `_`/`%` would also act as a wildcard there — an
    escaping defect this build deliberately does not reproduce."""
    return "".join(".*" if ch == "*" else re.escape(ch) for ch in value)


def _glob_expand_simple(value: str, prefix: str = "") -> list[str]:
    """pkg/where.GlobExpandSimple (where.go:19-58): expand ONE-LEVEL
    `{a,b}` lists into concrete values; nested/unclosed braces are a
    malformed glob (HTTP 400 upstream)."""
    if value == "":
        return [prefix]
    idxs = [i for i, ch in enumerate(value) if ch in "{}"]
    if not idxs:
        return [prefix + value]
    start = idxs[0]
    end = value[start:].find("}")
    if end <= 1 or any(c in "{}" for c in value[start + 1:start + end]):
        raise TaggedParseError(f"malformed glob: {value}")
    pre = prefix + value[:start]
    postfix = value[start + end + 1:]
    out: list[str] = []
    for part in value[start + 1:start + end].split(","):
        out.extend(_glob_expand_simple(postfix, pre + part))
    return out


def _match_regexp(value: str) -> str:
    """`=~` regex shaping (pkg/where quoteRegex/escapeRegex:117-164): a
    leading `^` binds the WHOLE expression — upstream emits
    `^key=(alt1|alt2)`, so `^cpu|mem` means "starts with cpu OR starts
    with mem", NOT "starts with cpu, or mem anywhere" (naive rlike
    semantics; golden-table-found divergence). Alternations are wrapped
    in a group; without `^` the search is unanchored, which rlike
    already is."""
    if value.startswith("^"):
        rest = value[1:]
        return "^(" + rest + ")" if "|" in rest else "^" + rest
    return "(" + value + ")" if "|" in value else value


def term_predicate(
    term: TaggedTerm, tags_col: Column, flags: FeatureFlags = FeatureFlags()
) -> Column:
    """One TaggedTerm -> boolean Column over a MAP<STRING,STRING> column.

    Flag semantics from finder/tagged.go:130-282 (see FeatureFlags).
    `=`/`!=` value semantics follow TaggedTermWhere1 exactly: a value
    containing `*` becomes the LIKE mask (checked BEFORE braces, so
    braces alongside a star are literal, as upstream); otherwise braces
    expand to an equality list via GlobExpandSimple."""
    v = tags_col.getItem(term.key)
    if term.op == "=":
        if term.value == "":
            if flags.use_carbon_behaviour:
                return v.isNull()  # tag absent (tagged.go:135-139)
            return v.isNotNull() & (v == "")  # Eq(Tag1,'key=') (tagged.go:150-156)
        if "*" in term.value:
            return v.isNotNull() & v.rlike(
                "^" + _star_mask_regexp(term.value) + "$"
            )
        vals = _glob_expand_simple(term.value)
        if len(vals) == 1:
            return v == vals[0]
        return v.isin(vals)
    if term.op == "!=":
        if term.value == "":
            # tag exists and non-empty, regardless of flags (tagged.go:158-162)
            return v.isNotNull() & (v != "")
        if "*" in term.value:
            base = ~v.rlike("^" + _star_mask_regexp(term.value) + "$")
        else:
            vals = _glob_expand_simple(term.value)
            base = ~v.isin(vals) if len(vals) > 1 else v != vals[0]
        if flags.dont_match_missing_tags:
            return v.isNotNull() & base  # (tagged.go:164-167)
        return v.isNull() | base
    if term.op == "=~":
        if term.value in ("", "*"):
            # where.Match special case (pkg/where/match.go:205-208):
            # empty/star regex degrades to "tag present"
            return v.isNotNull()
        _validate_regex(term.value)
        return v.isNotNull() & v.rlike(_match_regexp(term.value))
    if term.op == "!=~":
        if term.value in ("", "*"):
            if flags.dont_match_missing_tags:
                return v.isNotNull() & F.lit(False)
            return v.isNull()
        _validate_regex(term.value)
        if flags.dont_match_missing_tags:
            return v.isNotNull() & ~v.rlike(_match_regexp(term.value))  # (tagged.go:194-199)
        return v.isNull() | ~v.rlike(_match_regexp(term.value))
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
    if not terms:
        # an empty matcher list is a malformed query, not a match-all:
        # the reference errors on empty seriesByTag AT PARSE TIME, before
        # any term counting (tagged.go:433 ErrNotEnoughArgsSeriesByTag),
        # so this check runs BEFORE the min_positive_terms cost guard —
        # otherwise a configured tags-min-in-query > 0 would turn the
        # malformed-query 400 into a costly-series 403 (r8 ADVICE). A
        # hostile remote-read body can produce a ReadRequest whose matcher
        # list parses to zero usable terms (r8 body-fuzz find — this must
        # surface as the typed 400, not an IndexError 500).
        raise TaggedParseError("empty tagged term list")
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
