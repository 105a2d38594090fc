"""Graphite glob target -> Spark Column predicate compiler.

Semantics mirror the reference's glob handling (see SURVEY.md §2.2):
- glob->regex translation: /root/reference/pkg/where/where.go:61-72
- brace expansion (Grafana multi-value): pkg/where/where.go:19-59
- single-element {x}/[x] cleanup: pkg/where/match.go:11-97
- unmatched-bracket validation: pkg/where/match.go:99-134
- wildcard-distance guard: pkg/where/where.go:86-97
- predicate construction (prefix + anchored regex): pkg/where/match.go:136-190

All driver-side pure Python; the output is a `pyspark.sql.Column` that
Catalyst pushes into the Parquet scan (startswith -> StringStartsWith
pushed filter; the regex runs post-scan).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

WILDCARD_CHARS = "[]{}*?"


class GlobError(ValueError):
    """Malformed glob query (reference answers HTTP 400)."""

    http_status = 400


def has_wildcard(target: str) -> bool:
    return any(c in target for c in WILDCARD_CHARS)


def index_wildcard(target: str) -> int:
    idxs = [target.find(c) for c in WILDCARD_CHARS if c in target]
    return min(idxs) if idxs else -1


def index_last_wildcard(target: str) -> int:
    return max((target.rfind(c) for c in WILDCARD_CHARS), default=-1)


def max_wildcard_distance(query: str) -> int:
    """Node distance of the closest wildcard to either end of the query.

    Used by the `wildcard-min-distance` guard (reference rejects queries
    whose wildcards are too far from both ends: finder/index.go:180-197).
    Returns -1 when the query has no wildcard.
    """
    if not has_wildcard(query):
        return -1
    first = query[: index_wildcard(query)].count(".")
    last = query[index_last_wildcard(query) :].count(".")
    return max(first, last)


def glob_to_regexp(g: str) -> str:
    """Translate a graphite glob into a regex (unanchored, caller anchors).

    `.`->`[.]`, `$`->`[$]`, `{a,b}`->`(a|b)`, `?`->`[^.]`, `*`->`([^.]*?)`.
    Character classes `[...]` pass through as regex classes.
    """
    out = []
    for ch in g:
        if ch == ".":
            out.append("[.]")
        elif ch == "$":
            out.append("[$]")
        elif ch == "{":
            out.append("(")
        elif ch == "}":
            out.append(")")
        elif ch == ",":
            out.append("|")
        elif ch == "?":
            out.append("[^.]")
        elif ch == "*":
            out.append("([^.]*?)")
        else:
            out.append(ch)
    return "".join(out)


def expand_braces(value: str) -> list[str]:
    """Expand `S{a,b}E` -> [SaE, SbE] recursively (one level of braces at a
    time, no nesting allowed — matches the reference's GlobExpandSimple)."""
    result: list[str] = []

    def rec(rest: str, prefix: str) -> None:
        if not rest:
            result.append(prefix)
            return
        m = re.search(r"[{}]", rest)
        if m is None:
            result.append(prefix + rest)
            return
        start = m.start()
        if rest[start] == "}":
            raise GlobError(f"malformed glob: {rest}")
        end = rest.find("}", start)
        if end == -1 or end - start <= 1:
            raise GlobError(f"malformed glob: {rest}")
        inner = rest[start + 1 : end]
        if "{" in inner:
            raise GlobError(f"malformed glob: {rest}")
        head = prefix + rest[:start]
        tail = rest[end + 1 :]
        for alt in inner.split(","):
            rec(tail, head + alt)

    rec(value, "")
    return result


def clear_glob(query: str) -> str:
    """Strip single-element `{x}` / `[x]` groups (Grafana artifacts).

    Groups that span a `.` or are unterminated are left untouched (they are
    reported by `validate_glob` instead).
    """

    def _node(node: str) -> str:
        node = re.sub(r"\{([^},.]*)\}", r"\1", node)  # {x} with no comma
        node = re.sub(r"\[(.)\]", r"\1", node)  # [x] single char
        return node

    return ".".join(_node(n) for n in query.split("."))


def has_unmatched_brackets(query: str) -> bool:
    pairs = {"}": "{", "]": "["}
    for node in query.split("."):
        stack: list[str] = []
        for c in node:
            if c in "{[":
                stack.append(c)
            elif c in "}]":
                if not stack or stack[-1] != pairs[c]:
                    return True
                stack.pop()
        if stack:
            return True
    return False


def validate_glob(query: str, wildcard_min_distance: int = 0) -> str:
    """Cleanup + guard checks; returns the cleaned query or raises GlobError."""
    query = clear_glob(query)
    if has_unmatched_brackets(query):
        raise GlobError(f"query has unmatched brackets: {query}")
    if wildcard_min_distance > 0 and "." in query:
        # single-node queries are exempt so root browsing stays possible
        # (finder/index.go:185-193 moreThanOneNode)
        d = max_wildcard_distance(query)
        if 0 <= d < wildcard_min_distance:
            # exact reference wording (finder/index.go:193) — the e2e
            # corpus matches it with error_regexp
            raise GlobError(
                "query has wildcards way too early at the start and at the end of it"
            )
    return query


def reverse_path(path: str) -> str:
    """Dot-segment reversal: 'a.b.c' -> 'c.b.a' (pkg/reverse/reverse.go:8-22).

    Tagged paths (containing '?') are never reversed. Works on globs too —
    wildcards live inside nodes, and node order is all that flips."""
    if "?" in path:
        return path
    return ".".join(reversed(path.split(".")))


#: index-reverse modes (finder/index.go:13-17)
REVERSE_AUTO = "auto"
REVERSE_DIRECT = "direct"
REVERSE_REVERSED = "reversed"


class ReverseRule:
    """One [[clickhouse.index-reverses]] entry: first matching rule decides
    the mode for a query (finder/index.go:80-98, config/config.go
    IndexReverseRule). A rule matches when ALL of its set conditions hold."""

    def __init__(self, reverse: str, prefix: str = "", suffix: str = "",
                 regex: str | None = None):
        if reverse not in (REVERSE_AUTO, REVERSE_DIRECT, REVERSE_REVERSED):
            raise ValueError(f"bad index-reverse: {reverse!r}")
        self.reverse = reverse
        self.prefix = prefix
        self.suffix = suffix
        self.rx = re.compile(regex) if regex else None

    def matches(self, query: str) -> bool:
        if self.prefix and not query.startswith(self.prefix):
            return False
        if self.suffix and not query.endswith(self.suffix):
            return False
        if self.rx is not None and self.rx.search(query) is None:
            return False
        return True


def use_reverse(query: str, mode: str = REVERSE_AUTO,
                rules: tuple[ReverseRule, ...] | list[ReverseRule] = ()) -> bool:
    """Should this query match against the REVERSED path index?

    Mirrors IndexFinder.useReverse (finder/index.go:100-130): explicit
    mode wins; then the first matching per-query rule; then the auto
    heuristic — reverse iff the first wildcard is more nodes away from the
    END than from the START (so the literal suffix, as a reversed prefix,
    prunes more than the literal prefix would)."""
    if mode == REVERSE_DIRECT:
        return False
    if mode == REVERSE_REVERSED:
        return True
    for rule in rules:
        if rule.matches(query):
            if rule.reverse != REVERSE_AUTO:
                return rule.reverse == REVERSE_REVERSED
            break
    w = index_wildcard(query)
    if w == -1:
        return False
    first_wildcard_node = query[:w].count(".")
    last_wildcard_node = query[index_last_wildcard(query):].count(".")
    return first_wildcard_node < last_wildcard_node


def non_wildcard_prefix(g: str) -> str:
    """Literal prefix of a glob up to its first wildcard char (used as a
    pushdown-friendly startswith pre-filter, reference match.go:146-153)."""
    i = index_wildcard(g)
    return g if i == -1 else g[:i]


def glob_predicate(col: Column, query: str) -> Column | None:
    """Compile one glob into a Column predicate over a path column.

    Mirrors where.TreeGlob / where.Glob:
    - bare `*`            -> None (match everything; no filter at all)
    - no wildcard         -> equality
    - `prefix*` only-tail -> startswith(prefix)
    - otherwise           -> startswith(literal prefix) AND rlike('^regex$')
    """
    if query == "*":
        return None
    if not has_wildcard(query):
        return col == query
    prefix = non_wildcard_prefix(query)
    rest = query[len(prefix) :]
    if rest == "*":
        return col.startswith(prefix)
    pattern = "^" + glob_to_regexp(query) + "$"
    # the rlike pattern compiles LAZILY inside the Spark job: an invalid
    # one (GlobToRegexp never escapes regex metachars, reference
    # where.go:61-72, so e.g. '[]!&)' produces garbage) would surface as
    # a PatternSyntaxException that ABORTS the job and killed the HTTP
    # handler thread without a response (found by the server fuzz).
    # Validate at plan-build time -> GlobError -> 400.
    try:
        re.compile(pattern)
    except re.error as exc:
        raise GlobError(f"invalid glob {query!r}: {exc}")
    pred = col.rlike(pattern)
    if prefix:
        pred = col.startswith(prefix) & pred
    return pred


def glob_predicate_multi(col: Column, queries: list[str]) -> Column | None:
    """OR of several globs (split-query union SO2); exact matches collapse
    into one isin()."""
    exacts = [q for q in queries if not has_wildcard(q)]
    globs = [q for q in queries if has_wildcard(q)]
    preds: list[Column] = []
    if exacts:
        preds.append(col.isin(exacts) if len(exacts) > 1 else (col == exacts[0]))
    for g in globs:
        p = glob_predicate(col, g)
        if p is None:
            return None  # one bare * matches everything
        preds.append(p)
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def split_query(query: str, max_node_to_split_index: int) -> list[str]:
    """try-split-query: expand ONE brace list of a plain query into N
    queries so each part can (a) pass the wildcard-min-distance guard and
    (b) get a selective direct/reversed index prefix
    (finder/split.go:130-225 splitQuery; truth table split_test.go:16-200).

    Which list is expanded: if one side of the query (before the first
    '{' / after the last '}') is wildcard-free, that side's list is
    expanded — but only when that side's literal node count is within
    max-node-to-split-index; wildcards on both sides → no split; no
    wildcards at all → the side with more literal nodes (ties broken by
    more choices in the leftmost list).
    """
    first_open = query.find("{")
    first_close = query.find("}")
    last_open = query.rfind("{")
    last_close = query.rfind("}")

    direct_node_count = query[:first_open].count(".")
    direct_wildcard = index_wildcard(query[:first_open])
    reverse_node_count = query[last_close:].count(".")
    if last_close == len(query) - 1:
        reverse_wildcard = -1
    else:
        reverse_wildcard = index_last_wildcard(query[last_close + 1:])

    use_direct = True
    if direct_wildcard >= 0 and reverse_wildcard >= 0:
        return [query]
    elif direct_wildcard < 0 and reverse_wildcard >= 0:
        if direct_node_count > max_node_to_split_index:
            return [query]
        use_direct = True
    elif direct_wildcard >= 0 and reverse_wildcard < 0:
        if reverse_node_count > max_node_to_split_index:
            return [query]
        use_direct = False
    else:
        if (direct_node_count > max_node_to_split_index
                and reverse_node_count > max_node_to_split_index):
            return [query]

    if last_open < first_close:
        # only one list in the query: expand it in place
        return expand_braces(query)

    choices_left = query[first_open:first_close].count(",")
    choices_right = query[last_open:last_close].count(",")

    if direct_wildcard < 0 and reverse_wildcard < 0:
        if direct_node_count > reverse_node_count:
            if direct_node_count > max_node_to_split_index:
                return [query]
            use_direct = True
        elif reverse_node_count > direct_node_count:
            if reverse_node_count > max_node_to_split_index:
                return [query]
            use_direct = False
        else:
            use_direct = choices_left >= choices_right

    if use_direct:
        prefix, part, suffix = "", query[:first_close + 1], query[first_close + 1:]
    else:
        prefix, part, suffix = query[:last_open], query[last_open:], ""
    return [prefix + p + suffix for p in expand_braces(part)]
