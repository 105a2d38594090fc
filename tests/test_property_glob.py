"""Property-based tests (hypothesis) for the driver-side compilers:
glob -> regex translation, brace expansion, and time-spec parsing.

The reference has no property tests (SURVEY.md §5.5); these pin the
invariants its table-driven tests sample: a glob derived from a path
always matches that path, `*`/`?` never cross dot boundaries, brace
expansion is the cross product of its lists, and relative time specs are
exact offset arithmetic.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from graphite_clickhouse_spark.functions.datetime_spec import (
    date_param_to_epoch,
    interval_seconds,
)
from graphite_clickhouse_spark.plans.glob import expand_braces, glob_to_regexp

# graphite-legal metric-name segments (the reference never escapes regex
# metachars in GlobToRegexp, pkg/where/where.go:61-72 — so neither do we,
# and neither does this alphabet)
segment = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=8
)
paths = st.lists(segment, min_size=1, max_size=5).map(".".join)


def full_match(g: str, s: str) -> bool:
    return re.fullmatch(glob_to_regexp(g), s) is not None


class TestGlobRegex:
    @given(paths)
    @settings(max_examples=200, deadline=None)
    def test_identity_glob_matches_itself(self, path):
        assert full_match(path, path)

    @given(paths, st.data())
    @settings(max_examples=200, deadline=None)
    def test_star_segment_matches(self, path, data):
        """Replacing any one segment with * still matches the path."""
        parts = path.split(".")
        i = data.draw(st.integers(0, len(parts) - 1))
        glob = ".".join(parts[:i] + ["*"] + parts[i + 1:])
        assert full_match(glob, path)

    @given(paths, st.data())
    @settings(max_examples=200, deadline=None)
    def test_question_mark_matches_one_char(self, path, data):
        parts = path.split(".")
        i = data.draw(st.integers(0, len(parts) - 1))
        j = data.draw(st.integers(0, len(parts[i]) - 1))
        seg = parts[i][:j] + "?" + parts[i][j + 1:]
        glob = ".".join(parts[:i] + [seg] + parts[i + 1:])
        assert full_match(glob, path)

    @given(paths, segment)
    @settings(max_examples=200, deadline=None)
    def test_star_never_crosses_dots(self, path, extra):
        """`a.*` must not match `a.b.c`: * is a single-node wildcard."""
        deeper = path + "." + extra
        parts = path.split(".")
        glob = ".".join(parts[:-1] + ["*"])
        assert full_match(glob, path)
        assert not full_match(glob, deeper)

    @given(paths, st.data())
    @settings(max_examples=200, deadline=None)
    def test_brace_choice_matches(self, path, data):
        """{chosen,other} in place of a segment matches the path."""
        parts = path.split(".")
        i = data.draw(st.integers(0, len(parts) - 1))
        other = data.draw(segment)
        glob = ".".join(
            parts[:i] + ["{%s,%s}" % (parts[i], other)] + parts[i + 1:]
        )
        assert full_match(glob, path)


class TestBraceExpansion:
    @given(st.lists(st.lists(segment, min_size=1, max_size=3, unique=True),
                    min_size=1, max_size=3))
    @settings(max_examples=200, deadline=None)
    def test_cross_product(self, lists):
        """N brace lists expand to the cross product, in order."""
        glob = ".".join(
            "{%s}" % ",".join(l) if len(l) > 1 else l[0] for l in lists
        )
        expanded = expand_braces(glob)
        want = 1
        for l in lists:
            want *= len(l)
        assert len(expanded) == want
        # every expansion is brace-free and matches the original glob's regex
        rx = re.compile(glob_to_regexp(glob))
        for e in expanded:
            assert "{" not in e and "}" not in e
            assert rx.fullmatch(e)

    @given(paths)
    @settings(max_examples=100, deadline=None)
    def test_no_braces_is_identity(self, path):
        assert expand_braces(path) == [path]


class TestTimeSpecs:
    @given(st.integers(0, 2**31 - 1), st.integers(1, 86400))
    @settings(max_examples=200, deadline=None)
    def test_rnow_truncates(self, now, trunc):
        got = date_param_to_epoch("rnow", now, trunc)
        assert got % trunc == 0 and 0 <= now - got < trunc

    @given(st.integers(0, 2**31 - 1), st.integers(0, 10**6))
    @settings(max_examples=200, deadline=None)
    def test_now_offset_seconds(self, now, off):
        assert date_param_to_epoch(f"now+{off}s", now) == now + off
        assert date_param_to_epoch(f"now-{off}s", now) == now - off

    @given(st.integers(0, 10**5), st.integers(0, 59))
    @settings(max_examples=200, deadline=None)
    def test_interval_compound(self, mins, secs):
        assert interval_seconds(f"{mins}m{secs}s") == mins * 60 + secs
        assert interval_seconds(f"-{mins}min{secs}s") == -(mins * 60 + secs)

    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=100, deadline=None)
    def test_epoch_passthrough(self, ts):
        # bare epoch ints pass through (8-digit strings are YYYYMMDD dates)
        s = str(ts)
        if len(s) != 8:
            assert date_param_to_epoch(s, 0) == ts


class TestPromQLParserRobustness:
    """The /api/v1/query* surface maps PromQLError to a clean 400; any
    other exception type from the parser would surface as a 500. Fuzz the
    parser: arbitrary input must either parse or raise PromQLError."""

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def test_parser_never_crashes(self, s):
        from graphite_clickhouse_spark.plans.promql import (
            PromQLError,
            parse_promql,
        )

        try:
            parse_promql(s)
        except PromQLError:
            pass

    @given(st.text(alphabet='mk{}()[]"=~!<>+-*/: 0123456789absdh', max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_parser_never_crashes_querylike(self, s):
        from graphite_clickhouse_spark.plans.promql import (
            PromQLError,
            parse_promql,
        )

        try:
            parse_promql(s)
        except PromQLError:
            pass

    @given(st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_duration_parser_never_crashes(self, s):
        from graphite_clickhouse_spark.plans.promql import (
            PromQLError,
            parse_duration,
        )

        try:
            parse_duration(s)
        except PromQLError:
            pass
