"""Glob compiler unit tests — cases mirror the reference's table-driven
tests in pkg/where/where_test.go and match_test.go (semantics, not code)."""

import re

import pytest

from graphite_clickhouse_spark.plans.glob import (
    GlobError,
    clear_glob,
    expand_braces,
    glob_to_regexp,
    has_unmatched_brackets,
    has_wildcard,
    max_wildcard_distance,
    non_wildcard_prefix,
    validate_glob,
)


def test_has_wildcard():
    assert not has_wildcard("a.b.c")
    for q in ["a.*.c", "a.b?", "a.{b,c}", "a.[bc]"]:
        assert has_wildcard(q)


@pytest.mark.parametrize(
    "glob,matches,not_matches",
    [
        ("a.*.c", ["a.x.c", "a..c"], ["a.x.y.c", "b.x.c"]),
        ("a.b?", ["a.bx"], ["a.b", "a.bxy", "a.b."]),
        ("a.{b,c}.d", ["a.b.d", "a.c.d"], ["a.bc.d", "a.e.d"]),
        ("a.[bc]x", ["a.bx", "a.cx"], ["a.dx"]),
        ("svc.cpu*", ["svc.cpu", "svc.cpu0", "svc.cpu_total"], ["svc2.cpu", "svc.cpu.total"]),
        ("a$b.c", ["a$b.c"], ["aXb.c"]),
    ],
)
def test_glob_to_regexp(glob, matches, not_matches):
    rx = re.compile("^" + glob_to_regexp(glob) + "$")
    for m in matches:
        assert rx.match(m), (glob, m)
    for m in not_matches:
        assert not rx.match(m), (glob, m)


def test_expand_braces():
    assert expand_braces("S{a,b}E") == ["SaE", "SbE"]
    assert expand_braces("{a,b}.x.{c,d}") == ["a.x.c", "a.x.d", "b.x.c", "b.x.d"]
    assert expand_braces("plain") == ["plain"]
    with pytest.raises(GlobError):
        expand_braces("a{b{c,d}}")


def test_clear_glob():
    assert clear_glob("a.{b}.c") == "a.b.c"
    assert clear_glob("a.[b].c") == "a.b.c"
    assert clear_glob("a.{b,c}.d") == "a.{b,c}.d"  # real globs untouched
    assert clear_glob("a.[bc].d") == "a.[bc].d"


def test_unmatched_brackets():
    assert has_unmatched_brackets("a.{b.c")
    assert has_unmatched_brackets("a.b]")
    assert not has_unmatched_brackets("a.{b,c}.[de]")


def test_wildcard_distance_guard():
    # wildcard 2 nodes from both ends -> distance 2
    assert max_wildcard_distance("a.b.*.d.e") == 2
    assert max_wildcard_distance("*.b.c") == 2
    assert max_wildcard_distance("a.b.c") == -1
    with pytest.raises(GlobError):
        validate_glob("a.*.b", wildcard_min_distance=2)
    validate_glob("a.*.b.c.d", wildcard_min_distance=2)  # ok: distance 4 from end


def test_non_wildcard_prefix():
    assert non_wildcard_prefix("svc.host.*") == "svc.host."
    assert non_wildcard_prefix("plain.name") == "plain.name"


def test_wildcard_distance_single_node_exempt():
    # single-node queries pass the guard so root browsing works
    # (finder/index.go:185-193 moreThanOneNode)
    assert validate_glob("*", wildcard_min_distance=4) == "*"
    with pytest.raises(GlobError):
        validate_glob("*.a", wildcard_min_distance=4)


def test_reverse_path():
    from graphite_clickhouse_spark.plans.glob import reverse_path

    assert reverse_path("a.b.c") == "c.b.a"
    assert reverse_path("one") == "one"
    assert reverse_path("ev?type=click&user=u1") == "ev?type=click&user=u1"
    assert reverse_path("*.b.c") == "c.b.*"


@pytest.mark.parametrize(
    "query,expected",
    [
        # finder/index_test.go:17-27 Test_useReverse
        ("a.b.c.d.e", False),
        ("a.b*", False),
        ("a.b.c.d.e*", False),
        ("a.b.c.d*.e", False),
        ("a.b*.c*.d.e", True),
        ("a.b*.c.d.e", True),
    ],
)
def test_use_reverse_auto(query, expected):
    from graphite_clickhouse_spark.plans.glob import use_reverse

    assert use_reverse(query) is expected


@pytest.mark.parametrize(
    "query,mode,expected",
    [
        # finder/index_test.go:35-61 Test_useReverseWithSetConfig
        ("a.b.c.d.e", "reversed", True),
        ("a.b.c.d.e", "auto", False),
        ("a.b.c.d.e", "direct", False),
        ("a.b.c.d.e*", "direct", False),
        ("a.b.c.d*.e", "direct", False),
        ("a.b.c.d*.e", "reversed", True),
        ("a*.b.c.d*.e", "reversed", True),
        ("a.b*.c.d*.e", "reversed", True),
        ("a.*.c.*.e.*.j", "reversed", True),
        ("a.*.c.*.e.*.j", "direct", False),
        ("a.b*.c.*d.e", "reversed", True),
    ],
)
def test_use_reverse_forced(query, mode, expected):
    from graphite_clickhouse_spark.plans.glob import use_reverse

    assert use_reverse(query, mode) is expected


@pytest.mark.parametrize(
    "query,expected",
    [
        # finder/index_test.go:63-95 Test_checkReverses
        ("a.b.c.d*.sum", False),
        ("a*.b.c.d.sum", False),
        ("test.b.c*.d*.alloc", False),
        ("test.b.c*.d.alloc", False),
        ("test2.b.c*.d*.e", True),
        ("test2.b.c*.d.e", True),
        ("a.b.c.d*.max", True),  # regex rule
        ("a.b.c*.d.max", True),  # regex rule
    ],
)
def test_use_reverse_rules(query, expected):
    from graphite_clickhouse_spark.plans.glob import ReverseRule, use_reverse

    rules = (
        ReverseRule("direct", suffix=".sum"),
        ReverseRule("direct", prefix="test.", suffix=".alloc"),
        ReverseRule("reversed", prefix="test2."),
        ReverseRule("reversed", regex=r"^a\..*\.max$"),
    )
    assert use_reverse(query, "auto", rules) is expected


@pytest.mark.parametrize(
    "query,max_node,expected",
    [
        # finder/split_test.go:16-200 Test_splitQuery
        ("some.*.{a,b,c}.{first,second}.*.test.metric", 3,
         ["some.*.{a,b,c}.{first,second}.*.test.metric"]),
        ("some.long.{a,b,c}.{first,second}.*.metric", 1,
         ["some.long.{a,b,c}.{first,second}.*.metric"]),
        ("some.long.{a,b,c}.{first,second}.*.metric", 2,
         ["some.long.a.{first,second}.*.metric",
          "some.long.b.{first,second}.*.metric",
          "some.long.c.{first,second}.*.metric"]),
        ("some.*.{a,b,c}.{first,second}.test.metric", 1,
         ["some.*.{a,b,c}.{first,second}.test.metric"]),
        ("some.*.{a,b,c}.{first,second}.test.metric", 2,
         ["some.*.{a,b,c}.first.test.metric",
          "some.*.{a,b,c}.second.test.metric"]),
        ("some.long.{a,b,c}.{first,second}.test.metric", 1,
         ["some.long.{a,b,c}.{first,second}.test.metric"]),
        ("{first,second}.some.metric.*", 3,
         ["first.some.metric.*", "second.some.metric.*"]),
        ("*.some.metric.{first,second}", 3,
         ["*.some.metric.first", "*.some.metric.second"]),
        ("some.very.long.{a,b}.*.{first,second}.metric", 2,
         ["some.very.long.{a,b}.*.{first,second}.metric"]),
        ("some.very.long.{a,b}.*.{first,second}.metric", 3,
         ["some.very.long.a.*.{first,second}.metric",
          "some.very.long.b.*.{first,second}.metric"]),
        ("some.{a,b}.*.{first,second}.long.test.metric", 2,
         ["some.{a,b}.*.{first,second}.long.test.metric"]),
        ("some.{a,b}.*.{first,second}.long.test.metric", 3,
         ["some.{a,b}.*.first.long.test.metric",
          "some.{a,b}.*.second.long.test.metric"]),
        ("some.very.long.{a,b,c}.*.{first,second}.long.test.metric", 3,
         ["some.very.long.a.*.{first,second}.long.test.metric",
          "some.very.long.b.*.{first,second}.long.test.metric",
          "some.very.long.c.*.{first,second}.long.test.metric"]),
        ("some.very.long.{a,b}.*.{first,second,third}.long.test.metric", 3,
         ["some.very.long.{a,b}.*.first.long.test.metric",
          "some.very.long.{a,b}.*.second.long.test.metric",
          "some.very.long.{a,b}.*.third.long.test.metric"]),
        ("query.{a,b}", -1, ["query.{a,b}"]),
        ("*.query.{a,b}", -1, ["*.query.{a,b}"]),
        ("*.query.{a,b}", 20, ["*.query.a", "*.query.b"]),
    ],
)
def test_split_query(query, max_node, expected):
    from graphite_clickhouse_spark.plans.glob import split_query

    assert split_query(query, max_node) == expected


def test_reverse_string_reference_table():
    """finder/reverse_test.go::TestReverse verbatim."""
    from graphite_clickhouse_spark.plans.glob import reverse_path

    for a, b in [("hello.world", "world.hello"), ("hello.", ".hello"),
                 ("hello", "hello"), (".", "."), ("a1.b2.c3", "c3.b2.a1")]:
        assert reverse_path(a) == b
