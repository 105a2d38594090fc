"""Tagger batch job — rule-driven tagging of the metric namespace
(SURVEY.md §2.1 S13; reference tagger/ package).

The reference's tagger reads every metric path, matches it against TOML
rules (tagger/rule.go:12-34: conditions equal / has-prefix / has-suffix /
contains / regexp, each contributing `tag` / `tags` when matched, unioned
across ALL matching rules via a persistent Set, tagger/tagger.go:75-594)
and uploads the result as the tagged table.

Spark shape: rules are a tiny broadcast-able config, paths are the big
side — so each rule compiles to a Column predicate and the job is ONE
projection over distinct paths:

    tags = array_distinct(flatten([when(pred_i, tags_i) else []])),

pure JVM expressions, no Python in the loop, no shuffle except the
distinct() on the (small) name universe. Rule count is bounded (config
file), so the expression tree stays codegen-friendly.
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class TagRule:
    """One [[rule]] — mirrors tagger/rule.go:12-26 (toml keys in parens)."""

    tags: list[str]  # from `tag` (single) and/or `tags` (list), as "k=v"
    equal: str = ""  # (equal)
    has_prefix: str = ""  # (has-prefix)
    has_suffix: str = ""  # (has-suffix)
    contains: str = ""  # (contains)
    regexp: str = ""  # (regexp)

    def __post_init__(self):
        if self.regexp:
            re.compile(self.regexp)  # validate eagerly like rule.go:92-96

    def predicate(self, path: Column) -> Column:
        conds = []
        if self.equal:
            conds.append(path == self.equal)
        if self.has_prefix:
            conds.append(path.startswith(self.has_prefix))
        if self.has_suffix:
            conds.append(path.endswith(self.has_suffix))
        if self.contains:
            conds.append(path.contains(self.contains))
        if self.regexp:
            conds.append(path.rlike(self.regexp))
        if not conds:
            return F.lit(True)  # unconditional rule tags everything
        pred = conds[0]
        for c in conds[1:]:
            pred = pred & c
        return pred


def parse_rules(toml_text: str) -> list[TagRule]:
    """TOML `[[rule]]` blocks -> TagRule list (tagger/rule.go:65-123)."""
    data = tomllib.loads(toml_text)
    rules = []
    for raw in data.get("rule", []):
        tags = []
        if raw.get("tag"):
            tags.append(raw["tag"])
        tags.extend(raw.get("tags", []))
        rules.append(
            TagRule(
                tags=tags,
                equal=raw.get("equal", ""),
                has_prefix=raw.get("has-prefix", ""),
                has_suffix=raw.get("has-suffix", ""),
                contains=raw.get("contains", ""),
                regexp=raw.get("regexp", ""),
            )
        )
    return rules


def apply_rules(paths: DataFrame, rules: list[TagRule], path_col: str = "path") -> DataFrame:
    """Distinct paths -> (path, tags array<string> sorted "k=v", tags_map).

    Matching-rule tags union (tagger/tagger.go Set semantics) = flatten of
    per-rule conditional arrays + array_distinct + array_sort.
    """
    p = F.col(path_col)
    per_rule = [
        F.when(r.predicate(p), F.array(*[F.lit(t) for t in r.tags])).otherwise(
            F.array().cast("array<string>")
        )
        for r in rules
    ]
    if per_rule:
        tags_arr = F.array_sort(F.array_distinct(F.flatten(F.array(*per_rule))))
    else:
        tags_arr = F.array().cast("array<string>")
    out = (
        paths.select(path_col)
        .distinct()
        .select(
            p.alias("path"),
            tags_arr.alias("tags"),
        )
    )
    # k=v array -> map for the query-side tagged model. Bare tags (a
    # rule's `tag = "prefix"` with no '=': legal, tagger/rule_test.go
    # uses them throughout) map to an empty value — F.get tolerates the
    # missing element where [1] raised ArrayIndexOutOfBounds
    # (golden-test-found). Two rules emitting the same KEY with different
    # values ("a=1" + "a=2": distinct strings, duplicate key) must not
    # throw DUPLICATED_MAP_KEY and kill the batch — dedup keys keeping
    # the lexically-last value (the array is sorted), via the same
    # reversed-fold used by ingest.tags_map_from_path.
    entry = (
        "named_struct('key', split(kv, '=', 2)[0], 'value', "
        "coalesce(get(split(kv, '=', 2), 1), ''))"
    )
    return out.withColumn(
        "tags_map",
        F.expr(f"""
            map_from_entries(aggregate(
                reverse(tags),
                cast(array() as array<struct<key: string, value: string>>),
                (acc, kv) -> if(
                    exists(acc, e -> e.key = split(kv, '=', 2)[0]),
                    acc, array_append(acc, {entry}))
            ))
        """),
    )


def tagged_table(paths: DataFrame, rules: list[TagRule]) -> DataFrame:
    """Only rows that got at least one tag — what the reference uploads."""
    return apply_rules(paths, rules).filter(F.size("tags") > 0)
