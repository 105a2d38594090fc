"""Legacy `_tag` pseudo-tree browse (reference finder/tag.go WrapTag).

Graphite-web's pre-seriesByTag tag navigation: `/metrics/find` queries of
the form `_tag.<tag>`, `_tag.<k>=.<v>`, `_tag.<...>.<series glob>` browse
a tag table the tagger builds (pipeline/tagger.py — the reference's
`tagger/` uploads the same rows to a ClickHouse `graphite_tag` table).
The reference activates this only when `tag-table` is configured and
marks it not-recommended vs the tagged-autocomplete surface; it is
ported for completeness so every reference query keeps working.

Spark model: the tag table is a (path, tags array<string>) frame — the
tagger's output. The reference's duplicated-row encoding (one row per
(Tag1, Path) so `WHERE Tag1=x` is an index hit) is a ClickHouse index
trick; here tag membership is an `exists()` over the tags array and the
tag listing is one explode + distinct, both pushed through the same
hash-aggregate path (map-side combine carries the dedup).

Query grammar (finder/tag.go:149-215 MakeSQL, ported exactly):
    _tag                     -> the browse root node
    _tag.<v>                 -> tag equality (or `_tag.<k>=` = prefix)
    _tag.<k>=.<v>            -> key=value equality ('*' value = any)
    ...repeating `_tag.` groups AND together; a trailing non-`_tag`
    remainder is a plain series glob over paths carrying all the tags.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TAG_INFO_ROOT = "info_root"
TAG_LIST = "list"
TAG_LIST_PARAM = "list_param"
TAG_SERIES_ROOT = "series_root"
TAG_SERIES = "series"


@dataclass
class TagQ:
    """One `_tag.` group (finder/tag.go:28-63): param carries the `k=`
    form (prefix/equality key), value the bare or `.`-separated value."""

    param: str | None = None
    value: str | None = None

    def predicate(self, tag: Column) -> Column | None:
        """TagQ.Where over a single tag string (tag.go:49-63)."""
        if self.param is not None and self.value is not None and self.value != "*":
            return tag == F.lit(self.param + self.value)
        if self.param is not None:
            return tag.startswith(self.param)
        if self.value is not None and self.value != "*":
            return tag == F.lit(self.value)
        return None


@dataclass
class TagBrowse:
    state: str
    tag_qs: list[TagQ] = field(default_factory=list)
    series_query: str = ""
    tag_prefix: str = ""  # consumed `_tag...` head incl. trailing '.'


def is_tag_query(query: str) -> bool:
    return query == "_tag" or query.startswith("_tag.")


def parse_tag_query(query: str) -> TagBrowse:
    """Port of TagFinder.MakeSQL's parse loop (finder/tag.go:149-215)."""
    if query == "_tag":
        return TagBrowse(TAG_INFO_ROOT)
    qs0 = query.split(".")
    qs = qs0
    tag_qs: list[TagQ] = []
    series_query = ""
    while qs:
        if qs[0] == "_tag":
            if len(qs) >= 2:
                v = qs[1]
                if v.endswith("=") and v:
                    if len(qs) >= 3:
                        tag_qs.append(TagQ(param=v, value=qs[2]))
                        qs = qs[3:]
                    else:
                        tag_qs.append(TagQ(param=v))
                        qs = qs[2:]
                else:
                    tag_qs.append(TagQ(value=v))
                    qs = qs[2:]
            else:
                tag_qs.append(TagQ())
                qs = qs[1:]
        else:
            series_query = ".".join(qs)
            break
    tag_prefix = ""
    if len(qs0) > len(qs):
        tag_prefix = ".".join(qs0[: len(qs0) - len(qs)]) + "."
    if series_query == "":
        # finder/tag.go:195-199: ANY last group with Param set lists in
        # param mode — including `_tag.k=.v` with no trailing glob, which
        # lists the value branch ('v.'), not the key branch ('k=.').
        state = (
            TAG_LIST_PARAM
            if tag_qs and tag_qs[-1].param is not None
            else TAG_LIST
        )
        return TagBrowse(state, tag_qs, "", tag_prefix)
    state = TAG_SERIES_ROOT if series_query == "*" else TAG_SERIES
    return TagBrowse(state, tag_qs, series_query, tag_prefix)


def _filter_paths(frame: DataFrame, qs: list[TagQ]) -> DataFrame:
    """Paths carrying every queried tag: each TagQ becomes an exists()
    over the tags array (the reference's Tag1 row-duplication /
    arrayExists conjuncts collapse to the same membership tests)."""
    out = frame
    for q in qs:
        if q.predicate(F.col("x")) is not None:
            out = out.filter(F.exists("tags", q.predicate))
    return out


def _display_tag(tag: Column, param_mode: bool) -> Column:
    """TagFinder.List's display rewrite (tag.go:268-284): in list mode a
    `k=v` tag shows as the `k=` branch node; in param mode (the last
    group was `k=`) it shows the value branch; bare tags show whole.
    Every list row is a tree node (the reference appends '.')."""
    eq = F.instr(tag, "=")  # 1-based position of the FIRST '='
    # Go: eqIndex > 0 (not the first byte) and < len-1 (not the last)
    k_v = (eq > 1) & (eq < F.length(tag))
    if param_mode:
        # everything after the first '=' (values may contain '=')
        return F.when(k_v, F.regexp_replace(tag, "^[^=]*=", "")).otherwise(tag)
    return F.when(
        k_v, F.concat(F.substring_index(tag, "=", 1), F.lit("="))
    ).otherwise(tag)


def tag_series_paths(frame: DataFrame, tb: TagBrowse,
                     wildcard_min_distance: int = 0) -> DataFrame:
    """Real metric paths for a `_tag...<series glob>` query (seriesSQL,
    tag.go:123-147): every tag group must be present AND the path must
    match the series glob. Returns a (path) frame; display names get the
    consumed `_tag...` prefix back via `tb.tag_prefix` (TagFinder.Abs)."""
    from .glob import glob_predicate, validate_glob

    out = _filter_paths(frame, tb.tag_qs).select("path").distinct()
    if tb.series_query and tb.series_query != "*":
        g = validate_glob(tb.series_query, wildcard_min_distance)
        pred = glob_predicate(F.col("path"), g)
        if pred is not None:
            out = out.filter(pred)
    return out


def tag_list_frame(frame: DataFrame, tb: TagBrowse) -> DataFrame:
    """The tag-listing plan for a TAG_LIST / TAG_LIST_PARAM browse as a
    (name string) DataFrame (tagListSQL, tag.go:92-121): all-but-last
    groups filter PATHS (arrayExists conjuncts), the last group filters
    the exploded tag itself, and the display rewrite + distinct runs
    JVM-side — one explode + hash-aggregate, map-side combined, so the
    listing scales with distinct tags, not rows."""
    qs = tb.tag_qs
    if len(qs) == 1:
        tags = frame.select(F.explode("tags").alias("tag"))
        pred = qs[0].predicate(F.col("tag"))
        if pred is not None:
            tags = tags.filter(pred)
    else:
        base = _filter_paths(frame, qs[:-1])
        tags = base.select(F.explode("tags").alias("tag"))
        pred = qs[-1].predicate(F.col("tag"))
        if pred is not None:
            tags = tags.filter(pred)
    return tags.select(
        _display_tag(F.col("tag"), tb.state == TAG_LIST_PARAM).alias("name")
    ).distinct()


def tag_browse_rows(frame: DataFrame, tb: TagBrowse,
                    wildcard_min_distance: int = 0) -> list[tuple[str, bool]]:
    """Find-tree rows (name with the trailing-dot encoding already
    resolved to an explicit leaf flag) for a parsed `_tag` query —
    exactly TagFinder.List's output (tag.go:245-295). The find response
    carries these rows RAW, like the reference (Abs re-prefixing happens
    only at the render alias boundary, pkg/alias/map.go:54)."""
    if tb.state == TAG_INFO_ROOT:
        return [("_tag", False)]
    if tb.state in (TAG_LIST, TAG_LIST_PARAM):
        shown = tag_list_frame(frame, tb)
        return sorted((r.name, False) for r in shown.collect())
    # series modes: rows are the real paths; the root adds the nested
    # '_tag.' browse node
    paths = tag_series_paths(frame, tb, wildcard_min_distance)
    rows = sorted((r.path, True) for r in paths.collect())
    if tb.state == TAG_SERIES_ROOT:
        rows.append(("_tag", False))
    return rows
