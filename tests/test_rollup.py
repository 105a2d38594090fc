"""Rollup rules — semantics cases modeled on helper/rollup/rules_test.go:
function and retention resolve independently, first match wins each."""

from graphite_clickhouse_spark.operators.rollup import (
    Pattern,
    Retention,
    Rules,
)

XML = """
<graphite_rollup>
  <pattern>
    <regexp>\\.sum$</regexp>
    <function>sum</function>
  </pattern>
  <pattern>
    <regexp>^hourly\\.</regexp>
    <retention><age>0</age><precision>3600</precision></retention>
  </pattern>
  <pattern>
    <regexp>\\.min$</regexp>
    <function>min</function>
    <retention>
      <age>0</age><precision>10</precision>
      </retention>
    <retention><age>86400</age><precision>300</precision></retention>
  </pattern>
  <default>
    <function>avg</function>
    <retention><age>0</age><precision>60</precision></retention>
  </default>
</graphite_rollup>
"""


def test_xml_parse_and_lookup():
    rules = Rules.from_xml(XML)
    # .sum matches function-only pattern; retention falls to default
    assert rules.lookup("a.b.sum", 0) == (60, "sum")
    # .min matches both function and retention
    assert rules.lookup("a.b.min", 0) == (10, "min")
    assert rules.lookup("a.b.min", 90000) == (300, "min")
    # hourly. gets retention from pattern 2, function from default
    assert rules.lookup("hourly.x", 0) == (3600, "avg")
    # function from one pattern, retention from another
    assert rules.lookup("hourly.x.sum", 0) == (3600, "sum")
    # nothing matches -> defaults
    assert rules.lookup("other.metric", 0) == (60, "avg")


def test_retention_age_selection():
    p = Pattern(
        regexp="",
        function="avg",
        retention=[Retention(0, 10), Retention(3600, 60), Retention(86400, 300)],
    )
    rules = Rules([p])
    assert rules.lookup("m", 0) == (10, "avg")
    assert rules.lookup("m", 3599) == (10, "avg")
    assert rules.lookup("m", 3600) == (60, "avg")
    assert rules.lookup("m", 86400) == (300, "avg")
    assert rules.lookup("m", 10**9) == (300, "avg")


def test_age_below_first_retention_falls_through():
    # pattern whose first retention age > request age contributes nothing
    p1 = Pattern(regexp="^m", retention=[Retention(3600, 600)])
    p2 = Pattern(regexp="", function="avg", retention=[Retention(0, 30)])
    rules = Rules([p1, p2])
    assert rules.lookup("m", 60) == (30, "avg")  # p1 skipped (60 < 3600)
    assert rules.lookup("m", 7200) == (600, "avg")


def test_tagged_plain_separation():
    p_tagged = Pattern(regexp="^cpu", function="max", rule_type="tagged")
    p_plain = Pattern(regexp="^cpu", function="min", rule_type="plain")
    default = Pattern(regexp="", function="avg", retention=[Retention(0, 60)])
    rules = Rules([p_tagged, p_plain, default])
    assert rules.lookup("cpu.load", 0)[1] == "min"
    assert rules.lookup("cpu?host=a", 0)[1] == "max"


def test_lookup_many_groups():
    rules = Rules.from_xml(XML)
    groups = rules.lookup_many(["a.min", "b.min", "c.sum", "d"], age=0)
    assert groups[(10, "min")] == ["a.min", "b.min"]
    assert groups[(60, "sum")] == ["c.sum"]
    assert groups[(60, "avg")] == ["d"]
    # consolidateBy override rewrites the function
    groups = rules.lookup_many(["a.min"], 0, {"a.min": "anyLast"})
    assert groups == {(10, "anyLast"): ["a.min"]}


class TestDefaultFirstOrdering:
    def test_default_element_applies_last_regardless_of_position(self):
        # ClickHouse rollup XML commonly puts <default> FIRST; it must
        # still be the fallback (helper/rollup/xml.go:99-106)
        xml = """
<yandex><graphite_rollup>
  <default>
    <function>avg</function>
    <retention><age>0</age><precision>10</precision></retention>
  </default>
  <pattern><regexp>\\.sum$</regexp><function>sum</function></pattern>
</graphite_rollup></yandex>
"""
        r = Rules.from_xml(xml)
        assert r.lookup("a.b.sum", 0) == (10, "sum")
        assert r.lookup("a.b.other", 0) == (10, "avg")


def test_lookup_verbose_reports_source_patterns():
    # the verbose Lookup (rules.go:285) returns WHICH pattern supplied
    # the function and which the precision — the `match` CLI's payload
    rules = Rules.from_xml(XML)
    prec, fn, ap_, rp = rules.lookup_verbose("a.b.sum", 0)
    assert (prec, fn) == (60, "sum")
    assert ap_ is not None and ap_.regexp == "\\.sum$"
    assert rp is not None and rp.regexp == ""  # the <default> block
    prec, fn, ap_, rp = rules.lookup_verbose("a.b.min", 90000)
    assert (prec, fn) == (300, "min")
    assert ap_ is rp and ap_.regexp == "\\.min$"
    # hourly.: function from default, retention from pattern 2
    prec, fn, ap_, rp = rules.lookup_verbose("hourly.x", 0)
    assert (prec, fn) == (3600, "avg")
    assert rp.regexp == "^hourly\\."
    assert ap_.regexp == ""


def test_cli_match_and_version(tmp_path, capsys):
    from graphite_clickhouse_spark.__main__ import main

    xml = tmp_path / "rollup.xml"
    xml.write_text(XML)
    main(["--match", "a.b.min", "hourly.x", "--age", "90000",
          "--rollup", str(xml)])
    out = capsys.readouterr().out
    assert f'rollup file "{xml}"' in out
    assert '  metric "a.b.min", age 90000 -> precision=300, aggr=min' in out
    assert 'aggr pattern: type=all, regexp="\\.min$", function=min, retentions:' in out
    assert "    [age: 86400, precision: 300]" in out
    assert '  metric "hourly.x", age 90000 -> precision=3600, aggr=avg' in out
    assert 'retention pattern: type=all, regexp="^hourly\\.", function=' in out

    main(["--version"])
    out = capsys.readouterr().out
    assert out.startswith("graphite_clickhouse_spark ")


def test_parse_compact_reference_golden():
    """helper/rollup/compact_test.go::TestParseCompact verbatim."""
    rules = Rules.from_compact(
        "\n\tclick_cost;any;0:3600,86400:60"
        "\n\t;max;0:60,3600:300,86400:3600"
    )
    assert len(rules.patterns) == 2
    p0, p1 = rules.patterns
    assert (p0.regexp, p0.function) == ("click_cost", "any")
    assert [(r.age, r.precision) for r in p0.retention] == [
        (0, 3600), (86400, 60)
    ]
    assert (p1.regexp, p1.function) == ("", "max")
    assert [(r.age, r.precision) for r in p1.retention] == [
        (0, 60), (3600, 300), (86400, 3600)
    ]
    # lookup flows through the same machinery as XML-parsed rules
    assert rules.lookup("click_cost.total", 0) == (3600, "any")
    assert rules.lookup("other.metric", 4000) == (300, "max")


def test_compact_rejects_malformed():
    import pytest as _pytest

    for bad in ("no-semicolons", "a;b;0:1:2", "a;b;xx:1"):
        with _pytest.raises(ValueError):
            Rules.from_compact(bad)


def test_compact_rejects_signed_and_overflow():
    """parseCompact uses ParseUint(..., 10, 32): '-'/'+' prefixes and
    values >= 2^32 are parse errors (a negative age would also break
    retention-interval ordering in lookup)."""
    import pytest as _pytest

    for bad in (
        "a;avg;-1:60",
        "a;avg;0:-60",
        "a;avg;+1:60",
        "a;avg;0:+60",
        "a;avg;4294967296:60",
        "a;avg;0:4294967296",
        "a;avg; 1 :60x",
        "a;avg;٢:60",  # non-ASCII digit int() would accept
    ):
        with _pytest.raises(ValueError):
            Rules.from_compact(bad)
    # boundary value still parses
    r = Rules.from_compact("a;avg;4294967295:60")
    assert r.patterns[0].retention[0].age == 4294967295


def test_config_rollup_conf_autodetects_compact(tmp_path):
    from graphite_clickhouse_spark.config import load_settings

    conf_file = tmp_path / "rollup.conf"
    conf_file.write_text(";avg;0:60,86400:300\n")
    s = load_settings(f'[clickhouse]\nrollup-conf = "{conf_file}"\n')
    assert s.rules.lookup("any.metric", 90000) == (300, "avg")


REF_XML_TYPED = """
<graphite_rollup>
 	<pattern>
		<rule_type>all</rule_type>
 		<regexp>click_cost</regexp>
 		<function>any</function>
 		<retention>
 			<age>0</age>
 			<precision>3600</precision>
 		</retention>
 		<retention>
 			<age>86400</age>
 			<precision>60</precision>
 		</retention>
	</pattern>
 	<pattern>
 		<regexp>without_function</regexp>
 		<retention>
 			<age>0</age>
 			<precision>3600</precision>
 		</retention>
 		<retention>
 			<age>86400</age>
 			<precision>60</precision>
 		</retention>
	</pattern>
 	<pattern>
	 	<rule_type>plain</rule_type>
 		<regexp>without_retention</regexp>
 		<function>min</function>
 	</pattern>
	<pattern>
		<rule_type>tagged</rule_type>
		<regexp>^((.*)|.)sum\\?</regexp>
		<function>sum</function>
 	</pattern>
	<pattern>
		<rule_type>tag_list</rule_type>
		<regexp>fake3;tag=Fake3</regexp>
		<function>min</function>
 	</pattern>
	<pattern>
		<rule_type>tagged</rule_type>
		<regexp><![CDATA[^fake4\\\\?(.*&)?tag4=Fake4(&.*)?$]]></regexp>
		<function>min</function>
  	</pattern>
 	<default>
 		<function>max</function>
 		<retention>
 			<age>0</age>
 			<precision>60</precision>
 		</retention>
 		<retention>
 			<age>3600</age>
 			<precision>300</precision>
 		</retention>
 		<retention>
 			<age>86400</age>
 			<precision>3600</precision>
 		</retention>
 	</default>
</graphite_rollup>
"""


class TestReferenceXMLGoldens:
    """helper/rollup/xml_test.go ported behaviorally: XML == compact for
    the same rules, <yandex> wrapper, retention age-sorting, typed rules
    incl. tag_list -> tagged regexp expansion (buildTaggedRegex)."""

    REF_XML = """
<graphite_rollup>
 	<pattern>
 		<regexp>click_cost</regexp>
 		<function>any</function>
 		<retention><age>0</age><precision>3600</precision></retention>
 		<retention><age>86400</age><precision>60</precision></retention>
	</pattern>
 	<pattern>
 		<regexp>without_function</regexp>
 		<retention><age>0</age><precision>3600</precision></retention>
 		<retention><age>86400</age><precision>60</precision></retention>
	</pattern>
 	<pattern>
 		<regexp>without_retention</regexp>
 		<function>min</function>
 	</pattern>
 	<default>
 		<function>max</function>
 		<retention><age>0</age><precision>60</precision></retention>
 		<retention><age>3600</age><precision>300</precision></retention>
 		<retention><age>86400</age><precision>3600</precision></retention>
 	</default>
</graphite_rollup>
"""

    COMPACT = (
        "\n\tclick_cost;any;0:3600,86400:60"
        "\n\twithout_function;;0:3600,86400:60"
        "\n\twithout_retention;min;"
        "\n\t;max;0:60,3600:300,86400:3600"
        "\n\t"
    )

    @staticmethod
    def _shape(rules):
        return [
            (p.regexp, p.function, p.rule_type,
             [(r.age, r.precision) for r in p.retention])
            for p in rules.patterns
        ]

    def test_xml_equals_compact(self):
        assert self._shape(Rules.from_xml(self.REF_XML)) == self._shape(
            Rules.from_compact(self.COMPACT)
        )

    def test_yandex_wrapper(self):
        wrapped = "<yandex>" + self.REF_XML + "</yandex>"
        assert self._shape(Rules.from_xml(wrapped)) == self._shape(
            Rules.from_xml(self.REF_XML)
        )

    def test_retention_sorted_by_age(self):
        # the document lists 0 then 86400, but parse must sort ascending
        shuffled = self.REF_XML.replace(
            "<retention><age>0</age><precision>3600</precision></retention>\n"
            " 		<retention><age>86400</age><precision>60</precision></retention>",
            "<retention><age>86400</age><precision>60</precision></retention>\n"
            " 		<retention><age>0</age><precision>3600</precision></retention>",
        )
        r = Rules.from_xml(shuffled)
        assert (r.patterns[0].retention[0].age,
                r.patterns[0].retention[0].precision) == (0, 3600)

    def test_typed_rules_and_tag_list_expansion(self):
        r = Rules.from_xml(REF_XML_TYPED)
        shapes = self._shape(r)
        # tag_list 'fake3;tag=Fake3' compiles to the exact tagged regexp
        # the reference's buildTaggedRegex produces
        assert shapes[4] == (
            r"^fake3\?(.*&)?tag=Fake3(&.*)?$", "min", "tagged", []
        )
        # CDATA regexp passes through verbatim
        assert shapes[5][0] == r"^fake4\\?(.*&)?tag4=Fake4(&.*)?$"
        assert [s[2] for s in shapes] == [
            "all", "all", "plain", "tagged", "tagged", "tagged", "all"
        ]
        # separated lookup: plain metrics only see plain/all rules,
        # tagged metrics only tagged/all (xml_test.go PatternPlain/Tagged)
        assert r.lookup("without_retention.x", 0)[1] == "min"
        assert r.lookup("fake3?tag=Fake3", 0)[1] == "min"
        assert r.lookup("fake3?a=b&tag=Fake3", 0)[1] == "min"
        # name part must be immediately followed by '?' or an '&'-bounded
        # tag: an interloping char before the tag key must NOT match
        assert r.lookup("fake3?xtag=Fake3", 0)[1] == "max"  # default
        assert r.lookup("metric.sum?a=b", 0)[1] == "sum"

    def test_tag_list_variants(self):
        from graphite_clickhouse_spark.operators.rollup import (
            _tag_list_to_regexp,
        )

        # doc table from rules.go:86-115
        assert _tag_list_to_regexp("name") == r"^name\?"
        assert _tag_list_to_regexp("tag2=val2") == r"[\?&]tag2=val2(&.*)?$"
        assert _tag_list_to_regexp("nam.*;tag1=val1;tag2=val2") == (
            r"^nam.*\?(.*&)?tag1=val1&(.*&)?tag2=val2(&.*)?$"
        )
        # remaining tags sort lexically; name stays first
        assert _tag_list_to_regexp("n;b=2;a=1") == (
            r"^n\?(.*&)?a=1&(.*&)?b=2(&.*)?$"
        )


class TestReferenceJSONGoldens:
    """helper/rollup/remote_test.go ported behaviorally: the ClickHouse
    system.graphite_retentions JSON dump parses to the same rules as the
    equivalent compact text (TestParseJson), including consecutive-row
    retention merging, precision-0 function-only rows, is_default
    folding, and typed/tag_list rows (TestParseJsonTyped)."""

    JSON = """{
    "data": [
        {"regexp": "^hourly", "function": "", "age": "0",
         "precision": "3600", "is_default": 0},
        {"regexp": "^hourly", "function": "", "age": "3600",
         "precision": "13600", "is_default": 0},
        {"regexp": "^live", "function": "", "age": "0",
         "precision": "1", "is_default": 0},
        {"regexp": "total$", "function": "sum", "age": "0",
         "precision": "0", "is_default": 0},
        {"regexp": "min$", "function": "min", "age": "0",
         "precision": "0", "is_default": 0},
        {"regexp": "max$", "function": "max", "age": "0",
         "precision": "0", "is_default": 0},
        {"regexp": "", "function": "max", "age": "0",
         "precision": "60", "is_default": 1}
    ],
    "rows": 7
    }"""

    COMPACT = (
        "\n\t^hourly;;0:3600,3600:13600"
        "\n\t^live;;0:1"
        "\n\ttotal$;sum;"
        "\n\tmin$;min;"
        "\n\tmax$;max;"
        "\n\t;max;0:60"
        "\n\t"
    )

    @staticmethod
    def _shape(rules):
        return [
            (p.regexp, p.function, p.rule_type,
             [(r.age, r.precision) for r in p.retention])
            for p in rules.patterns
        ]

    def test_json_equals_compact(self):
        assert self._shape(Rules.from_json(self.JSON)) == self._shape(
            Rules.from_compact(self.COMPACT)
        )

    def test_typed_rows(self):
        typed = """{
        "data": [
            {"rule_type": "all", "regexp": "^hourly", "function": "",
             "age": "0", "precision": "3600", "is_default": 0},
            {"rule_type": "all", "regexp": "^hourly", "function": "",
             "age": "3600", "precision": "13600", "is_default": 0},
            {"rule_type": "plain", "regexp": "total$", "function": "sum",
             "age": "0", "precision": "0", "is_default": 0},
            {"rule_type": "tagged", "regexp": "^tag_name\\\\?",
             "function": "min", "age": "0", "precision": "0",
             "is_default": 0},
            {"rule_type": "tag_list", "regexp": "fake3;tag=Fake3",
             "function": "sum", "age": "0", "precision": "0",
             "is_default": 0},
            {"rule_type": "all", "regexp": "", "function": "max",
             "age": "0", "precision": "60", "is_default": 1}
        ]
        }"""
        shapes = self._shape(Rules.from_json(typed))
        assert shapes == [
            ("^hourly", None, "all", [(0, 3600), (3600, 13600)]),
            ("total$", "sum", "plain", []),
            (r"^tag_name\?", "min", "tagged", []),
            (r"^fake3\?(.*&)?tag=Fake3(&.*)?$", "sum", "tagged", []),
            ("", "max", "all", [(0, 60)]),
        ]

    def test_unmarshal_strictness_matches_go(self):
        """parseJson parity (remote.go:17-52 + rules.go:38-61): integer
        age/precision, string is_default, unknown rule_type, and
        out-of-int32 retentions are all unmarshal/parse errors in Go —
        never silently accepted."""
        import json as _json

        import pytest as _pytest

        def row(**kw):
            base = {"regexp": "^x", "function": "avg", "age": "0",
                    "precision": "60", "is_default": 0}
            base.update(kw)
            return _json.dumps({"data": [base]})

        # JSON integer into a Go string field is an unmarshal error
        with _pytest.raises(ValueError):
            Rules.from_json(row(age=3600))
        with _pytest.raises(ValueError):
            Rules.from_json(row(precision=60))
        # string "1" into the int IsDefault field is an unmarshal error
        # (NOT a silently-normal pattern row)
        with _pytest.raises(ValueError):
            Rules.from_json(row(is_default="1"))
        with _pytest.raises(ValueError):
            Rules.from_json(row(is_default=True))
        # RuleType.Set rejects unknown names; known names are
        # case-insensitive
        with _pytest.raises(ValueError):
            Rules.from_json(row(rule_type="bogus"))
        assert Rules.from_json(row(rule_type="PLAIN")).patterns[0] \
            .rule_type == "plain"
        # ParseInt(..., 10, 32) bounds: 2^31 is a range error; 2^31-1 ok
        with _pytest.raises(ValueError):
            Rules.from_json(row(age=str(2 ** 31)))
        ok = Rules.from_json(row(age=str(2 ** 31 - 1)))
        assert ok.patterns[0].retention[0].age == 2 ** 31 - 1
        # Go json.Unmarshal decides by the literal's SPELLING: any number
        # written with a fraction point — 1.0 included — fails to
        # unmarshal into the int IsDefault field ("cannot unmarshal
        # number 1.0"), so integral floats are errors here too
        with _pytest.raises(ValueError):
            Rules.from_json(row(is_default=1.0))
        with _pytest.raises(ValueError):
            Rules.from_json(row(is_default=0.5))

    def test_config_autodetects_json(self, tmp_path):
        from graphite_clickhouse_spark.config import load_settings

        conf_file = tmp_path / "rollup.json"
        conf_file.write_text(self.JSON)
        s = load_settings(f'[clickhouse]\nrollup-conf = "{conf_file}"\n')
        assert s.rules.lookup("metric.total", 100) == (60, "sum")
        assert s.rules.lookup("hourly.x", 4000) == (13600, "max")


class TestRollupParserFuzz:
    """Every rollup parser maps malformed input to ValueError only —
    no re.error / TypeError / KeyError / IndexError escapes (the
    decoder-boundary rule that has caught wire-parser leaks each round)."""

    def test_bad_regexp_is_valueerror_everywhere(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            Rules.from_compact("[bad;avg;0:60")
        with _pytest.raises(ValueError):
            Rules.from_xml(
                "<graphite_rollup><pattern><regexp>[bad</regexp>"
                "<function>avg</function></pattern></graphite_rollup>"
            )
        with _pytest.raises(ValueError):
            Rules.from_json(
                '{"data": [{"regexp": "[bad", "function": "avg",'
                ' "age": "0", "precision": "60", "is_default": 0}]}'
            )

    def test_from_json_fuzz_error_discipline(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        scalars = st.one_of(
            st.none(), st.booleans(), st.integers(), st.text(max_size=8)
        )
        row = st.dictionaries(
            st.sampled_from(
                ["regexp", "function", "age", "precision", "is_default",
                 "rule_type", "junk"]
            ),
            scalars, max_size=7,
        )
        doc = st.fixed_dictionaries({}, optional={
            "data": st.lists(row, max_size=5),
            "rows": st.integers(),
            "meta": scalars,
        })

        @given(doc)
        @settings(max_examples=300, deadline=None)
        def run(d):
            import json as _json

            try:
                Rules.from_json(_json.dumps(d))
            except ValueError:
                pass  # the one allowed failure mode

        run()

    def test_from_compact_fuzz_error_discipline(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(st.text(max_size=60))
        @settings(max_examples=300, deadline=None)
        def run(text):
            try:
                Rules.from_compact(text)
            except ValueError:
                pass

        run()
