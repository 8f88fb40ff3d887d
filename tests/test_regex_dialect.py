"""JS-regex dialect routing (reference src/v4/pattern.js:18 compiles
``pattern`` with JavaScript ``new RegExp``): translatable JS spellings must
yield the reference's verdicts on every engine mode; dialect-divergent
constructs must fail loudly at schema-compile time, never silently diverge."""

import re

import pytest

from schema_fantasy_spark.columnar import compile_columnar
from schema_fantasy_spark.compiler.plan import SchemaCompileError, compile_schema
from schema_fantasy_spark.compiler.regex_dialect import (
    RegexDialectError,
    java_pattern,
    python_pattern,
)


class TestTranslation:
    def test_common_core_passes_through(self):
        for p in [r"^[a-z]+$", r"\d{3}-\d{4}", r"a|b", r"\u0041x", r"(?i)case",
                  r"[\]\[]", r"\\u\{literal"]:
            assert java_pattern(p) == p

    def test_codepoint_escape_braces_raise(self):
        # \u{...} is a code-point escape ONLY under the u flag; the
        # reference's flagless new RegExp reads it as 'u' + quantifier
        # (Annex B) — ambiguous across readings, so it must fail loudly
        with pytest.raises(RegexDialectError):
            java_pattern(r"\u{1F600}")
        with pytest.raises(RegexDialectError):
            python_pattern(r"\u{2}")
        # the unambiguous 4-hex spelling passes through
        assert java_pattern(r"\u0041") == r"\u0041"
        assert python_pattern(r"\u0041").search("A")

    def test_control_escape(self):
        assert java_pattern(r"a\cJb") == "a\\x0Ab"
        assert python_pattern(r"a\cJb").search("a\nb")

    def test_named_group(self):
        assert python_pattern(r"(?<y>\d{4})-\k<y>").search("1999-1999")
        assert java_pattern(r"(?<y>\d{4})") == r"(?<y>\d{4})"

    def test_lookbehind_not_mangled(self):
        assert java_pattern(r"(?<=a)b") == r"(?<=a)b"
        assert python_pattern(r"(?<=a)b").search("ab")

    def test_bare_nul(self):
        assert java_pattern("\\0x") == "\\x00x"
        assert java_pattern("\\07") == "\\07"  # real octal untouched

    def test_char_class_state(self):
        # '(' inside a class is literal, not a group opener
        assert java_pattern(r"[(?<a]") == r"[(?<a]"

    def test_property_escape_raises(self):
        with pytest.raises(RegexDialectError):
            java_pattern(r"\p{Letter}+")
        with pytest.raises(RegexDialectError):
            python_pattern(r"\P{L}")

    def test_malformed_u_raises(self):
        with pytest.raises(RegexDialectError):
            java_pattern(r"\u12")
        with pytest.raises(RegexDialectError):
            java_pattern(r"\u{GG}")

    def test_bare_c_raises(self):
        with pytest.raises(RegexDialectError):
            java_pattern(r"\c1")


class TestEngineRouting:
    def test_dynamic_kernel_translates(self):
        kernel = compile_schema({"properties": {"s": {"pattern": r"\u0061\cJ"}}})
        assert list(kernel.validate({"s": "a\nx"})) == []
        assert len(list(kernel.validate({"s": "zz"}))) == 1

    def test_dynamic_kernel_raises_on_divergent(self):
        with pytest.raises(SchemaCompileError):
            compile_schema({"properties": {"s": {"pattern": r"\p{L}"}}})

    def test_columnar_raises_on_divergent(self):
        with pytest.raises(SchemaCompileError):
            compile_columnar({"properties": {"s": {"pattern": r"\p{L}"}}})
        with pytest.raises(SchemaCompileError):
            compile_columnar(
                {"patternProperties": {r"\u12": {"type": "string"}}}
            )

    def test_columnar_verdict_matches_kernel(self, spark):
        schema = {"properties": {"s": {"pattern": r"^\u0061+\cI$"}}}
        df = spark.createDataFrame([(0, "aaa\t"), (1, "bbb")], "rid: long, s: string")
        plan = compile_columnar(schema)
        got = {r["rid"]: r["verdict"] for r in plan.apply(df).collect()}
        assert got == {0: True, 1: False}
        kernel = compile_schema(schema)
        assert list(kernel.validate({"s": "aaa\t"})) == []
        assert len(list(kernel.validate({"s": "bbb"}))) == 1

    def test_named_group_pattern_properties(self):
        # (?<name>) in a patternProperties key compiles on the Python side
        kernel = compile_schema(
            {"patternProperties": {r"^(?<stem>x+)\d$": {"maximum": 5}}}
        )
        assert len(list(kernel.validate({"xx1": 9}))) == 1
        assert list(kernel.validate({"yy1": 9})) == []


class TestPropertyBased:
    def test_common_core_roundtrip(self):
        """Randomized common-core patterns pass through byte-for-byte for
        Java and compile to equivalent Python patterns."""
        from hypothesis import given, settings, strategies as st

        atoms = st.sampled_from(
            ["a", "b", ".", r"\d", r"\w", r"\s", "[a-z]", "[^0-9]", r"\.", r"\\"]
        )
        quants = st.sampled_from(["", "*", "+", "?", "{1,3}"])
        pieces = st.builds(lambda a, q: a + q, atoms, quants)

        @settings(max_examples=300, deadline=None)
        @given(st.lists(pieces, min_size=1, max_size=6), st.text("ab0. ", max_size=6))
        def check(parts, probe):
            p = "".join(parts)
            assert java_pattern(p) == p
            assert bool(python_pattern(p).search(probe)) == bool(re.compile(p).search(probe))

        check()

    def test_bmp_codepoint_escape_matches_char(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.integers(min_value=0x20, max_value=0xFFFF))
        def check(cp):
            if 0xD800 <= cp <= 0xDFFF:
                return  # surrogates aren't valid chars
            pat = python_pattern("\\u%04X" % cp)  # unambiguous 4-hex form
            assert pat.search("<" + chr(cp) + ">")
            assert not pat.search("<>")

        check()
