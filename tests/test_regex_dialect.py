"""JS-regex dialect routing (reference src/v4/pattern.js:18 compiles
``pattern`` with JavaScript ``new RegExp``): translatable JS spellings must
yield the reference's verdicts on every engine mode. The reference's
RegExp is FLAGLESS, so Annex-B legacy semantics apply: ``\\p``/``\\P``/
dangling ``\\u`` are identity escapes and non-quantifier braces are
literals — the default translation reproduces exactly that reading;
``strict=True`` rejects those constructs at schema-compile time instead."""

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

    def test_codepoint_escape_braces_annex_b(self):
        # \u{...} is a code-point escape ONLY under the u flag; the
        # reference's flagless new RegExp reads '\u' as an identity
        # escape, so {2} quantifies the literal 'u' and {GG} is a
        # literal brace run (Annex B) — the default translation must
        # reproduce exactly that reading
        assert python_pattern(r"\u{2}").fullmatch("uu")
        assert not python_pattern(r"\u{2}").fullmatch("u")
        assert python_pattern(r"\u{1F600}").fullmatch("u{1F600}")
        assert java_pattern(r"\u{2}") == "u{2}"
        assert java_pattern(r"\u{1F600}") == r"u\{1F600\}"
        # strict mode rejects the ambiguity at compile time instead
        with pytest.raises(RegexDialectError):
            java_pattern(r"\u{1F600}", strict=True)
        with pytest.raises(RegexDialectError):
            python_pattern(r"\u{2}", strict=True)
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

    def test_property_escape_annex_b(self):
        # flagless '\p' is an identity escape in the reference: \p{L}
        # matches the literal text 'p{L}' ({L} is not a quantifier, so
        # the braces are literal), \p{2} matches 'pp' (quantified p)
        assert python_pattern(r"\p{L}").fullmatch("p{L}")
        assert python_pattern(r"\P{Lu}x").fullmatch("P{Lu}x")
        assert python_pattern(r"\p{2}").fullmatch("pp")
        assert java_pattern(r"\p{Letter}+") == r"p\{Letter\}+"
        # inside a class: identity escape, braces already literal there
        assert python_pattern(r"[\p{L}]+").fullmatch("pL{}")
        assert java_pattern(r"[\p]") == "[p]"
        # strict mode rejects property escapes at compile time
        with pytest.raises(RegexDialectError):
            java_pattern(r"\p{Letter}+", strict=True)
        with pytest.raises(RegexDialectError):
            python_pattern(r"\P{L}", strict=True)

    def test_malformed_u_annex_b(self):
        # dangling '\u' (no 4 hex digits) is the literal letter 'u'
        assert python_pattern(r"\u12").fullmatch("u12")
        assert java_pattern(r"\u12") == "u12"
        with pytest.raises(RegexDialectError):
            java_pattern(r"\u12", strict=True)
        with pytest.raises(RegexDialectError):
            java_pattern(r"\u{GG}", strict=True)

    def test_literal_braces_match_annex_b(self):
        # a brace that is not a valid quantifier is a literal in the
        # flagless reference; valid quantifiers still quantify
        assert python_pattern(r"a{2}").fullmatch("aa")
        assert python_pattern(r"a{,3}").fullmatch("a{,3}")  # JS: literal
        assert python_pattern(r"x{y}").fullmatch("x{y}")
        assert java_pattern(r"a{2,3}") == r"a{2,3}"
        assert java_pattern(r"x{y}") == r"x\{y\}"
        assert java_pattern(r"a}b") == r"a\}b"
        assert java_pattern(r"[{}]") == r"[{}]"  # class braces untouched

    def test_bare_c_raises(self):
        with pytest.raises(RegexDialectError):
            java_pattern(r"\c1")


class TestEngineRouting:
    def test_dynamic_kernel_translates(self):
        kernel = compile_schema({"properties": {"s": {"pattern": r"\u0061\cJ"}}})
        assert list(kernel.validate({"s": "a\nx"})) == []
        assert len(list(kernel.validate({"s": "zz"}))) == 1

    def test_dynamic_kernel_annex_b_parity(self):
        # a schema that works on the reference must validate identically
        # here: \p{L} matches the literal 'p{L}' in the flagless RegExp
        kernel = compile_schema({"properties": {"s": {"pattern": r"\p{L}"}}})
        assert list(kernel.validate({"s": "xp{L}y"})) == []
        assert len(list(kernel.validate({"s": "letters"}))) == 1

    def test_columnar_annex_b_parity(self, spark):
        plan = compile_columnar({"properties": {"s": {"pattern": r"\p{L}"}}})
        df = spark.createDataFrame(
            [(0, "xp{L}y"), (1, "letters")], "rid: long, s: string"
        )
        got = {r["rid"]: r["verdict"] for r in plan.apply(df).collect()}
        assert got == {0: True, 1: False}
        # patternProperties keys route through the same translation
        kernel = compile_columnar(
            {"patternProperties": {r"\u12": {"type": "string"}}}
        )
        assert kernel is not None

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


def test_atomless_braced_quantifier_raises_both_modes():
    """ADVICE r8: a VALID-form braced quantifier with nothing to repeat
    ('{2}' at pattern start / after '|' / after '(') is an Annex-B
    InvalidBracedQuantifier — the reference's flagless RegExp rejects it
    at COMPILE time, so both dialect paths must raise RegexDialectError
    instead of deferring to a runtime rlike failure / bare re.error."""
    import pytest

    from schema_fantasy_spark.compiler.regex_dialect import (
        RegexDialectError,
        java_pattern,
        python_pattern,
    )

    for pat in ["{2}", "a|{2}", "({3,})", "(a|{2,4})", "(?<n>{2})x"]:
        for fn in (java_pattern, python_pattern):
            with pytest.raises(RegexDialectError):
                fn(pat)
    # quantifiable / literal forms are untouched
    assert java_pattern("a{2}") == "a{2}"
    assert java_pattern("(a){2}") == "(a){2}"
    assert java_pattern("[a]{2}") == "[a]{2}"
    assert java_pattern("[{2}]") == "[{2}]"      # braces in a class
    assert java_pattern("{GG}") == r"\{GG\}"     # invalid form: literal
    assert java_pattern("x{,2}") == r"x\{,2\}"   # invalid form: literal
    assert java_pattern("\\u{2}") == "u{2}"      # identity-escape 'u' quantified
