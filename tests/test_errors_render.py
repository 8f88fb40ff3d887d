"""Error rendering parity with the reference's Err.toString
(reference src/err.js:22-63) and linker/pointer behavior
(reference src/linker.js, src/context.js, src/url.js)."""

import pytest

from schema_fantasy_spark import compile_schema
from schema_fantasy_spark.errors import (
    COMPOUND,
    SINGLE,
    VALUES,
    Err,
    errs_to_rows,
    human_list,
    render_error,
)
from schema_fantasy_spark.compiler.linker import (
    CyclicRefError,
    UnknownResourceError,
    link,
    refs_in,
)
from schema_fantasy_spark.compiler.pointer import unescape_token, walk_pointer


def test_render_single_with_path():
    e = Err(SINGLE, "minLength", "shorter than 5 characters", ("a", 0))
    assert render_error(e) == "a/0: shorter than 5 characters"


def test_render_single_empty_path_compacted():
    e = Err(SINGLE, "minLength", "shorter than 5 characters", ())
    assert render_error(e) == "shorter than 5 characters"


def test_render_values():
    e = Err(VALUES, "type", "Invalid type", ("x",), "integer or string", "array")
    assert render_error(e) == "x: Invalid type: expected integer or string, was array"


def test_render_values_empty_message():
    # enum uses message "" — compact join drops it (reference src/v4/enum.js:34)
    e = Err(VALUES, "enum", "", (), "1, 2 or 3", "4")
    assert render_error(e) == "expected 1, 2 or 3, was 4"


def test_render_compound():
    child = Err(SINGLE, "required", "missing foo", ())
    e = Err(COMPOUND, "allOf", "Not all conditions valid", (), children=[child])
    assert render_error(e) == "Not all conditions valid: 1 error found\nmissing foo"


def test_render_compound_plural():
    kids = [Err(SINGLE, "required", f"missing {k}", ()) for k in "ab"]
    e = Err(COMPOUND, "allOf", "Not all conditions valid", (), children=kids)
    assert render_error(e).startswith("Not all conditions valid: 2 errors found\n")


def test_human_list():
    assert human_list("or", []) == ""
    assert human_list("or", ["a"]) == "a"
    assert human_list("or", ["a", "b"]) == "a or b"
    assert human_list("and", ["a", "b", "c"]) == "a, b and c"


def test_reference_message_strings_end_to_end():
    # exact message-string parity on a few compiled validations
    cases = [
        ({"minimum": 5}, 3, "less than 5"),
        ({"minimum": 5, "exclusiveMinimum": True}, 5, "less than or equal to 5"),
        ({"maximum": 5}, 7, "greater than 5"),
        ({"multipleOf": 3}, 7, "not a multiple of 3"),
        ({"pattern": "^a"}, "b", "does not match /^a/"),
        ({"minItems": 2}, [1], "less than 2 items"),
        ({"maxItems": 1}, [1, 2], "more than 1 items"),
        ({"minLength": 2}, "a", "shorter than 2 characters"),
        ({"maxLength": 1}, "ab", "longer than 1 characters"),
        ({"minProperties": 1}, {}, "less than 1 properties"),
        ({"maxProperties": 0}, {"a": 1}, "more than 0 properties"),
        ({"not": {}}, 1, "condition valid"),
        ({"uniqueItems": True}, [1, 1], "does not contain unique values: 1 duplicate found"),
        ({"uniqueItems": True}, [1, 1, 2, 2], "does not contain unique values: 2 duplicates found"),
    ]
    for schema, value, want in cases:
        errs = compile_schema(schema).validate(value)
        assert len(errs) == 1 and errs[0].message == want, (schema, value, errs)


def test_additional_properties_messages():
    errs = compile_schema({"additionalProperties": False}).validate({"x": 1, "y": 2})
    assert errs[0].message == "additional properties found: x and y"
    errs = compile_schema({"additionalProperties": False}).validate({"x": 1})
    assert errs[0].message == "additional property found: x"
    errs = compile_schema({"additionalProperties": {"type": "integer"}}).validate({"x": "s"})
    assert errs[0].message == "additional property invalid: x"
    assert errs[0].children[0].vpath == ("x",)


def test_dependencies_messages():
    errs = compile_schema({"dependencies": {"bar": ["foo"]}}).validate({"bar": 1})
    assert errs[0].message == 'Missing dependency for "bar"'
    assert errs[0].children[0].message == 'Missing "foo" given "bar"'
    errs = compile_schema({"dependencies": {"bar": ["foo", "baz"]}}).validate({"bar": 1})
    assert errs[0].message == 'Missing dependencies for "bar"'


def test_errs_to_rows_flatten():
    child = Err(SINGLE, "type", "Invalid type", ("a",))
    e = Err(COMPOUND, "allOf", "Not all conditions valid", (), children=[child])
    rows = errs_to_rows([e])
    assert [r["depth"] for r in rows] == [0, 1]
    assert rows[1]["path"] == ["a"]


# ------------------------------------------------------------------- linker


def test_unescape_rfc6901():
    # RFC-correct, documented divergence from reference src/url.js:39-41
    assert unescape_token("a~1b") == "a/b"
    assert unescape_token("a~0b") == "a~b"
    assert unescape_token("~01") == "~1"  # the reference quirk would mangle this


def test_walk_pointer():
    doc = {"a": {"b": [10, {"c": 1}]}}
    assert walk_pointer(doc, "/a/b/1/c") == 1
    assert walk_pointer(doc, "") == doc


def test_refs_in_resolves_against_top_level_id():
    doc = {
        "id": "http://example.com/root.json",
        "properties": {
            "a": {"$ref": "other.json#/definitions/x"},
            "b": {"$ref": "#/definitions/local"},
            "c": {"$ref": "http://elsewhere.org/abs.json"},
        },
    }
    assert refs_in(doc) == [
        "http://example.com/other.json",
        "http://elsewhere.org/abs.json",
    ]


def test_link_transitive_with_cycle():
    # modeled on the reference's "fake internet" with circular refs
    # (reference test/test-linker.js:61-116) — dedup breaks the cycle
    universe = {
        "http://x/a": {"id": "http://x/a", "properties": {"b": {"$ref": "http://x/b"}}},
        "http://x/b": {"id": "http://x/b", "properties": {"a": {"$ref": "http://x/a"}}},
    }
    fetched = []

    def fetch(url):
        fetched.append(url)
        return universe[url]

    refs, root = link(fetch, "http://x/a")
    assert set(refs) == {"http://x/a", "http://x/b"}
    assert fetched == ["http://x/a", "http://x/b"]  # each fetched exactly once


def test_unknown_resource_raises():
    with pytest.raises(UnknownResourceError):
        compile_schema({"$ref": "http://nowhere/void.json"})


def test_cyclic_ref_chain_raises():
    # reference test/test-smoke.js:194-226 semantics
    with pytest.raises(CyclicRefError):
        compile_schema(
            {"definitions": {"a": {"$ref": "#/definitions/b"},
                             "b": {"$ref": "#/definitions/a"}},
             "$ref": "#/definitions/a"}
        )
