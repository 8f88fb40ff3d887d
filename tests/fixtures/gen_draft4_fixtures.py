"""Hand-authored draft-4 conformance fixtures, one JSON file per keyword
group — same shape as the official JSON-Schema-Test-Suite consumed by the
reference (reference test/test-suite.js:24-53; the suite submodule itself is
not vendored here, these cases are written from the draft-4 spec).

Run once: python tests/fixtures/gen_draft4_fixtures.py
"""

import json
import os

HERE = os.path.join(os.path.dirname(__file__), "draft4")

G = {}

G["type"] = [
    {"description": "integer type matches integers", "schema": {"type": "integer"}, "tests": [
        {"description": "an integer is an integer", "data": 1, "valid": True},
        {"description": "a float is not an integer", "data": 1.1, "valid": False},
        {"description": "a string is not an integer", "data": "foo", "valid": False},
        {"description": "a float with zero fraction is an integer", "data": 1.0, "valid": True},
        {"description": "null is not an integer", "data": None, "valid": False},
        {"description": "a boolean is not an integer", "data": True, "valid": False},
    ]},
    {"description": "number type matches numbers", "schema": {"type": "number"}, "tests": [
        {"description": "an integer is a number", "data": 1, "valid": True},
        {"description": "a float is a number", "data": 1.1, "valid": True},
        {"description": "a string is not a number", "data": "foo", "valid": False},
        {"description": "a boolean is not a number", "data": False, "valid": False},
    ]},
    {"description": "string type matches strings", "schema": {"type": "string"}, "tests": [
        {"description": "a string is a string", "data": "foo", "valid": True},
        {"description": "an empty string is a string", "data": "", "valid": True},
        {"description": "a number is not a string", "data": 1, "valid": False},
    ]},
    {"description": "object type matches objects", "schema": {"type": "object"}, "tests": [
        {"description": "an object is an object", "data": {}, "valid": True},
        {"description": "an array is not an object", "data": [], "valid": False},
        {"description": "null is not an object", "data": None, "valid": False},
    ]},
    {"description": "array type matches arrays", "schema": {"type": "array"}, "tests": [
        {"description": "an array is an array", "data": [1], "valid": True},
        {"description": "an object is not an array", "data": {}, "valid": False},
        {"description": "a string is not an array", "data": "foo", "valid": False},
    ]},
    {"description": "boolean type matches booleans", "schema": {"type": "boolean"}, "tests": [
        {"description": "true is a boolean", "data": True, "valid": True},
        {"description": "1 is not a boolean", "data": 1, "valid": False},
        {"description": "0 is not a boolean", "data": 0, "valid": False},
    ]},
    {"description": "null type matches only null", "schema": {"type": "null"}, "tests": [
        {"description": "null is null", "data": None, "valid": True},
        {"description": "false is not null", "data": False, "valid": False},
        {"description": "0 is not null", "data": 0, "valid": False},
    ]},
    {"description": "multiple types", "schema": {"type": ["integer", "string"]}, "tests": [
        {"description": "an integer matches", "data": 1, "valid": True},
        {"description": "a string matches", "data": "foo", "valid": True},
        {"description": "a float does not match", "data": 1.1, "valid": False},
        {"description": "an array does not match", "data": [], "valid": False},
    ]},
]

G["enum"] = [
    {"description": "simple enum validation", "schema": {"enum": [1, 2, 3]}, "tests": [
        {"description": "one of the enum is valid", "data": 1, "valid": True},
        {"description": "something else is invalid", "data": 4, "valid": False},
    ]},
    {"description": "heterogeneous enum", "schema": {"enum": [6, "foo", [], True, {"foo": 12}]}, "tests": [
        {"description": "one of the enum is valid", "data": [], "valid": True},
        {"description": "something else is invalid", "data": None, "valid": False},
        {"description": "objects are deep compared", "data": {"foo": False}, "valid": False},
        {"description": "deep-equal object is valid", "data": {"foo": 12}, "valid": True},
        {"description": "1 is not true", "data": 1, "valid": False},
    ]},
    {"description": "enum with 0 and false", "schema": {"enum": [0]}, "tests": [
        {"description": "0 is valid", "data": 0, "valid": True},
        {"description": "false is invalid (type-aware equality)", "data": False, "valid": False},
    ]},
    # R.equals number semantics INSIDE composites (reference
    # src/v4/enum.js:25): 1 == 1.0 at every nesting level, but numbers
    # never equal booleans or strings
    {"description": "composite enum numeric deep equality",
     "schema": {"enum": [[1], {"a": [2, {"b": 3}]}]}, "tests": [
        {"description": "float-encoded nested int is equal", "data": [1.0], "valid": True},
        {"description": "deeply nested float-encoded int is equal",
         "data": {"a": [2.0, {"b": 3.0}]}, "valid": True},
        {"description": "nested true is not 1", "data": [True], "valid": False},
        {"description": "nested string is not 1", "data": ["1"], "valid": False},
        {"description": "different nested number is invalid", "data": [1.5], "valid": False},
    ]},
]

G["minimum"] = [
    {"description": "minimum validation", "schema": {"minimum": 1.1}, "tests": [
        {"description": "above the minimum is valid", "data": 2.6, "valid": True},
        {"description": "boundary point is valid", "data": 1.1, "valid": True},
        {"description": "below the minimum is invalid", "data": 0.6, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "exclusiveMinimum", "schema": {"minimum": 1.1, "exclusiveMinimum": True}, "tests": [
        {"description": "above is valid", "data": 1.2, "valid": True},
        {"description": "boundary point is invalid", "data": 1.1, "valid": False},
    ]},
    {"description": "non-boolean exclusiveMinimum treated as false",
     "schema": {"minimum": 5, "exclusiveMinimum": "yes"}, "tests": [
        {"description": "boundary point is valid", "data": 5, "valid": True},
    ]},
]

G["maximum"] = [
    {"description": "maximum validation", "schema": {"maximum": 3.0}, "tests": [
        {"description": "below the maximum is valid", "data": 2.6, "valid": True},
        {"description": "boundary point is valid", "data": 3.0, "valid": True},
        {"description": "above the maximum is invalid", "data": 3.5, "valid": False},
        {"description": "ignores non-numbers", "data": "x", "valid": True},
    ]},
    {"description": "exclusiveMaximum", "schema": {"maximum": 3.0, "exclusiveMaximum": True}, "tests": [
        {"description": "below is valid", "data": 2.2, "valid": True},
        {"description": "boundary point is invalid", "data": 3.0, "valid": False},
    ]},
]

G["multipleOf"] = [
    {"description": "by int", "schema": {"multipleOf": 2}, "tests": [
        {"description": "int multiple is valid", "data": 10, "valid": True},
        {"description": "int non-multiple is invalid", "data": 7, "valid": False},
        {"description": "ignores non-numbers", "data": "foo", "valid": True},
    ]},
    {"description": "by number", "schema": {"multipleOf": 1.5}, "tests": [
        {"description": "zero is multiple of anything", "data": 0, "valid": True},
        {"description": "4.5 is multiple of 1.5", "data": 4.5, "valid": True},
        {"description": "35 is not multiple of 1.5", "data": 35, "valid": False},
    ]},
    {"description": "by small number", "schema": {"multipleOf": 0.0001}, "tests": [
        {"description": "0.0075 is multiple of 0.0001", "data": 0.0075, "valid": True},
        {"description": "0.00751 is not multiple of 0.0001", "data": 0.00751, "valid": False},
    ]},
]

G["minLength"] = [
    {"description": "minLength validation", "schema": {"minLength": 2}, "tests": [
        {"description": "longer is valid", "data": "foo", "valid": True},
        {"description": "exact length is valid", "data": "fo", "valid": True},
        {"description": "too short is invalid", "data": "f", "valid": False},
        {"description": "ignores non-strings", "data": 1, "valid": True},
        {"description": "counts code points not UTF-16 units", "data": "\U0001F4A9\U0001F4A9", "valid": True},
    ]},
]

G["maxLength"] = [
    {"description": "maxLength validation", "schema": {"maxLength": 2}, "tests": [
        {"description": "shorter is valid", "data": "f", "valid": True},
        {"description": "exact length is valid", "data": "fo", "valid": True},
        {"description": "too long is invalid", "data": "foo", "valid": False},
        {"description": "ignores non-strings", "data": 100, "valid": True},
        {"description": "two supplementary chars within limit", "data": "\U0001F4A9\U0001F4A9", "valid": True},
    ]},
]

G["pattern"] = [
    {"description": "pattern validation", "schema": {"pattern": "^a*$"}, "tests": [
        {"description": "matching pattern is valid", "data": "aaa", "valid": True},
        {"description": "non-matching is invalid", "data": "abc", "valid": False},
        {"description": "ignores non-strings", "data": True, "valid": True},
    ]},
    {"description": "pattern is not anchored", "schema": {"pattern": "a+"}, "tests": [
        {"description": "matches a substring", "data": "xxaayy", "valid": True},
    ]},
]

# the reference compiles pattern with a FLAGLESS new RegExp
# (src/v4/pattern.js:18), so Annex-B legacy semantics apply: \p/\P and
# dangling \u are IDENTITY escapes (they match the literal letter) and a
# brace run that is not a valid quantifier is literal text. A schema
# using \p{...} therefore validates on the reference — these fixtures
# pin that the engine reproduces the same verdicts in every mode.
G["pattern-annexb"] = [
    {"description": "flagless property escape is an identity escape",
     "schema": {"pattern": r"\p{L}"}, "tests": [
        {"description": "matches the literal p{L}", "data": "xp{L}y", "valid": True},
        {"description": "does not match arbitrary letters", "data": "letters", "valid": False},
    ]},
    {"description": "quantifier after identity-escaped p",
     "schema": {"pattern": r"^\p{2}$"}, "tests": [
        {"description": "pp matches", "data": "pp", "valid": True},
        {"description": "single p does not", "data": "p", "valid": False},
    ]},
    {"description": "dangling backslash-u is the literal letter",
     "schema": {"pattern": r"^\u{2}$"}, "tests": [
        {"description": "uu matches (quantified u)", "data": "uu", "valid": True},
        {"description": "the brace text does not", "data": "u{2}", "valid": False},
    ]},
    {"description": "non-quantifier braces are literal",
     "schema": {"pattern": r"^\u{1F600}$"}, "tests": [
        {"description": "literal u{1F600} matches", "data": "u{1F600}", "valid": True},
        {"description": "the code point does not", "data": "\U0001F600", "valid": False},
    ]},
    {"description": "identity escapes inside a character class",
     "schema": {"pattern": r"^[\p{L}]+$"}, "tests": [
        {"description": "class members are p L and braces", "data": "pL{}", "valid": True},
        {"description": "other letters rejected", "data": "q", "valid": False},
    ]},
]

G["minItems"] = [
    {"description": "minItems validation", "schema": {"minItems": 1}, "tests": [
        {"description": "longer is valid", "data": [1, 2], "valid": True},
        {"description": "exact is valid", "data": [1], "valid": True},
        {"description": "too short is invalid", "data": [], "valid": False},
        {"description": "ignores non-arrays", "data": "", "valid": True},
    ]},
]

G["maxItems"] = [
    {"description": "maxItems validation", "schema": {"maxItems": 2}, "tests": [
        {"description": "shorter is valid", "data": [1], "valid": True},
        {"description": "exact is valid", "data": [1, 2], "valid": True},
        {"description": "too long is invalid", "data": [1, 2, 3], "valid": False},
        {"description": "ignores non-arrays", "data": "aaa", "valid": True},
    ]},
]

G["uniqueItems"] = [
    {"description": "uniqueItems validation", "schema": {"uniqueItems": True}, "tests": [
        {"description": "unique array of ints is valid", "data": [1, 2], "valid": True},
        {"description": "non-unique array is invalid", "data": [1, 1], "valid": False},
        {"description": "numbers are unique if mathematically unequal", "data": [1.0, 1.00, 1], "valid": False},
        {"description": "nested numbers are compared mathematically", "data": [[1], [1.0]], "valid": False},
        {"description": "nested objects with float-encoded ints are duplicates",
         "data": [{"a": 1}, {"a": 1.0}], "valid": False},
        {"description": "nested true and 1 stay distinct", "data": [[True], [1]], "valid": True},
        {"description": "unique array of objects is valid", "data": [{"foo": "bar"}, {"foo": "baz"}], "valid": True},
        {"description": "non-unique array of objects is invalid", "data": [{"foo": "bar"}, {"foo": "bar"}], "valid": False},
        {"description": "nested objects deep-compared", "data": [{"a": {"b": True}}, {"a": {"b": True}}], "valid": False},
        {"description": "1 and true are unique", "data": [1, True], "valid": True},
        {"description": "0 and false are unique", "data": [0, False], "valid": True},
        {"description": "ignores non-arrays", "data": {}, "valid": True},
    ]},
    {"description": "uniqueItems false", "schema": {"uniqueItems": False}, "tests": [
        {"description": "non-unique array is valid when false", "data": [1, 1], "valid": True},
    ]},
]

G["minProperties"] = [
    {"description": "minProperties validation", "schema": {"minProperties": 1}, "tests": [
        {"description": "more is valid", "data": {"a": 1, "b": 2}, "valid": True},
        {"description": "exact is valid", "data": {"a": 1}, "valid": True},
        {"description": "too few is invalid", "data": {}, "valid": False},
        {"description": "ignores non-objects", "data": [], "valid": True},
    ]},
]

G["maxProperties"] = [
    {"description": "maxProperties validation", "schema": {"maxProperties": 2}, "tests": [
        {"description": "fewer is valid", "data": {"a": 1}, "valid": True},
        {"description": "exact is valid", "data": {"a": 1, "b": 2}, "valid": True},
        {"description": "too many is invalid", "data": {"a": 1, "b": 2, "c": 3}, "valid": False},
        {"description": "ignores non-objects", "data": [1, 2, 3], "valid": True},
    ]},
]

G["required"] = [
    {"description": "required validation", "schema": {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]}, "tests": [
        {"description": "present property is valid", "data": {"foo": 1}, "valid": True},
        {"description": "missing property is invalid", "data": {"bar": 1}, "valid": False},
        {"description": "ignores non-objects", "data": 12, "valid": True},
        {"description": "present but null property is valid", "data": {"foo": None}, "valid": True},
    ]},
    {"description": "multiple required", "schema": {"required": ["a", "b", "c"]}, "tests": [
        {"description": "all present is valid", "data": {"a": 1, "b": 2, "c": 3}, "valid": True},
        {"description": "two missing yields two errors", "data": {"b": 2}, "valid": False},
    ]},
]

G["properties"] = [
    {"description": "object properties validation",
     "schema": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}}, "tests": [
        {"description": "both valid", "data": {"foo": 1, "bar": "baz"}, "valid": True},
        {"description": "one invalid", "data": {"foo": 1, "bar": {}}, "valid": False},
        {"description": "both invalid", "data": {"foo": [], "bar": {}}, "valid": False},
        {"description": "absent properties vacuously pass", "data": {}, "valid": True},
        {"description": "ignores non-objects", "data": [], "valid": True},
    ]},
    {"description": "nested properties",
     "schema": {"properties": {"out": {"properties": {"in": {"type": "boolean"}}}}}, "tests": [
        {"description": "nested valid", "data": {"out": {"in": True}}, "valid": True},
        {"description": "nested invalid", "data": {"out": {"in": 7}}, "valid": False},
    ]},
]

G["patternProperties"] = [
    {"description": "patternProperties validates matching keys",
     "schema": {"patternProperties": {"f.*o": {"type": "integer"}}}, "tests": [
        {"description": "single match valid", "data": {"foo": 1}, "valid": True},
        {"description": "single match invalid", "data": {"foo": "bar"}, "valid": False},
        {"description": "unmatched key ignored", "data": {"xxx": "y"}, "valid": True},
        {"description": "ignores non-objects", "data": 12, "valid": True},
    ]},
    {"description": "multiple simultaneous patternProperties",
     "schema": {"patternProperties": {"a*": {"type": "integer"}, "aaa*": {"maximum": 20}}}, "tests": [
        {"description": "single valid", "data": {"a": 21}, "valid": True},
        {"description": "invalid due to one", "data": {"a": "bar"}, "valid": False},
        {"description": "invalid due to the other", "data": {"aaaa": 31}, "valid": False},
    ]},
]

G["additionalProperties"] = [
    {"description": "additionalProperties false",
     "schema": {"properties": {"foo": {}, "bar": {}}, "patternProperties": {"^v": {}},
                "additionalProperties": False}, "tests": [
        {"description": "no additional is valid", "data": {"foo": 1}, "valid": True},
        {"description": "an additional is invalid", "data": {"foo": 1, "quux": "boom"}, "valid": False},
        {"description": "ignores non-objects", "data": [1, 2, 3], "valid": True},
        {"description": "patternProperties are not additional", "data": {"foo": 1, "vroom": 2}, "valid": True},
    ]},
    {"description": "additionalProperties as schema",
     "schema": {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}}, "tests": [
        {"description": "valid additional", "data": {"foo": 1, "bar": True}, "valid": True},
        {"description": "invalid additional", "data": {"foo": 1, "bar": 12}, "valid": False},
    ]},
    {"description": "additionalProperties alone",
     "schema": {"additionalProperties": {"type": "boolean"}}, "tests": [
        {"description": "every property counts as additional", "data": {"foo": 1}, "valid": False},
        {"description": "valid when all conform", "data": {"foo": True}, "valid": True},
    ]},
    {"description": "additionalProperties true", "schema": {"additionalProperties": True}, "tests": [
        {"description": "anything goes", "data": {"foo": 1}, "valid": True},
    ]},
]

G["items"] = [
    {"description": "items as schema", "schema": {"items": {"type": "integer"}}, "tests": [
        {"description": "valid items", "data": [1, 2, 3], "valid": True},
        {"description": "wrong type of items", "data": [1, "x"], "valid": False},
        {"description": "ignores non-arrays", "data": {"foo": "bar"}, "valid": True},
        {"description": "empty array valid", "data": [], "valid": True},
    ]},
    {"description": "items as tuple",
     "schema": {"items": [{"type": "integer"}, {"type": "string"}]}, "tests": [
        {"description": "correct types", "data": [1, "foo"], "valid": True},
        {"description": "wrong types", "data": ["foo", 1], "valid": False},
        {"description": "incomplete tuple is valid", "data": [1], "valid": True},
        {"description": "longer is valid without additionalItems", "data": [1, "foo", True], "valid": True},
    ]},
]

G["additionalItems"] = [
    {"description": "additionalItems false with tuple items",
     "schema": {"items": [{"type": "integer"}], "additionalItems": False}, "tests": [
        {"description": "fitting the tuple is valid", "data": [1], "valid": True},
        {"description": "extra item is invalid", "data": [1, "foo"], "valid": False},
        {"description": "empty array valid", "data": [], "valid": True},
    ]},
    {"description": "additionalItems as schema",
     "schema": {"items": [{}], "additionalItems": {"type": "integer"}}, "tests": [
        {"description": "additional items match schema", "data": [None, 2, 3, 4], "valid": True},
        {"description": "additional items do not match", "data": [None, 2, 3, "foo"], "valid": False},
    ]},
    {"description": "additionalItems ignored with schema-form items",
     "schema": {"items": {}, "additionalItems": False}, "tests": [
        {"description": "all items valid", "data": [1, 2, 3, 4, 5], "valid": True},
    ]},
    {"description": "standalone additionalItems is not a predicate",
     "schema": {"additionalItems": False}, "tests": [
        {"description": "ignored entirely", "data": [1, 2], "valid": True},
    ]},
]

G["dependencies"] = [
    {"description": "property dependencies", "schema": {"dependencies": {"bar": ["foo"]}}, "tests": [
        {"description": "neither present is valid", "data": {}, "valid": True},
        {"description": "nondependant is valid", "data": {"foo": 1}, "valid": True},
        {"description": "with dependency is valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "missing dependency is invalid", "data": {"bar": 2}, "valid": False},
        {"description": "ignores non-objects", "data": "foo", "valid": True},
    ]},
    {"description": "multiple property dependencies",
     "schema": {"dependencies": {"quux": ["foo", "bar"]}}, "tests": [
        {"description": "with both dependencies valid", "data": {"foo": 1, "bar": 2, "quux": 3}, "valid": True},
        {"description": "missing one is invalid", "data": {"foo": 1, "quux": 2}, "valid": False},
        {"description": "missing both is invalid", "data": {"quux": 1}, "valid": False},
    ]},
    {"description": "schema dependencies",
     "schema": {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"},
                                                        "bar": {"type": "integer"}}}}}, "tests": [
        {"description": "valid", "data": {"foo": 1, "bar": 2}, "valid": True},
        {"description": "no dependency", "data": {"foo": "quux"}, "valid": True},
        {"description": "wrong type", "data": {"foo": "quux", "bar": 2}, "valid": False},
    ]},
]

G["allOf"] = [
    {"description": "allOf",
     "schema": {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                          {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]}, "tests": [
        {"description": "allOf valid", "data": {"foo": "baz", "bar": 2}, "valid": True},
        {"description": "mismatch second", "data": {"foo": "baz"}, "valid": False},
        {"description": "mismatch first", "data": {"bar": 2}, "valid": False},
        {"description": "wrong type", "data": {"foo": "baz", "bar": "quux"}, "valid": False},
    ]},
    {"description": "allOf with base schema",
     "schema": {"properties": {"bar": {"type": "integer"}}, "required": ["bar"],
                "allOf": [{"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]}, "tests": [
        {"description": "valid", "data": {"foo": "quux", "bar": 2}, "valid": True},
        {"description": "mismatch base schema", "data": {"foo": "quux"}, "valid": False},
        {"description": "mismatch both", "data": {}, "valid": False},
    ]},
    {"description": "allOf simple types", "schema": {"allOf": [{"maximum": 30}, {"minimum": 20}]}, "tests": [
        {"description": "valid", "data": 25, "valid": True},
        {"description": "mismatch one", "data": 35, "valid": False},
    ]},
]

G["anyOf"] = [
    {"description": "anyOf", "schema": {"anyOf": [{"type": "integer"}, {"minimum": 2}]}, "tests": [
        {"description": "first valid", "data": 1, "valid": True},
        {"description": "second valid", "data": 2.5, "valid": True},
        {"description": "both valid", "data": 3, "valid": True},
        {"description": "neither valid", "data": 1.5, "valid": False},
    ]},
    {"description": "anyOf with base schema",
     "schema": {"type": "string", "anyOf": [{"maxLength": 2}, {"minLength": 4}]}, "tests": [
        {"description": "mismatch base", "data": 3, "valid": False},
        {"description": "one matches", "data": "foobar", "valid": True},
        {"description": "neither matches", "data": "foo", "valid": False},
    ]},
]

G["oneOf"] = [
    {"description": "oneOf", "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, "tests": [
        {"description": "first valid only", "data": 1, "valid": True},
        {"description": "second valid only", "data": 2.5, "valid": True},
        {"description": "both valid is invalid", "data": 3, "valid": False},
        {"description": "neither is invalid", "data": 1.5, "valid": False},
    ]},
    {"description": "oneOf with base schema",
     "schema": {"type": "string", "oneOf": [{"minLength": 2}, {"maxLength": 4}]}, "tests": [
        {"description": "mismatch base", "data": 3, "valid": False},
        {"description": "one matches", "data": "foobar", "valid": True},
        {"description": "both match is invalid", "data": "foo", "valid": False},
    ]},
]

G["not"] = [
    {"description": "not", "schema": {"not": {"type": "integer"}}, "tests": [
        {"description": "allowed", "data": "foo", "valid": True},
        {"description": "disallowed", "data": 1, "valid": False},
    ]},
    {"description": "not multiple types", "schema": {"not": {"type": ["integer", "boolean"]}}, "tests": [
        {"description": "neither is valid", "data": "foo", "valid": True},
        {"description": "one is invalid", "data": 1, "valid": False},
        {"description": "other is invalid", "data": True, "valid": False},
    ]},
    {"description": "not more complex",
     "schema": {"not": {"type": "object", "properties": {"foo": {"type": "string"}}}}, "tests": [
        {"description": "match is invalid", "data": {"foo": "bar"}, "valid": False},
        {"description": "other is valid", "data": 1, "valid": True},
        {"description": "mismatched object is valid", "data": {"foo": 1}, "valid": True},
    ]},
]

G["default"] = [
    {"description": "default is not a predicate",
     "schema": {"properties": {"foo": {"type": "integer", "default": []}}}, "tests": [
        {"description": "valid when property present", "data": {"foo": 13}, "valid": True},
        {"description": "still valid when absent", "data": {}, "valid": True},
    ]},
]

G["definitions"] = [
    {"description": "definitions referenced locally",
     "schema": {"definitions": {"positiveInt": {"type": "integer", "minimum": 1}},
                "properties": {"n": {"$ref": "#/definitions/positiveInt"}}}, "tests": [
        {"description": "conforming value", "data": {"n": 5}, "valid": True},
        {"description": "non-conforming value", "data": {"n": 0}, "valid": False},
        {"description": "wrong type", "data": {"n": "x"}, "valid": False},
    ]},
]

G["ref"] = [
    {"description": "root pointer ref",
     "schema": {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False}, "tests": [
        {"description": "match", "data": {"foo": False}, "valid": True},
        {"description": "recursive match", "data": {"foo": {"foo": False}}, "valid": True},
        {"description": "mismatch", "data": {"bar": False}, "valid": False},
        {"description": "recursive mismatch", "data": {"foo": {"bar": False}}, "valid": False},
    ]},
    {"description": "relative pointer ref to object",
     "schema": {"properties": {"foo": {"type": "integer"}, "bar": {"$ref": "#/properties/foo"}}}, "tests": [
        {"description": "match", "data": {"bar": 3}, "valid": True},
        {"description": "mismatch", "data": {"bar": True}, "valid": False},
    ]},
    {"description": "relative pointer ref to array",
     "schema": {"items": [{"type": "integer"}, {"$ref": "#/items/0"}]}, "tests": [
        {"description": "match array", "data": [1, 2], "valid": True},
        {"description": "mismatch array", "data": [1, "foo"], "valid": False},
    ]},
    {"description": "escaped pointer ref",
     "schema": {"tilda~field": {"type": "integer"}, "slash/field": {"type": "integer"},
                "properties": {"tilda": {"$ref": "#/tilda~0field"},
                               "slash": {"$ref": "#/slash~1field"}}}, "tests": [
        {"description": "slash invalid", "data": {"slash": "aoeu"}, "valid": False},
        {"description": "tilda invalid", "data": {"tilda": "aoeu"}, "valid": False},
        {"description": "both valid", "data": {"slash": 1, "tilda": 1}, "valid": True},
    ]},
    {"description": "nested refs",
     "schema": {"definitions": {"a": {"type": "integer"}, "b": {"$ref": "#/definitions/a"},
                                "c": {"$ref": "#/definitions/b"}},
                "$ref": "#/definitions/c"}, "tests": [
        {"description": "nested ref valid", "data": 5, "valid": True},
        {"description": "nested ref invalid", "data": "a", "valid": False},
    ]},
]

G["refRemote"] = [
    {"description": "remote ref", "schema": {"$ref": "http://localhost:1234/integer.json"},
     "refs": {"http://localhost:1234/integer.json": {"type": "integer"}}, "tests": [
        {"description": "remote ref valid", "data": 1, "valid": True},
        {"description": "remote ref invalid", "data": "a", "valid": False},
    ]},
    {"description": "fragment within remote ref",
     "schema": {"$ref": "http://localhost:1234/subSchemas.json#/integer"},
     "refs": {"http://localhost:1234/subSchemas.json": {
         "integer": {"type": "integer"},
         "refToInteger": {"$ref": "#/integer"}}}, "tests": [
        {"description": "remote fragment valid", "data": 1, "valid": True},
        {"description": "remote fragment invalid", "data": "a", "valid": False},
    ]},
    {"description": "ref within remote ref",
     "schema": {"$ref": "http://localhost:1234/subSchemas.json#/refToInteger"},
     "refs": {"http://localhost:1234/subSchemas.json": {
         "integer": {"type": "integer"},
         "refToInteger": {"$ref": "#/integer"}}}, "tests": [
        {"description": "ref within ref valid", "data": 1, "valid": True},
        {"description": "ref within ref invalid", "data": "a", "valid": False},
    ]},
    # NB: refs resolve against the TOP-LEVEL id only, mirroring the
    # reference's documented limitation (reference src/linker.js:119-132
    # note at :120) — nested-id base-scoping is intentionally absent.
    {"description": "relative remote ref against top-level id",
     "schema": {"id": "http://localhost:1234/", "items": {
                "items": {"$ref": "folderInteger.json"}}},
     "refs": {"http://localhost:1234/folderInteger.json": {"type": "integer"}}, "tests": [
        {"description": "relative remote valid", "data": [[1]], "valid": True},
        {"description": "relative remote invalid", "data": [["a"]], "valid": False},
    ]},
]

def main():
    os.makedirs(HERE, exist_ok=True)
    for name, groups in G.items():
        with open(os.path.join(HERE, f"{name}.json"), "w") as f:
            json.dump(groups, f, indent=1)
    print(f"wrote {len(G)} fixture files to {HERE}")


if __name__ == "__main__":
    main()
