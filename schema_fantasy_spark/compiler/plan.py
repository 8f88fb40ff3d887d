"""Compile a JSON-Schema draft-4 document into a validator, once, on the driver.

Re-expresses the reference's recursive interpreter (reference index.js:56-63:
for each schema key dispatch a predicate, fold results applicatively so ALL
failures accumulate) as a one-time compilation:

* $ref chains resolved at compile time with cycle detection
  (reference src/context.js:16-37 semantics; cycle/unknown -> raise here,
  at plan time, instead of at cursor-focus time).
* unknown keywords elided (reference index.js:73, src/predicate.js:58,85 —
  unknown -> vacuous success; also 'default', 'definitions', 'format', 'id').
* regexes precompiled (the reference deliberately recompiles per evaluation,
  src/v4/pattern.js:18 — a documented naivety we do not reproduce).
* every keyword predicate keeps its universal type guard: vacuous success
  when the value is not of the type the keyword applies to
  (e.g. reference src/v4/pattern.js:16).

Documented divergences:
* integer: the reference tests ``x === (x|0)`` (src/v4/type.js:13), which
  silently bounds integers to int32 in JS. We use mathematical integrality
  (int, or float with .is_integer()), matching draft-4 intent.
* enum expected-value rendering uses compact JSON, not JS String().

The compiled validator is a pure-Python closure tree: picklable-free state
(only schema constants + compiled regexes), safe to reference from a pandas
UDF — Spark broadcasts it with the task closure.
"""

from __future__ import annotations

import json
import re
import unicodedata
from typing import Any, Callable, Dict, List, Optional, Tuple

from schema_fantasy_spark.errors import (
    COMPOUND,
    SINGLE,
    VALUES,
    Err,
    human_list,
)
from schema_fantasy_spark.compiler.linker import (
    CyclicRefError,
    UnknownResourceError,
    resolve_ref,
)

Validator = Callable[[Any, tuple], List[Err]]


class SchemaCompileError(Exception):
    pass


# ---------------------------------------------------------------- type model


def type_of(v: Any) -> str:
    """JSON runtime type, mirror of reference src/v4/type.js:12."""
    if v is None:
        return "null"
    if isinstance(v, bool):  # before int: Python bool subclasses int
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "unknown"


def is_integer(v: Any) -> bool:
    """Integer-valued number (reference src/v4/type.js:13; int32 quirk not
    reproduced — see module docstring)."""
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return True
    return isinstance(v, float) and v.is_integer()


def canonical(v: Any):
    """Hashable type-tagged canonical form for JSON deep equality
    (R.equals semantics: 1 == 1.0 but 1 != true != '1')."""
    t = type_of(v)
    if t == "number":
        return ("n", float(v))
    if t == "array":
        return ("a", tuple(canonical(x) for x in v))
    if t == "object":
        return ("o", tuple(sorted((k, canonical(x)) for k, x in v.items())))
    return (t[0], v)


def json_repr(v: Any) -> str:
    """Stringify a JSON value for error messages."""
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"), sort_keys=True)


def ulength(s: str) -> int:
    """Code-point length after NFC normalization (reference
    src/v4/minLength.js:18-22 + src/ulength.js:9-17 — surrogate pairs
    count as one, which is exactly Python's code-point len)."""
    return len(unicodedata.normalize("NFC", s))


# ------------------------------------------------------------ leaf keywords
# Each _k_* returns a Validator closure. `sch` is the keyword's schema value.


def _k_type(sch: Any) -> Validator:
    types = sch if isinstance(sch, list) else [sch]
    expected = " or ".join(str(t) for t in types)
    tset = set(types)

    def check(v, vpath):
        actual = type_of(v)
        if actual in tset or (is_integer(v) and "integer" in tset):
            return []
        return [Err(VALUES, "type", "Invalid type", vpath, expected, actual)]

    return check


def _k_enum(sch: Any) -> Validator:
    allowed = {canonical(x) for x in sch}
    expected = human_list("or", [json_repr(x) for x in sch])

    def check(v, vpath):
        if canonical(v) in allowed:
            return []
        return [Err(VALUES, "enum", "", vpath, expected, json_repr(v))]

    return check


def _k_minimum(sch: Any, siblings: dict) -> Validator:
    excl = siblings.get("exclusiveMinimum")
    excl = excl if isinstance(excl, bool) else False  # non-boolean -> false

    def check(v, vpath):
        if type_of(v) != "number":
            return []
        ok = v > sch if excl else v >= sch
        if ok:
            return []
        msg = f"less than {'or equal to ' if excl else ''}{sch}"
        return [Err(SINGLE, "minimum", msg, vpath)]

    return check


def _k_maximum(sch: Any, siblings: dict) -> Validator:
    excl = siblings.get("exclusiveMaximum")
    excl = excl if isinstance(excl, bool) else False

    def check(v, vpath):
        if type_of(v) != "number":
            return []
        ok = v < sch if excl else v <= sch
        if ok:
            return []
        msg = f"greater than {'or equal to ' if excl else ''}{sch}"
        return [Err(SINGLE, "maximum", msg, vpath)]

    return check


def _k_multipleOf(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "number":
            return []
        if isinstance(v, int) and isinstance(sch, int) and sch != 0:
            ok = v % sch == 0
        else:
            ok = (v / sch) % 1 == 0  # float semantics, IEEE754 like JS
        if ok:
            return []
        return [Err(SINGLE, "multipleOf", f"not a multiple of {sch}", vpath)]

    return check


def _k_minLength(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "string" or ulength(v) >= sch:
            return []
        return [Err(SINGLE, "minLength", f"shorter than {sch} characters", vpath)]

    return check


def _k_maxLength(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "string" or ulength(v) <= sch:
            return []
        return [Err(SINGLE, "maxLength", f"longer than {sch} characters", vpath)]

    return check


def _dialect_rx(pattern: str) -> "re.Pattern":
    """Compile a draft-4 ``pattern`` with JS-dialect spellings translated
    to Python ``re`` (reference src/v4/pattern.js:18 uses ``new RegExp``);
    dialect-divergent constructs raise at schema-compile time."""
    from schema_fantasy_spark.compiler.regex_dialect import (
        RegexDialectError,
        python_pattern,
    )

    try:
        return python_pattern(pattern)
    except RegexDialectError as e:
        raise SchemaCompileError(str(e)) from None


def _k_pattern(sch: Any) -> Validator:
    rx = _dialect_rx(sch)  # compiled once at plan time, JS spellings translated

    def check(v, vpath):
        if type_of(v) != "string" or rx.search(v):
            return []
        return [Err(SINGLE, "pattern", f"does not match /{sch}/", vpath)]

    return check


def _k_minItems(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "array" or len(v) >= sch:
            return []
        return [Err(SINGLE, "minItems", f"less than {sch} items", vpath)]

    return check


def _k_maxItems(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "array" or len(v) <= sch:
            return []
        return [Err(SINGLE, "maxItems", f"more than {sch} items", vpath)]

    return check


def _k_uniqueItems(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "array" or sch is False:
            return []
        n = len(v) - len(set(canonical(x) for x in v))
        if n == 0:
            return []
        msg = f"does not contain unique values: {n} duplicate{'' if n == 1 else 's'} found"
        return [Err(SINGLE, "uniqueItems", msg, vpath)]

    return check


def _k_minProperties(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "object" or len(v) >= sch:
            return []
        return [Err(SINGLE, "minProperties", f"less than {sch} properties", vpath)]

    return check


def _k_maxProperties(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "object" or len(v) <= sch:
            return []
        return [Err(SINGLE, "maxProperties", f"more than {sch} properties", vpath)]

    return check


def _k_required(sch: Any) -> Validator:
    def check(v, vpath):
        if type_of(v) != "object":
            return []
        # one error per missing key (reference src/v4/required.js:18-24
        # returns an array of Validations)
        return [
            Err(SINGLE, "required", f"missing {req}", vpath)
            for req in sch
            if req not in v
        ]

    return check


# ------------------------------------------------------- recursive keywords


def _k_properties(subs: List[Tuple[str, Validator]]) -> Validator:
    def check(v, vpath):
        if type_of(v) != "object":
            return []
        errs: List[Err] = []
        for key, sub in subs:
            if key in v:  # absent keys vacuously pass
                errs.extend(sub(v[key], vpath + (key,)))
        return errs

    return check


def _k_patternProperties(subs: List[Tuple[str, "re.Pattern", Validator]]) -> Validator:
    def check(v, vpath):
        if type_of(v) != "object":
            return []
        errs: List[Err] = []
        # cross-product schema-regex x value-keys, schema order outer
        # (reference src/v4/patternProperties.js:31 xprod)
        for _raw, rx, sub in subs:
            for key in v:
                if rx.search(key):
                    errs.extend(sub(v[key], vpath + (key,)))
        return errs

    return check


def _k_additionalProperties(
    sch: Any,
    sub: Optional[Validator],
    sibling_props: dict,
    sibling_patterns: List["re.Pattern"],
) -> Validator:
    def is_additional(key: str) -> bool:
        return key not in sibling_props and not any(rx.search(key) for rx in sibling_patterns)

    def check(v, vpath):
        if type_of(v) != "object" or sch is True:
            return []
        addprops = [k for k in v if is_additional(k)]
        if not addprops:
            return []
        if sch is False:
            msg = (
                f"additional propert{'y' if len(addprops) == 1 else 'ies'} found: "
                + human_list("and", addprops)
            )
            return [Err(SINGLE, "additionalProperties", msg, vpath)]
        # object schema: validate each additional prop via focusValue
        fail_props: List[str] = []
        child_errs: List[Err] = []
        for key in addprops:
            sub_errs = sub(v[key], vpath + (key,))
            if sub_errs:
                fail_props.append(key)
                child_errs.extend(sub_errs)
        if not fail_props:
            return []
        msg = (
            f"additional propert{'y' if len(fail_props) == 1 else 'ies'} invalid: "
            + human_list("and", fail_props)
        )
        return [Err(COMPOUND, "additionalProperties", msg, vpath, children=child_errs)]

    return check


def _k_items_homogeneous(sub: Validator) -> Validator:
    def check(v, vpath):
        if type_of(v) != "array":
            return []
        errs: List[Err] = []
        for i, item in enumerate(v):
            errs.extend(sub(item, vpath + (i,)))
        return errs

    return check


def _k_items_tuple(subs: List[Validator], add_sch: Any, add_sub: Optional[Validator]) -> Validator:
    def check(v, vpath):
        if type_of(v) != "array":
            return []
        errs: List[Err] = []
        for i, item in enumerate(v):
            if i < len(subs):
                errs.extend(subs[i](item, vpath + (i,)))
            elif isinstance(add_sch, bool):
                if not add_sch:
                    errs.append(Err(SINGLE, "items", "additional item found", vpath + (i,)))
            elif add_sub is not None:
                errs.extend(add_sub(item, vpath + (i,)))
        return errs

    return check


def _k_dependencies(deps: List[Tuple[str, Any, Optional[Validator]]]) -> Validator:
    def check(v, vpath):
        if type_of(v) != "object":
            return []
        errs: List[Err] = []
        for key, dep, sub in deps:
            if key not in v:
                continue
            if isinstance(dep, list):
                missing = [
                    Err(SINGLE, "dependencies", f'Missing "{d}" given "{key}"', vpath)
                    for d in dep
                    if d not in v
                ]
                if missing:
                    msg = (
                        f"Missing dependenc{'y ' if len(missing) == 1 else 'ies '}"
                        f'for "{key}"'
                    )
                    errs.append(Err(COMPOUND, "dependencies", msg, vpath, children=missing))
            elif sub is not None:
                sub_errs = sub(v, vpath)  # whole value re-validated, same vpath
                if sub_errs:
                    errs.append(
                        Err(
                            COMPOUND,
                            "dependencies",
                            f'Failed dependency for "{key}"',
                            vpath,
                            children=sub_errs,
                        )
                    )
        return errs

    return check


def _k_allOf(subs: List[Validator]) -> Validator:
    def check(v, vpath):
        all_errs: List[Err] = []
        for sub in subs:
            all_errs.extend(sub(v, vpath))
        if not all_errs:
            return []
        return [Err(COMPOUND, "allOf", "Not all conditions valid", vpath, children=all_errs)]

    return check


def _k_anyOf(subs: List[Validator]) -> Validator:
    def check(v, vpath):
        if not subs:  # vacuous truth branch (reference src/v4/anyOf.js:25)
            return []
        fail_errs: List[Err] = []
        n_fail = 0
        for sub in subs:
            errs = sub(v, vpath)
            if errs:
                n_fail += 1
                fail_errs.extend(errs)
        if n_fail < len(subs):
            return []
        return [Err(COMPOUND, "anyOf", "No conditions valid", vpath, children=fail_errs)]

    return check


def _k_oneOf(subs: List[Validator]) -> Validator:
    def check(v, vpath):
        fail_errs: List[Err] = []
        n_ok = 0
        for sub in subs:
            errs = sub(v, vpath)
            if errs:
                fail_errs.extend(errs)
            else:
                n_ok += 1
        if n_ok == 1:
            return []
        if n_ok == 0:
            return [Err(COMPOUND, "oneOf", "No conditions valid", vpath, children=fail_errs)]
        return [Err(SINGLE, "oneOf", "More than one condition valid", vpath)]

    return check


def _k_not(sub: Validator) -> Validator:
    def check(v, vpath):
        if sub(v, vpath):
            return []
        return [Err(SINGLE, "not", "condition valid", vpath)]

    return check


# ------------------------------------------------------------- the compiler

#: keywords that are never predicates (reference src/predicate.js:34-59 has
#: no entries; index.js:73 -> vacuous success). Everything not in
#: _KNOWN_KEYWORDS is likewise elided.
_NON_PREDICATES = {"default", "definitions", "format", "id", "$schema", "description", "title"}


class CompiledSchema:
    """A compiled constraint plan. ``validate(value)`` returns the
    accumulated error list (empty = valid), mirroring the reference's
    ``Validation`` applicative (index.js:60-62)."""

    def __init__(self, validator: Validator, schema: Any, refs: Dict[str, Any]):
        self._validator = validator
        self.schema = schema
        self.refs = refs

    def validate(self, value: Any) -> List[Err]:
        return self._validator(value, ())

    def is_valid(self, value: Any) -> bool:
        return not self._validator(value, ())


def compile_schema(
    schema: Any,
    refs: Optional[Dict[str, Any]] = None,
    base: str = "",
) -> CompiledSchema:
    """Compile ``schema`` (its $refs resolved against ``refs``) into a
    CompiledSchema. Raises CyclicRefError / UnknownResourceError /
    SchemaCompileError at plan time.
    """
    refs = refs or {}
    # memo supports self-recursive schemas (e.g. a tree schema whose
    # properties $ref back to itself): in-progress nodes get a forward
    # thunk resolved at first validation call.
    memo: Dict[Tuple[str, int], Optional[Validator]] = {}

    def compile_node(cur_base: str, cur_doc: Any, node: Any) -> Validator:
        cur_base, cur_doc, node = resolve_ref(refs, cur_base, cur_doc, node)
        if not isinstance(node, dict):
            # boolean/scalar schema: keysIn -> [] -> vacuous success
            return lambda v, vp: []
        key = (cur_base, id(node))
        if key in memo:
            cached = memo[key]
            if cached is not None:
                return cached

            def forward(v, vp, _key=key):
                return memo[_key](v, vp)  # resolved by the time it runs

            return forward
        memo[key] = None  # mark in-progress

        checks: List[Validator] = []
        for kw in node:  # schema key order = accumulation order
            sch = node[kw]
            try:
                built = _compile_keyword(kw, sch, node, cur_base, cur_doc, compile_node)
            except re.error as e:
                raise SchemaCompileError(f"bad regex in {kw!r}: {e}") from e
            if built is not None:
                checks.append(built)

        if len(checks) == 1:
            validator = checks[0]
        else:
            def validator(v, vp, _checks=tuple(checks)):
                errs: List[Err] = []
                for c in _checks:
                    errs.extend(c(v, vp))
                return errs

        memo[key] = validator
        return validator

    root = compile_node(base, schema, schema)
    return CompiledSchema(root, schema, refs)


def _compile_keyword(
    kw: str,
    sch: Any,
    node: dict,
    base: str,
    doc: Any,
    compile_node: Callable,
) -> Optional[Validator]:
    rec = lambda sub: compile_node(base, doc, sub)  # noqa: E731

    if kw == "type":
        return _k_type(sch)
    if kw == "enum":
        return _k_enum(sch)
    if kw == "minimum":
        return _k_minimum(sch, node)
    if kw == "maximum":
        return _k_maximum(sch, node)
    if kw == "multipleOf":
        return _k_multipleOf(sch)
    if kw == "minLength":
        return _k_minLength(sch)
    if kw == "maxLength":
        return _k_maxLength(sch)
    if kw == "pattern":
        return _k_pattern(sch)
    if kw == "minItems":
        return _k_minItems(sch)
    if kw == "maxItems":
        return _k_maxItems(sch)
    if kw == "uniqueItems":
        return _k_uniqueItems(sch)
    if kw == "minProperties":
        return _k_minProperties(sch)
    if kw == "maxProperties":
        return _k_maxProperties(sch)
    if kw == "required":
        return _k_required(sch)
    if kw == "properties":
        return _k_properties([(k, rec(s)) for k, s in sch.items()])
    if kw == "patternProperties":
        return _k_patternProperties(
            [(raw, _dialect_rx(raw), rec(s)) for raw, s in sch.items()]
        )
    if kw == "additionalProperties":
        sibling_props = node.get("properties") or {}
        sibling_patterns = [_dialect_rx(p) for p in (node.get("patternProperties") or {})]
        sub = rec(sch) if isinstance(sch, dict) else None
        return _k_additionalProperties(sch, sub, sibling_props, sibling_patterns)
    if kw == "items":
        if isinstance(sch, list):
            add_sch = node.get("additionalItems")
            add_sub = rec(add_sch) if isinstance(add_sch, dict) else None
            return _k_items_tuple([rec(s) for s in sch], add_sch, add_sub)
        if isinstance(sch, dict):
            return _k_items_homogeneous(rec(sch))
        return None
    if kw == "dependencies":
        deps = [
            (k, d, rec(d) if isinstance(d, dict) else None) for k, d in sch.items()
        ]
        return _k_dependencies(deps)
    if kw == "allOf":
        return _k_allOf([rec(s) for s in sch])
    if kw == "anyOf":
        return _k_anyOf([rec(s) for s in sch])
    if kw == "oneOf":
        return _k_oneOf([rec(s) for s in sch])
    if kw == "not":
        return _k_not(rec(sch))
    if kw == "$ref":
        # a node that is itself {"$ref": ...} was already resolved by
        # compile_node; a $ref alongside other keywords: draft-4 says
        # siblings are ignored, and the reference resolves the node to the
        # ref target entirely — compile_node handled it. Here $ref appears
        # as a plain key only if resolve_ref left it (cannot happen).
        return None
    # unknown keyword / non-predicate -> vacuous success (reference index.js:73)
    return None
