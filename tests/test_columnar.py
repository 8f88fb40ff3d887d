"""Columnar compiler tests: every keyword as Column expressions over typed
DataFrames, cross-checked for row-level equivalence against the pure-Python
kernel (the two modes must agree on (path, keyword) multisets)."""

import json

import pytest
from pyspark.sql import Row, functions as F, types as T

from schema_fantasy_spark.columnar import compile_columnar
from schema_fantasy_spark.compiler.plan import SchemaCompileError, compile_schema
from schema_fantasy_spark.engine import ValidationEngine

TYPED_SCHEMA = T.StructType([
    T.StructField("rid", T.LongType()),
    T.StructField("s", T.StringType()),
    T.StructField("n", T.DoubleType()),
    T.StructField("i", T.LongType()),
    T.StructField("b", T.BooleanType()),
    T.StructField("arr", T.ArrayType(T.LongType())),
    T.StructField("tup", T.ArrayType(T.StringType())),
    T.StructField("obj", T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("y", T.StringType()),
    ])),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
])

#: exercises all 23 keywords against the typed table
FULL_SCHEMA = {
    "type": "object",
    "required": ["rid", "s"],
    "minProperties": 2,
    "maxProperties": 9,
    "properties": {
        "s": {"type": "string", "minLength": 2, "maxLength": 8, "pattern": "^[a-z]"},
        "n": {"type": "number", "minimum": 0.5, "maximum": 100,
              "multipleOf": 0.25},
        "i": {"type": "integer", "minimum": 0, "exclusiveMinimum": True,
              "multipleOf": 3, "enum": [3, 6, 9, 12, 15, 18, 21]},
        "b": {"type": "boolean"},
        "arr": {"items": {"type": "integer", "minimum": 0},
                "minItems": 1, "maxItems": 4, "uniqueItems": True},
        "tup": {"items": [{"minLength": 2}, {"pattern": "^z"}],
                "additionalItems": {"maxLength": 3}},
        "obj": {"properties": {"x": {"minimum": 10}, "y": {"enum": ["a", "b"]}},
                "required": ["x"],
                "dependencies": {"y": ["x"]}},
        "m": {"minProperties": 1, "maxProperties": 3,
              "patternProperties": {"^k": {"maxLength": 2}}},
    },
    "allOf": [{"properties": {"i": {"maximum": 50}}}],
    "anyOf": [{"properties": {"n": {"minimum": 1}}},
              {"properties": {"s": {"minLength": 3}}}],
    "oneOf": [{"properties": {"i": {"maximum": 9}}},
              {"properties": {"i": {"minimum": 7}}}],
    "not": {"properties": {"s": {"enum": ["forbidden"]}}},
}


def _mk_rows(n_rows=840):
    """Deterministic corpus: coprime strides walk the full cross-product
    of value pools (lcm(6,5,8,2,6,7,5,9)=2520; 840 rows cover most
    pairwise combinations)."""
    s_pool = ["ab", "a", "toolongstring", "forbidden", "Xcaps", None]
    n_pool = [1.0, 0.3, 1.13, 250.0, None]
    i_pool = [3, 4, 7, 9, 21, 55, -3, None]
    b_pool = [True, None]
    arr_pool = [[1, 2], [], [1, 1], [-5, 3], [1, 2, 3, 4, 5], None]
    tup_pool = [["ab", "zx"], ["a", "nz", "toolong"], [], None, ["zz"], ["ab", "no", "x", "y"], ["ab", "zx", "okx"]]
    obj_pool = [Row(x=15, y="a"), Row(x=5, y="c"), Row(x=None, y="a"), None, Row(x=20, y=None)]
    m_pool = [{"k1": "ab"}, {"k1": "toolong", "other": "v"}, {},
              None, {"a": "x", "b": "y", "c": "z", "d": "w"},
              {"k2": "ok", "kxxxxx": "bad"}, {"zz": "q"}, {"k1": "ab", "k2": "cd"},
              {"k1": None}]
    rows = []
    for rid in range(n_rows):
        rows.append((
            rid,
            s_pool[rid % 6],
            n_pool[(rid * 3 + 1) % 5],
            i_pool[(rid * 5 + 2) % 8],
            b_pool[(rid * 7 + 1) % 2],
            arr_pool[(rid * 5 + 3) % 6],
            tup_pool[(rid * 2 + 1) % 7],
            obj_pool[(rid * 3 + 2) % 5],
            m_pool[(rid * 4 + 1) % 9],
        ))
    return rows


def _row_to_json_value(row: dict):
    """Struct NULL field ≡ absent property (dropped); a MAP entry with a
    NULL value is PRESENT with JSON null (maps have real key sets)."""
    def conv(v):
        if isinstance(v, Row):
            return {k: conv(x) for k, x in v.asDict().items() if x is not None}
        if isinstance(v, dict):  # MapType: keep null-valued entries
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        return v

    return {k: conv(v) for k, v in row.items() if v is not None}


def test_columnar_matches_python_kernel(spark):
    df = spark.createDataFrame(_mk_rows(), TYPED_SCHEMA)
    plan = compile_columnar(FULL_SCHEMA)
    got = {
        r["rid"]: sorted(("/".join(e["path"]), e["keyword"], e["depth"]) for e in r["errors"])
        for r in plan.apply(df).select("rid", "errors").collect()
    }
    kernel = compile_schema(FULL_SCHEMA)
    mismatches = []
    for raw in df.collect():
        d = raw.asDict(recursive=False)
        rid = d.pop("rid")
        value = _row_to_json_value(d)
        value["rid"] = rid
        want = sorted(
            ("/".join(str(p) for p in e.vpath), e.keyword, depth)
            for err in kernel.validate(value)
            for e, depth in [(x, dp) for x, dp in err.flatten()]
        )
        if got[rid] != want:
            mismatches.append((rid, value, got[rid], want))
    assert not mismatches, f"{len(mismatches)} rows disagree; first: {mismatches[0]}"


def test_pattern_properties_map_nonstring_values(spark):
    """patternProperties over map<string,long> must validate matched
    entries (round-1 advice: the StringType-valueType restriction
    silently passed invalid data in the columnar mode)."""
    schema = {"properties": {"m": {"patternProperties": {"^x": {"maximum": 10}}}}}
    df = spark.createDataFrame(
        [(0, {"x1": 999}), (1, {"x1": 5, "other": 999}), (2, {"x2": 11, "x3": 3}), (3, None)],
        T.StructType([
            T.StructField("rid", T.LongType()),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]),
    )
    plan = compile_columnar(schema)
    got = {
        r["rid"]: sorted(("/".join(e["path"]), e["keyword"]) for e in r["errors"])
        for r in plan.apply(df).select("rid", "errors").collect()
    }
    assert got[0] == [("m/x1", "maximum")]
    assert got[1] == []  # non-matching key not validated
    assert got[2] == [("m/x2", "maximum")]
    assert got[3] == []
    # cross-check the dynamic kernel agrees
    kernel = compile_schema(schema)
    for value, want in [({"m": {"x1": 999}}, got[0]), ({"m": {"x1": 5, "other": 999}}, got[1]),
                        ({"m": {"x2": 11, "x3": 3}}, got[2]), ({}, got[3])]:
        errs = sorted(
            ("/".join(str(p) for p in e.vpath), e.keyword)
            for err in kernel.validate(value)
            for e, _dp in err.flatten()
        )
        assert errs == want, value


def test_composite_enum_structural_equality(spark):
    """Composite enum values compare structurally, not as JSON text
    (round-1 advice: field order and 1 vs 1.0 caused false negatives)."""
    df = spark.createDataFrame(
        [(0, Row(b=1, a=2), [1.0], {"k": 1}),
         (1, Row(b=1, a=3), [2.5], {"k": 2}),
         (2, None, None, None)],
        T.StructType([
            T.StructField("rid", T.LongType()),
            T.StructField("o", T.StructType([
                T.StructField("b", T.LongType()), T.StructField("a", T.LongType())])),
            T.StructField("xs", T.ArrayType(T.DoubleType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]),
    )
    schema = {"properties": {
        "o": {"enum": [{"b": 1, "a": 2}]},       # field order differs from type's
        "xs": {"enum": [[1], [3.5]]},            # int literal vs double column
        "m": {"enum": [{"k": 1.0}]},             # map + float literal vs long value
    }}
    plan = compile_columnar(schema)
    got = {r["rid"]: sorted(e["path"][0] for e in r["errors"])
           for r in plan.apply(df).select("rid", "errors").collect()}
    assert got[0] == []          # all three match despite order/numeric repr
    assert got[1] == ["m", "o", "xs"]
    assert got[2] == []          # nulls vacuously pass
    # the dynamic kernel agrees
    kernel = compile_schema(schema)
    assert list(kernel.validate({"o": {"b": 1, "a": 2}, "xs": [1.0], "m": {"k": 1}})) == []
    assert len(list(kernel.validate({"o": {"b": 1, "a": 3}, "xs": [2.5], "m": {"k": 2}}))) == 3


def test_composite_enum_type_mismatch_never_matches(spark):
    """Literals not representable in the column type can match nothing:
    booleans are not numbers, strings are not numbers (R.equals parity)."""
    df = spark.createDataFrame([(1, True, "1")], "i: long, b: boolean, s: string")
    plan = compile_columnar({"properties": {
        "i": {"enum": [True, "1"]},   # neither matches a numeric 1
        "b": {"enum": [1]},           # number does not match true
        "s": {"enum": [1]},           # number does not match "1"
    }})
    errs = plan.apply(df).collect()[0]["errors"]
    assert sorted(e["path"][0] for e in errs) == ["b", "i", "s"]


def test_columnar_rejects_recursive_schema():
    rec = {"definitions": {"node": {"properties": {"kid": {"$ref": "#/definitions/node"}}}},
           "$ref": "#/definitions/node"}
    with pytest.raises(SchemaCompileError):
        compile_columnar(rec)


def test_columnar_accumulates_all_errors(spark):
    df = spark.createDataFrame([("zz",)], "s: string")
    plan = compile_columnar(
        {"properties": {"s": {"minLength": 5, "pattern": "^a", "enum": ["q"]}}}
    )
    errs = plan.apply(df).select("errors").collect()[0][0]
    assert sorted(e["keyword"] for e in errs) == ["enum", "minLength", "pattern"]


def test_columnar_additional_properties_static(spark):
    df = spark.createDataFrame([(1, "x")], "a: long, extra: string")
    plan = compile_columnar({"properties": {"a": {}}, "additionalProperties": False})
    errs = plan.apply(df).select("errors").collect()[0][0]
    assert len(errs) == 1
    assert errs[0]["message"] == "additional property found: extra"


def test_violations_and_partition_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "ok", "g1"), (2, None, "g1"), (3, "ok", "g2")], "id: long, v: string, g: string"
    )
    eng = ValidationEngine({"required": ["v"]})
    validated = eng.apply(df)
    viol = ValidationEngine.violations(validated, ["id"])
    assert [r["id"] for r in viol.collect()] == [2]
    pv = {r["g"]: (r["n_invalid"], r["pass"]) for r in
          ValidationEngine.partition_verdicts(validated, ["g"]).collect()}
    assert pv == {"g1": (1, False), "g2": (0, True)}


def test_whole_stage_codegen_in_plan(spark):
    """The columnar path must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes, and codegen must cover the project."""
    df = spark.createDataFrame([("a", 1.0)], "s: string, n: double")
    plan = compile_columnar(
        {"required": ["s"], "properties": {"s": {"minLength": 2}, "n": {"minimum": 0}}}
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.apply(df).explain("formatted")
    explained = buf.getvalue()
    assert "EvalPython" not in explained
    assert "codegen id" in explained  # whole-stage codegen covers the project


def test_nfc_lengths_option(spark):
    # decomposed "A" + COMBINING RING: 2 raw code points, 1 after NFC
    decomposed = "Å"
    df = spark.createDataFrame([(decomposed,)], "s: string")
    default_plan = compile_columnar({"properties": {"s": {"maxLength": 1}}})
    assert default_plan.apply(df).collect()[0]["verdict"] is False  # raw: 2 > 1
    nfc_plan = compile_columnar(
        {"properties": {"s": {"maxLength": 1}}}, nfc_lengths=True
    )
    assert nfc_plan.apply(df).collect()[0]["verdict"] is True  # NFC: 1 <= 1


def test_composite_enum_randomized_cross_check(spark):
    """Randomized (enum, value) combinations per column type: the columnar
    typed-literal equality must agree with the dynamic kernel row by row
    (seeded, deterministic). Covers numeric coercion, field order, maps,
    nesting, and non-representable literals."""
    import random

    rnd = random.Random(7)

    def nums():
        # ints and floats that collide (1 vs 1.0) plus non-integral floats
        return rnd.choice([0, 1, 2, 1.0, 2.0, 2.5, -1, -1.0])

    cases = []  # (col_ddl, spark_rows, json_values, enum_literals)

    # array<double>
    pool = [[nums() for _ in range(rnd.randrange(0, 3))] for _ in range(12)]
    cases.append((
        T.ArrayType(T.DoubleType()),
        [[float(x) for x in v] for v in pool],
        [list(v) for v in pool],
        rnd.sample(pool, 4) + [["x"], [True], [3.3]],
    ))
    # array<long> (non-integral float literals can match nothing)
    ipool = [[rnd.randrange(-2, 3) for _ in range(rnd.randrange(0, 3))] for _ in range(12)]
    cases.append((
        T.ArrayType(T.LongType()),
        [list(v) for v in ipool],
        [list(v) for v in ipool],
        rnd.sample(ipool, 3) + [[1.0, 2.0], [2.5], [1, "a"]],
    ))
    # struct<a:long, b:double> — literal dicts in shuffled field order
    spool = [{"a": rnd.randrange(0, 3), "b": float(rnd.choice([0, 1, 2.5]))} for _ in range(10)]
    cases.append((
        T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.DoubleType())]),
        [Row(a=v["a"], b=v["b"]) for v in spool],
        [dict(v) for v in spool],
        [{"b": v["b"], "a": v["a"]} for v in rnd.sample(spool, 3)]
        + [{"a": 0}, {"a": 0, "b": 0, "c": 1}, {"a": "x", "b": 1}],
    ))
    # map<string,long>
    mpool = [{k: rnd.randrange(0, 3) for k in rnd.sample("wxyz", rnd.randrange(0, 3))}
             for _ in range(10)]
    cases.append((
        T.MapType(T.StringType(), T.LongType()),
        [dict(v) for v in mpool],
        [dict(v) for v in mpool],
        rnd.sample(mpool, 3) + [{"w": 1.0}, {"v": 9}, {}],
    ))

    for dtype, spark_vals, json_vals, enum in cases:
        schema = {"properties": {"c": {"enum": enum}}}
        df = spark.createDataFrame(
            list(enumerate(spark_vals)),
            T.StructType([T.StructField("rid", T.LongType()), T.StructField("c", dtype)]),
        )
        plan = compile_columnar(schema)
        got = {r["rid"]: len(r["errors"]) == 0 for r in plan.apply(df).collect()}
        kernel = compile_schema(schema)
        for rid, v in enumerate(json_vals):
            want = not list(kernel.validate({"c": v}))
            assert got[rid] == want, (dtype.simpleString(), v, enum, got[rid], want)


def test_enum_out_of_range_literal_matches_nothing(spark):
    """ANSI trap: an enum literal outside the column type's range must
    simply never match — casting it would throw CAST_OVERFLOW and kill
    the job (round-2 review finding, reproduced live)."""
    df = spark.createDataFrame([(1, 5), (2, 7)], "rid: long, i: int")
    plan = compile_columnar({"properties": {"i": {"enum": [4294967296, 5, 1e30]}}})
    got = {r["rid"]: r["verdict"] for r in plan.apply(df).collect()}
    assert got == {1: True, 2: False}


def test_enum_on_date_and_timestamp_columns(spark):
    """Engine extension parity with minimum/maximum: string enum literals
    compare against typed date/timestamp columns (regression: the typed-
    literal rewrite initially made every non-null date fail)."""
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1)), (2, datetime.date(2025, 2, 2)), (3, None)],
        "rid: long, d: date",
    )
    plan = compile_columnar({"properties": {"d": {"enum": ["2024-01-01", "not-a-date"]}}})
    got = {r["rid"]: r["verdict"] for r in plan.apply(df).collect()}
    assert got == {1: True, 2: False, 3: True}


def test_enum_decimal_and_huge_float_literals(spark):
    """ANSI trap, part 2: out-of-range literals on DECIMAL columns and
    JSON ints beyond double range must match nothing, not throw."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, Decimal("5.25"))], "rid: long, m: decimal(10,2)"
    )
    plan = compile_columnar(
        {"properties": {"m": {"enum": [99999999999999999999, 5.25, 10 ** 400]}}}
    )
    assert plan.apply(df).collect()[0]["verdict"] is True
    plan2 = compile_columnar({"properties": {"m": {"enum": [99999999999999999999]}}})
    assert plan2.apply(df).collect()[0]["verdict"] is False
