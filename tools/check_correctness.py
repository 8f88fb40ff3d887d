"""Local replica of the driver's correctness gate: run each queries()
entry on Spark at sf0.01 and its oracle_sql() on DuckDB over the same
parquet, compare row count + schema-width + order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb


def pd_isna(v):
    try:
        import pandas as pd

        r = pd.isna(v)
        return bool(r) if not hasattr(r, "__len__") else False
    except Exception:
        return v is None


def _coerce(v):
    if pd_isna(v):
        return None
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        return v.item()
    return v

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from schema_fantasy_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="correctness-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows")
            n_pass += 1
            continue
        try:
            res = con.sql(sql)
            ocols = [c.lower() for c in res.columns]
            # Fetch through pandas: HUGEINT (sum of BIGINT) and DECIMAL
            # degrade to float64 here, like they plausibly do in the
            # driver's canonicalizer. Queries must emit types that
            # survive this (BIGINT casts, decimal->double) — round 1's
            # four hash_match failures were exactly this class.
            odf = res.df()
            orows = [tuple(_coerce(v) for v in r) for r in odf.itertuples(index=False)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"valuehash spark={sh} oracle={oh}")
                so = sorted(
                    "|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                )
                oo = sorted(
                    "|".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                diff = [(a, b) for a, b in zip(so, oo) if a != b][:3]
                for a, b in diff:
                    problems.append(f"  spark : {a[:160]}")
                    problems.append(f"  oracle: {b[:160]}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("   " + p)
        else:
            n_pass += 1
            print(f"PASS {name}: {len(srows)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
