#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares against the Spark dump row-by-row (rows and
columns sorted, floats compared exactly and with 1e-9 tolerance).
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

import re

# Types DuckDB can produce that Spark parquet can never emit. If an oracle's
# output schema contains one, the driver's typed hash CANNOT match (r4:
# sentence_split's windowed sum() typed HUGEINT while Spark wrote BIGINT —
# values identical, hash red). Fail such oracles outright at the gate.
SPARK_INEXPRESSIBLE = re.compile(r"\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT)\b")

def norm_type(t):
    # Normalize to the driver's observed equivalence classes: the driver
    # hash compares PYTHON VALUES, so SIGNED integer widths (INT32 vs
    # BIGINT) and DECIMAL-vs-DOUBLE hash equal (r3: rrf_fuse/token_count/
    # ... all passed with INTEGER vs BIGINT), while VARCHAR '1' vs BIGINT
    # 1 does NOT (r3: rake_keywords failed on exactly that). Collapse
    # signed numeric widths ONLY — HUGEINT and the unsigned family are
    # handled by SPARK_INEXPRESSIBLE above, never collapsed here.
    s = str(t)
    s = re.sub(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b", "INT", s)
    s = re.sub(r"\bDECIMAL\(\d+,\d+\)|\bFLOAT\b|\bDOUBLE\b", "NUM", s)
    return s

def canon(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return (sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)),
            [cols[i] for i in idx], [norm_type(types[i]) for i in idx])

def val_eq(a, b):
    # EXACT + TYPED comparison. The driver's hash compare is typed, so a
    # str()-based fallback here is a hole: VARCHAR '1' vs BIGINT 1 passed
    # the local gate for two rounds while the driver hash failed
    # (rake_keywords). Types are checked column-wise before values; here
    # we only compare values, with NO string coercion.
    from decimal import Decimal
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (float, Decimal)) or isinstance(b, (float, Decimal)):
        if not isinstance(a, (int, float, Decimal)) or \
           not isinstance(b, (int, float, Decimal)):
            return False
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, str) != isinstance(b, str):
        return False
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(val_eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols, gtypes = canon(got.fetchall(), got.columns, got.types)
            exp = con.sql(sql)
            raw_oracle_types = [str(t) for t in exp.types]
            erows, ecols, etypes = canon(exp.fetchall(), exp.columns, exp.types)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        bad_types = [f"{c}:{t}" for c, t in zip(exp.columns, raw_oracle_types)
                     if SPARK_INEXPRESSIBLE.search(t)]
        if bad_types:
            print(f"FAIL {name}: oracle emits Spark-inexpressible type(s) "
                  f"{bad_types} — add an explicit CAST in the oracle SQL")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        if gtypes != etypes:
            # Typed schema compare — the driver hashes VALUES WITH TYPES,
            # so a parquet VARCHAR vs oracle BIGINT must fail HERE, not
            # only on the driver. (Spark writes INT as INT32; DuckDB reads
            # it as INTEGER vs the oracle's cast — keep casts aligned.)
            print(f"FAIL {name}: dtypes spark={gtypes} oracle={etypes}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(grows, erows)):
            if not all(val_eq(a, b) for a, b in zip(gr, er)):
                bad = (i, gr, er)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracles:
            continue
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
