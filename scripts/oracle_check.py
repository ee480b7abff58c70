#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Loads each Verify output parquet, runs the matching oracle SQL in DuckDB over
the sf tables, sorts columns by name and rows by all columns, and compares
values exactly (with a parallel tolerant float compare to distinguish
"float drift" from "wrong answer").

Usage: scripts/oracle_check.py [sfDir] [verifyOut]
"""
import json, math, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

# Minimum-row floor: a green compare on two EMPTY relations proves only
# 0 == 0 (the q100 lesson — its regex matched nothing in the synthetic
# corpus, so the extract/cast/agg path was never exercised on data).
# Any query whose oracle returns zero rows fails unless explicitly
# whitelisted here with a reason.
ZERO_ROW_OK = {
    # name: reason — add an entry ONLY for a query whose empty result is
    # itself the asserted behavior, never for convenience.
}

def rows_of(df):
    cols = sorted(df.columns)
    recs = df[cols].values.tolist()
    recs.sort(key=lambda r: [(x is None, str(x)) for x in r])
    return cols, recs

def dtype_family(dt):
    """Collapse a pandas/numpy dtype to the family the driver's
    hash-compare distinguishes: int vs float vs bool vs everything-else.
    DuckDB sum(BIGINT) -> HUGEINT arrives as float64 via pandas, which
    the driver hashes differently from Spark's int64 even when every
    value is numerically equal (the q315/q323 round-10 escape). Python
    == cannot see that; the family compare can."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"

def dtype_families(df):
    return {c: dtype_family(df[c].dtype) for c in df.columns}

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return eq(a, b)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        # HUGEINT lint: DuckDB widens sum(BIGINT) to HUGEINT; the driver
        # hashes that as float64 against Spark's int64 and fails even on
        # numerically identical values. Any HUGEINT reaching the final
        # SELECT is a bug in the oracle — cast it.
        desc = con.sql(f"DESCRIBE {sql}").fetchall()
        huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
        if huge:
            print(f"FAIL {name} [hugeint-lint]: oracle emits {huge} — "
                  f"CAST(... AS BIGINT) in the final SELECT")
            n_fail += 1
            continue
        spark_df = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        duck_df = con.sql(sql).df()
        sc, srows = rows_of(spark_df)
        dc, drows = rows_of(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        sfam, dfam = dtype_families(spark_df), dtype_families(duck_df)
        badfam = {c: (sfam[c], dfam[c]) for c in sc if sfam[c] != dfam[c]}
        if badfam:
            print(f"FAIL {name} [dtype]: column type families differ "
                  f"(spark, duck) = {badfam} — if a duck side is 'float' "
                  f"for an integer column, an uncast sum()/HUGEINT in the "
                  f"final SELECT is the usual cause: CAST(... AS BIGINT)")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        if len(drows) == 0 and name not in ZERO_ROW_OK:
            print(f"FAIL {name} [vacuous]: oracle returns 0 rows — the "
                  f"compare proves nothing; re-target the query at data "
                  f"that exists or whitelist it in ZERO_ROW_OK with a reason")
            n_fail += 1
            continue
        exact = all(all(eq(a, b) for a, b in zip(r1, r2))
                    for r1, r2 in zip(srows, drows))
        if exact:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            approx = all(all(close(a, b) for a, b in zip(r1, r2))
                         for r1, r2 in zip(srows, drows))
            bad = next((r1, r2) for r1, r2 in zip(srows, drows)
                       if not all(eq(a, b) for a, b in zip(r1, r2)))
            tag = "float-drift" if approx else "WRONG"
            print(f"FAIL {name} [{tag}]: first diff\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1

missing = [n for n in oracle if False]
print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)} oracled queries")
sys.exit(1 if n_fail else 0)
