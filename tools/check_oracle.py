#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each <sfDir>/*.parquet as a DuckDB view, runs every query in
<verifyOutDir>/oracle_sql.json, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns,
and compares cell-by-cell (exact for non-floats; exact-then-tolerant
report for floats so near-misses are visible).
"""
import duckdb, glob, json, math, os, sys

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


# The driver hashes pandas values, so dtype families that pandas renders
# identically (int32 vs int64) are compatible — but HUGEINT converts to
# float64/object and WILL hash-mismatch a Spark BIGINT (round-1 failure
# mode: DuckDB sum(int) is HUGEINT; cast it ::BIGINT in the oracle SQL).
_INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}


def type_family(t):
    t = t.upper()
    if t in _INT_FAMILY:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t  # HUGEINT, DECIMAL(..), VARCHAR, DATE, TIMESTAMP..: exact


def duck_types(con, sql):
    """Column -> DuckDB type family, as the driver's hasher sees them."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: type_family(r[1]) for r in rows}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    # optional 3rd arg: comma-separated query names (local iteration,
    # pairs with Verify's SPARK_GRAFT_ONLY); absent = all, as the driver
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name in sorted(oracle):
        spark_glob = os.path.join(outdir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            failures += 1
            continue
        try:
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{spark_glob}')").df())
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
            failures += 1
            continue
        # Dtype-strict: the driver's hasher is type-sensitive, so a DuckDB
        # HUGEINT (e.g. sum(int)) vs Spark BIGINT drift must fail locally
        # too. Compare DuckDB's own type names on both sides.
        want_t = duck_types(con, oracle[name])
        got_t = duck_types(con, f"SELECT * FROM read_parquet('{spark_glob}')")
        drift = {c: (want_t[c], got_t[c]) for c in want_t
                 if c in got_t and want_t[c] != got_t[c]}
        if drift:
            print(f"FAIL {name}: dtype drift (oracle vs spark): {drift}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            failures += 1
            continue
        bad = []
        for col in want.columns:
            wv, gv = want[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if not cell_eq(a, b):
                    bad.append((col, i, a, b))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches, first: {bad[:3]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(want)} rows x {len(want.columns)} cols")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracle)} queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
