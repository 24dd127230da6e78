#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the same sf dir,
sort columns by name and rows by all columns, compare values.

Faithful to the driver's hash (round-1 lesson): the Spark side is read
with pandas/pyarrow (decimals stay `Decimal` objects — trailing zeros
preserved; BIGINT stays int64) while the oracle side comes from DuckDB's
`.df()` (DECIMAL and HUGEINT both become float64). Encoding each value
per-dtype therefore reproduces exactly the representation drift the
driver's hash sees ("43823.60" vs "43823.6", 99111 vs "99111.0") —
reading the Spark parquet through DuckDB, as this script used to, coerces
both sides identically and is blind to that whole failure class.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math, glob, decimal
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def enc(v):
    """Canonical per-type string encoding, mirroring str() over the
    driver's pandas representations."""
    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, decimal.Decimal):
        return str(v)  # keeps scale digits, incl. trailing zeros
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(enc(x) for x in v) + "]"
    if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return "None"
    return str(v)

def canon(df):
    """Sort columns by name, rows by encoded values."""
    cols = sorted(df.columns)
    rows = [tuple(enc(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noora = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        gdf = pd.read_parquet(glob.glob(f"{d}/*.parquet"))
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(gdf)} rows")
            n_noora += 1
            continue
        try:
            edf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle error {e}")
            n_fail += 1
            continue
        gc, gr = canon(gdf)
        ec, er = canon(edf)
        if gc != ec:
            print(f"  [FAIL-cols] {name}: spark={gc} duckdb={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            print(f"  [FAIL-rows] {name}: {len(gr)} vs {len(er)} rows")
            for a, b in list(zip(gr, er))[:200]:
                if a != b:
                    print(f"      spark : {a}\n      duckdb: {b}")
                    break
            if len(gr) != len(er):
                sg, se = set(gr), set(er)
                only_g = list(sg - se)[:2]
                only_e = list(se - sg)[:2]
                if only_g: print(f"      only-spark : {only_g}")
                if only_e: print(f"      only-duckdb: {only_e}")
        else:
            print(f"  [PASS     ] {name}: {len(gr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
