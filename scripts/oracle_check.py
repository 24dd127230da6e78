#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the same sf dir,
sort columns by name and rows by all columns, compare values.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    """Sort columns by name, then rows; stringify values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

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
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        gcols = [c[0] for c in got.description]
        grows = got.fetchall()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(grows)} rows")
            n_noora += 1
            continue
        try:
            exp = con.execute(oracles[name])
            ecols = [c[0] for c in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle error {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
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
