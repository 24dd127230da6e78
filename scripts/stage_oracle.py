#!/usr/bin/env python3
"""Staged pipeline-capstone verification — the sf1 scale-oracle path.

graft.StageDump materializes each pipeline stage's output parquet plus
stage_oracle_sql.json (one DuckDB query per stage, `{OUT}` placeholder
for the dump dir). This script re-derives every stage from its INPUT
parquet + the source tables and hash-compares against the Spark
artifact, using the exact canon/enc comparison of oracle_check.py —
so a composition bug between stages cannot hide, and DuckDB never has
to hold more than one stage's working set (the monolithic sf1 replay
exceeded 54 GB of temp; each stage alone fits).

Usage: python3 scripts/stage_oracle.py <sfDir> <stageDumpDir> [only,...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import canon, TABLES  # same comparison, one definition


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/stage_oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    # deterministic order: e2e stages, then spans, then semantic
    for name in sorted(oracles):
        if only and name not in only:
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"  [FAIL-miss] {name}: no Spark stage dump at {d}")
            n_fail += 1
            continue
        gdf = pd.read_parquet(glob.glob(f"{d}/*.parquet"))
        sql = oracles[name].replace("{OUT}", out_dir)
        try:
            edf = con.execute(sql).df()
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
                og, oe = list(sg - se)[:2], list(se - sg)[:2]
                if og: print(f"      only-spark : {og}")
                if oe: print(f"      only-duckdb: {oe}")
        else:
            print(f"  [PASS     ] {name}: {len(gr)} rows")
            n_pass += 1
    print(f"== stages: {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
