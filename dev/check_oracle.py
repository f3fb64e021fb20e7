#!/usr/bin/env python3
"""Dev harness: mimic the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet (Spark result), runs the matching oracle
SQL from <out>/oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name, and compares row-by-row values + schema.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    skip = set(os.environ.get("GRAFT_SKIP", "").split(","))
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name} (GRAFT_SKIP)"); continue
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1
            continue
        dt_mismatch = [(c, str(got[c].dtype), str(want[c].dtype))
                       for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        # value compare on stringified frames (hash-equivalent)
        gs = got.astype(str).reset_index(drop=True)
        ws = want.astype(str).reset_index(drop=True)
        neq = (gs != ws).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            bad_cols = [c for c in gs.columns if gs.at[i, c] != ws.at[i, c]]
            print(f"FAIL {name}: first diff row {i} cols {bad_cols}")
            print("  spark:", {c: gs.at[i, c] for c in bad_cols})
            print("  duck :", {c: ws.at[i, c] for c in bad_cols})
            n_fail += 1
        elif dt_mismatch:
            print(f"WARN {name}: values match, dtype diff {dt_mismatch}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracle)}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
