#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev-loop only; the
driver runs its own copy). Usage:
  python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
Reads each <name>/ parquet written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB over views named after the testdata tables,
sorts columns by name and rows by all columns, and value-compares."""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sort/compare across dtypes
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return s.loc[order].reset_index(drop=True)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISS  {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ERR   {name}: {e}"); n_bad += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA {name}: spark={list(g.columns)} oracle={list(w.columns)}")
            n_bad += 1; continue
        if len(g) != len(w):
            print(f"ROWS  {name}: spark={len(g)} oracle={len(w)}"); n_bad += 1; continue
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            i = diff.idxmax()
            print(f"VALS  {name}: first diff at row {i}:\n  spark={g.loc[i].to_dict()}\n  oracle={w.loc[i].to_dict()}")
            n_bad += 1; continue
        print(f"OK    {name} ({len(g)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
