#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
For each query in oracle_sql.json: run the SQL in DuckDB against the sf
tables, load the Spark parquet result, sort columns by name + rows by all
columns, and compare row count, schema (dtype kinds), and values.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(sqls.items()):
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = canon(duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        status = []
        if list(exp.columns) != list(got.columns):
            status.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
        elif len(exp) != len(got):
            status.append(f"rows exp={len(exp)} got={len(got)}")
        else:
            for c in exp.columns:
                e, g = exp[c], got[c]
                if e.dtype.kind != g.dtype.kind:
                    status.append(f"dtype[{c}] exp={e.dtype} got={g.dtype}")
                    continue
                if e.dtype.kind == 'f':
                    both_nan = e.isna() & g.isna()
                    neq = ~both_nan & (e != g)
                else:
                    neq = (e.astype(object) != g.astype(object)) & ~(e.isna() & g.isna())
                if neq.any():
                    i = int(np.argmax(neq.values))
                    status.append(f"val[{c}] row{i} exp={e.iloc[i]!r} got={g.iloc[i]!r} ({int(neq.sum())} diffs)")
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            fails += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
    # rows-only checks
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip('/').split('/')[-1]
        if name not in sqls:
            n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
            print(f"{'PASS' if n > 0 else 'WARN'} {name} (rows-only: {n} rows)")
    print(f"\n{fails} failures")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
