#!/usr/bin/env python3
"""Regenerates the OracleSql.Pins literals from a Verify dump.

The d2/m2/m3/m4 oracles are pin+verify: the pair/row membership is the
engine's deterministic output at sf0.01 (pinned in OracleSql.Pins), and
DuckDB re-computes every emitted value (Jaccard / cosine) from the raw
tables. After changing a hash kernel, LSH/IVF parameter, or threshold:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/gen_pins.py /tmp/verify_out

then paste the printed literals into OracleSql.Pins.
"""
import sys
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'

def pins(query, cols):
    df = duckdb.sql(query).df()
    return ", ".join("(%s)" % ", ".join(str(int(r[c])) for c in cols)
                     for _, r in df.iterrows())

print("d2Simhash:", pins(
    f"SELECT a, b FROM read_parquet('{out}/d2_simhash_neardup/*.parquet') ORDER BY a, b",
    ['a', 'b']))
print()
print("m2Lsh:", pins(
    f"SELECT qid, id, rk FROM read_parquet('{out}/m2_knn_lsh/*.parquet') ORDER BY qid, rk",
    ['qid', 'id', 'rk']))
print()
print("m4Ivf:", pins(
    f"SELECT qid, id, rk FROM read_parquet('{out}/m4_knn_ivf/*.parquet') ORDER BY qid, rk",
    ['qid', 'id', 'rk']))
print()
print("m3Cosine:", pins(
    f"SELECT a, b FROM read_parquet('{out}/m3_neardup_cosine/*.parquet') ORDER BY a, b",
    ['a', 'b']))
