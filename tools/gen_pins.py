#!/usr/bin/env python3
"""Regenerates the OracleSql.Pins literals from a Verify dump.

The m2/m4 ANN oracles are pin+verify: the row membership is the engine's
deterministic output at sf0.01 (pinned in OracleSql.Pins), and DuckDB
re-computes every emitted cosine from the raw tables (plus the m5 recall
oracle scoring the same memberships against exact ground truth). After
changing a hash kernel, LSH/IVF parameter, or threshold:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/gen_pins.py /tmp/verify_out

then paste the printed literals into OracleSql.Pins.

d2/m3 no longer need pins: their oracles are exhaustive all-pairs twins
(the query-level blocking is recall-complete at sf0.01).
"""
import sys
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'

def pins(query, cols):
    df = duckdb.sql(query).df()
    return ", ".join("(%s)" % ", ".join(str(int(r[c])) for c in cols)
                     for _, r in df.iterrows())

print("m2Lsh:", pins(
    f"SELECT qid, id, rk FROM read_parquet('{out}/m2_knn_lsh/*.parquet') ORDER BY qid, rk",
    ['qid', 'id', 'rk']))
print()
print("m4Ivf:", pins(
    f"SELECT qid, id, rk FROM read_parquet('{out}/m4_knn_ivf/*.parquet') ORDER BY qid, rk",
    ['qid', 'id', 'rk']))
