#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare: run each oracle SQL in DuckDB
over the sf tables, load the Spark parquet dump, sort columns by name,
compare schema + values (incl. row order)."""
import json, sys, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    dt_exp = [str(t) for t in exp.dtypes]
    dt_got = [str(t) for t in got.dtypes]
    if dt_exp != dt_got:
        print(f"WARN {name}: dtypes exp={dt_exp} got={dt_got}")
    # value compare (string-normalized, like a hash over rendered values)
    e_s = exp.astype(str)
    g_s = got.astype(str)
    if not e_s.equals(g_s):
        neq = (e_s != g_s).any(axis=1)
        print(f"FAIL {name}: {neq.sum()} mismatched rows; first:")
        print("  exp:", e_s[neq].head(2).to_dict("records"))
        print("  got:", g_s[neq].head(2).to_dict("records"))
        fails += 1
        continue
    print(f"PASS {name} ({len(exp)} rows)")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
