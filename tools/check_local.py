#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_local.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<query>/ parquet dump produced by `graft.Verify`,
runs the matching SQL from <out_dir>/oracle_sql.json in DuckDB over the
<sf_dir> tables, and compares rows / schema (column names sorted) / values.
Dev tool only — the engine itself has no Python dependency.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # exact compare, incl. float bits — the driver hashes raw values
    df = df[sorted(df.columns)]
    return [tuple(repr(x) for x in row) for row in df.itertuples(index=False)]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"{name}: NO_ORACLE ({len(spark_df)} rows)")
            continue
        ora_df = con.sql(oracle[name]).df()
        rows_ok = len(spark_df) == len(ora_df)
        schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
        vals_ok = rows_ok and schema_ok and norm(spark_df) == norm(ora_df)
        status = "PASS" if (rows_ok and schema_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
            print(f"{name}: FAIL rows={len(spark_df)}/{len(ora_df)} "
                  f"schema={schema_ok} vals={vals_ok}")
            if schema_ok and rows_ok:
                a, b = norm(spark_df), norm(ora_df)
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"  first diff row {i}: spark={x} oracle={y}")
                        break
            else:
                print(f"  spark cols={sorted(spark_df.columns)}")
                print(f"  oracle cols={sorted(ora_df.columns)}")
        else:
            print(f"{name}: PASS ({len(spark_df)} rows)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
