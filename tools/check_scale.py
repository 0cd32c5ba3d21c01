#!/usr/bin/env python3
"""Scale-point correctness certification: check_local.py's exact compare,
plus a per-oracle wall-clock budget so an oracle that is brute-force
quadratic in DuckDB (fine at sf0.01, hours at sf1) records TIMEOUT
instead of wedging the run. The SPARK side has already completed by the
time this runs — a TIMEOUT is a statement about the ORACLE's cost, not
about the engine under test; timed-out queries are certified at the
smaller scale factors only.

Usage: python3 tools/check_scale.py <verify_out_dir> <sf_dir> [timeout_sec]
Dev tool only — the engine has no Python dependency.
"""
import sys, json, glob, os, time
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    return [tuple(repr(x) for x in row) for row in df.itertuples(index=False)]


def check_one(out_dir, sf_dir, name, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        ora_df = con.sql(sql).df()
    except Exception as e:
        q.put((name, "ERR", str(e)[:200]))
        return
    rows_ok = len(spark_df) == len(ora_df)
    schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
    vals_ok = rows_ok and schema_ok and norm(spark_df) == norm(ora_df)
    if rows_ok and schema_ok and vals_ok:
        q.put((name, "PASS", f"{len(spark_df)} rows"))
        return
    detail = f"rows={len(spark_df)}/{len(ora_df)} schema={schema_ok}"
    if schema_ok and rows_ok:
        a, b = norm(spark_df), norm(ora_df)
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                detail += f" first_diff_row={i} spark={x} oracle={y}"
                break
    q.put((name, "FAIL", detail[:500]))


def main(out_dir, sf_dir, timeout):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        if name not in oracle:
            results[name] = ("NO_ORACLE", "")
            print(f"{name}: NO_ORACLE")
            continue
        q = mp.Queue()
        proc = mp.Process(target=check_one,
                          args=(out_dir, sf_dir, name, oracle[name], q))
        t0 = time.time()
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.terminate()
            proc.join()
            results[name] = ("TIMEOUT", f"oracle >{timeout}s in duckdb")
            print(f"{name}: TIMEOUT (oracle >{timeout}s)", flush=True)
            continue
        status, detail = (q.get() if not q.empty() else
                          (name, "ERR", "worker died"))[1:]
        results[name] = (status, detail)
        print(f"{name}: {status} {detail} ({time.time()-t0:.1f}s)",
              flush=True)
    n = {}
    for s, _ in results.values():
        n[s] = n.get(s, 0) + 1
    print("SUMMARY:", json.dumps(n))
    sys.exit(0 if n.get("FAIL", 0) + n.get("ERR", 0) == 0 else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 120)
