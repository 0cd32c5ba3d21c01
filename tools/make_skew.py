#!/usr/bin/env python3
"""Generate a SKEWED fixture so the engine's skew machinery gets measured
under actual skew instead of only being priced for it (r13 verdict,
next-round #4: TPC-H is uniform and the corpus vocabulary is 31 tokens,
so saltedJoin, the degree-oriented triangle core, and the exact-dup
collapse in LSH dedup were plan-audited but never exercised by data).

Layout: <out>/ symlinks every base table except the three skew carriers:

  - events  (q51 saltedJoin's probe side): replicated 10x with offset
    event ids (the make_sf1 recipe — skew only matters at a scale where
    one straggler task is measurable), then ~30% of all rows remapped to
    ONE hot user_id. An unsalted shuffle would put ~300k of ~1M rows in
    a single reducer; 8-way salting bounds any reducer at ~37k.
    Before/after = q51 on /tmp/graft_sf1 (same 10x scale, uniform keys)
    vs q51 here.

  - lineitem (q155/q307's co-occurrence relation): base-scale rows plus
    ONE extra hub-supplier line per order — the hub co-occurs with every
    supplier, giving the co-occurrence graph a single max-degree node
    (the power-law hub the Chiba-Nishizeki orientation exists for). A
    node-id wedge orientation would center O(deg_hub^2) wedges on a
    low-id hub; the (degree, id) orientation centers ~none on it.
    Before/after = q155 on /root/testdata/sf0.1 vs here.

  - documents (q20/q37's corpus): base-scale, with doc_id < 800 all
    carrying ONE identical boilerplate text — the web-crawl template
    cluster. Without the exact-dup-collapse-before-LSH guard the cluster
    puts 800 rows in every band bucket (C(800,2) = 319,600 candidate
    pairs through the exact-Jaccard verifier); with it, ONE
    representative rides the LSH and member pairs are restored
    arithmetically. Before/after = q20/q37 on /root/testdata/sf0.1 vs
    here. (The OUTPUT of q20 inherently contains the 319,600 member
    pairs — output size, not candidate-generation size, is the
    irreducible part.)

Deterministic, stdlib + duckdb only; driver-side dev tool, never an
engine dependency. Usage:
    python3 tools/make_skew.py [/tmp/graft_skew]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10          # events scale factor (matches make_sf1)
HOT_USER = 7       # existing user_id / c_custkey — the hot join key
HOT_SHARE = 10     # event_id % 10 < 3  →  ~30% of rows on the hot key
HUB_SUPP = 1       # supplier planted into every order
DUP_DOCS = 800     # doc_id < 800 share one boilerplate text

BOILERPLATE = (
    "all rights reserved this page uses cookies to improve your "
    "experience by continuing you accept the terms of service and the "
    "privacy policy contact the site administrator for questions about "
    "this notice copyright the operator all rights reserved this notice "
    "applies to every page of this site")


def main(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "embeddings"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)

    con = duckdb.connect()

    # events: 10x replicas (offset ids), then the hot-key remap. The remap
    # keys off the REPLICATED event id, so hot rows land in every replica.
    ekey_span = con.sql(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/events.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k),
        rep AS (
          SELECT b.* REPLACE (b.event_id + r.k * {ekey_span} AS event_id)
          FROM base b CROSS JOIN reps r)
        SELECT * REPLACE (
          CASE WHEN user_id IS NOT NULL AND event_id % {HOT_SHARE} < 3
               THEN {HOT_USER} ELSE user_id END AS user_id)
        FROM rep ORDER BY event_id
      ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)

    # lineitem: base rows + one hub-supplier line per order (linenumber 0
    # keeps the (orderkey, linenumber) key unique; other columns copied
    # from the order's first line so types/stats stay in-family)
    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/lineitem.parquet'),
        hub AS (
          SELECT * REPLACE (CAST({HUB_SUPP} AS BIGINT) AS l_suppkey,
                            CAST(0 AS BIGINT) AS l_linenumber)
          FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                             ORDER BY l_linenumber) AS rn
                FROM base) WHERE rn = 1)
        SELECT * EXCLUDE (rn) FROM (
          SELECT *, CAST(NULL AS BIGINT) AS rn FROM base
          UNION ALL BY NAME
          SELECT * FROM hub)
        ORDER BY l_orderkey, l_linenumber
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)

    # documents: the boilerplate cluster, plus (r17) a HOT CENSUS GROUP —
    # 40% of all docs remapped to one (lang, source) class so the
    # standing-census family (q356/q358/q359/q366) gets measured under a
    # hot-group split: the parity partials each carry ~half of one
    # dominant class, and the merge law must hold (and stay flat) when
    # one group is ~20x the uniform class size instead of 1x.
    con.sql(f"""
      COPY (
        SELECT * REPLACE (
          CASE WHEN doc_id < {DUP_DOCS} THEN '{BOILERPLATE}'
               ELSE text END AS text,
          CASE WHEN doc_id % 5 < 2 THEN 'en' ELSE lang END AS lang,
          CASE WHEN doc_id % 5 < 2 THEN 'src0' ELSE source END AS source)
        FROM '{SRC}/documents.parquet'
        ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)

    for t in ("events", "lineitem", "documents"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    hot = con.sql(f"""SELECT count(*) FROM '{out}/events.parquet'
                      WHERE user_id = {HOT_USER}""").fetchone()[0]
    print(f"hot-key rows: {hot}")

    # Wedge-orientation counterfactual on the skewed co-occurrence graph:
    # wedges = Sum over oriented centers x of C(outdeg(x), 2). This is the
    # size of e1 JOIN e2 in triangleCountsSimple — counted for BOTH
    # orientations, it is the measured proof of what the (degree, id)
    # orientation saves on a hub without needing a build of the retired
    # node-id variant.
    wedges = con.sql(f"""
      WITH li AS (SELECT l_orderkey, l_suppkey
                  FROM '{out}/lineitem.parquet'),
      co AS (
        SELECT a.l_suppkey AS u, b.l_suppkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2 HAVING count(*) >= 6),
      deg AS (
        SELECT n, count(*) AS d FROM (
          SELECT u AS n FROM co UNION ALL SELECT v FROM co)
        GROUP BY n),
      ed AS (
        SELECT co.u, co.v, du.d AS du, dv.d AS dv
        FROM co JOIN deg du ON du.n = co.u JOIN deg dv ON dv.n = co.v),
      outdeg_id AS (
        SELECT u AS x, count(*) AS od FROM ed GROUP BY u),
      outdeg_deg AS (
        SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END
                 AS x,
               count(*) AS od
        FROM ed GROUP BY 1)
      SELECT
        (SELECT sum(od * (od - 1) / 2) FROM outdeg_id)  AS wedges_id_orient,
        (SELECT sum(od * (od - 1) / 2) FROM outdeg_deg) AS wedges_deg_orient,
        (SELECT count(*) FROM co) AS n_edges,
        (SELECT max(d) FROM deg) AS max_degree
    """).df()
    print(wedges.to_string(index=False))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_skew")
