#!/usr/bin/env python3
"""Generate a 10x (sf1) scale point for the two tables the expensive
query families read — `documents` and `embeddings` — so the 100-TB
scaling story gets a MEASURED sf0.1 -> sf1 data point per family
instead of resting on plan audits alone (r12 verdict, next-round #6).

Layout: <out>/ gets symlinks to every sf0.1 table except documents/
embeddings, which are regenerated at 10x rows:
  - documents: replica 0 is the original corpus; replicas 1..9 keep
    (lang, source, n_chars) and the exact token multiset but
    hash-shuffle the word order, so replicas are DISTINCT documents to
    the shingle/near-dup families (replicating text verbatim would
    instead create a degenerate 10-member duplicate cluster per doc —
    a pathological, unrepresentative corpus). Vocabulary, token counts
    and Zipf shape are preserved by construction.
  - embeddings: replicas perturb each dimension with a deterministic
    sin-based jitter (direction changes, norms stay ~1), so ANN
    structures see 10x distinct points, not 10 copies per direction.
  - lineitem (the graph family's co-occurrence relation) also
    replicates 10x with offset order keys: 10x groups of the same
    composition, so the quadratic pairing stage — that family's
    documented cost driver — sees a true 10x input.
  - events (the sessionization/time-series family's stream) replicates
    10x with offset event ids and UNCHANGED users/timestamps: 10x
    event density per user-hour, so user-keyed windows see 10x-deep
    partitions and day/hour aggregates see 10x rows per bucket.

Deterministic (hash/sin of ids), stdlib + duckdb only; driver-side dev
tool, never an engine dependency. Usage:
    python3 tools/make_sf1.py [/tmp/graft_sf1]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
N_DOCS = 5000   # sf0.1 row counts (asserted below)
N_VECS = 2000
REPS = 10

def main(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "supplier", "part", "orders"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    # customer (the record-linkage family's file) replicates 10x with
    # offset keys, names regenerated from the new key (keeps the file's
    # name<->key bijection — name blocks stay discriminative), and a
    # per-replica 2-decimal balance shift (real files don't carry 10
    # systematically identical balances; keeps the eps-band blocks from
    # an artificial 10x hot-band). nation/segment stay: the q157
    # perturbation mix just lands on different key residues per replica.
    cust = f"{out}/customer.parquet"
    if os.path.islink(cust):
        os.unlink(cust)

    con = duckdb.connect()
    ckey_span = con.sql(
        f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'"
    ).fetchone()[0]
    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/customer.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k)
        SELECT b.* REPLACE (
          b.c_custkey + r.k * {ckey_span} AS c_custkey,
          'Customer#' || lpad((b.c_custkey + r.k * {ckey_span})::VARCHAR,
                              9, '0') AS c_name,
          round(b.c_acctbal + r.k * 17.77, 2) AS c_acctbal)
        FROM base b CROSS JOIN reps r
        ORDER BY c_custkey
      ) TO '{out}/customer.parquet' (FORMAT PARQUET)
    """)

    n_docs = con.sql(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    n_vecs = con.sql(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    assert n_docs == N_DOCS and n_vecs == N_VECS, (n_docs, n_vecs)

    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/documents.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k),
        rep_docs AS (
          SELECT b.doc_id + k * {N_DOCS} AS doc_id, b.text, b.lang,
                 b.source, b.n_chars, r.k
          FROM base b CROSS JOIN reps r)
        SELECT doc_id,
          CASE WHEN k = 0 OR text IS NULL THEN text ELSE
            array_to_string(list_transform(list_sort(list_transform(
              string_split(text, ' '),
              (w, i) -> struct_pack(
                h := hash(w || '|' || i::VARCHAR || '|' || doc_id::VARCHAR),
                w := w))), s -> s.w), ' ')
          END AS text,
          lang, source, n_chars
        FROM rep_docs
        ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)

    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/embeddings.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k),
        rep_vecs AS (
          SELECT b.vec_id + k * {N_VECS} AS vec_id, b.embedding,
                 b.label, r.k
          FROM base b CROSS JOIN reps r)
        SELECT vec_id,
          CASE WHEN k = 0 OR embedding IS NULL THEN embedding ELSE
            list_transform(embedding,
              (x, i) -> CAST(x + 0.015 * k *
                             sin(vec_id * 0.7 + i * 1.3) AS FLOAT))
          END AS embedding,
          label
        FROM rep_vecs
        ORDER BY vec_id
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)

    okey_span = con.sql(
        f"SELECT max(l_orderkey) + 1 FROM '{SRC}/lineitem.parquet'"
    ).fetchone()[0]
    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/lineitem.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k)
        SELECT b.* REPLACE (b.l_orderkey + r.k * {okey_span} AS l_orderkey)
        FROM base b CROSS JOIN reps r
        ORDER BY l_orderkey
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)

    ekey_span = con.sql(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{SRC}/events.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k)
        SELECT b.* REPLACE (b.event_id + r.k * {ekey_span} AS event_id)
        FROM base b CROSS JOIN reps r
        ORDER BY event_id
      ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)

    for t in ("customer", "documents", "embeddings", "lineitem", "events"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1")
