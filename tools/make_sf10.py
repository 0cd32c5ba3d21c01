#!/usr/bin/env python3
"""Generate a 100x (sf10) scale point for the DEDUP family's table —
`documents` at 500k rows — so the 100-TB scaling story for the
flagship family rests on TWO measured decades (sf0.1 -> sf1 -> sf10)
instead of one: one decade fits a line through anything; two decades
distinguish a law from a fit (r14 verdict, next-round #6).

Same construction as make_sf1.py's documents (replica 0 verbatim,
replicas 1..99 hash-shuffle the word order so every replica is a
DISTINCT document to the shingle families while vocabulary, token
counts and Zipf shape are preserved); every other table symlinks to
the sf1 fixture (the dedup queries this point exists for — q20 MinHash
clusters, q37 incremental CC, q339 paragraph dedup — read only
`documents`).

Deterministic, stdlib + duckdb only; driver-side dev tool, never an
engine dependency. Usage:
    python3 tools/make_sf10.py [/tmp/graft_sf10] [sf1_dir] [src_dir]
"""
import os
import sys

import duckdb

SRC = os.environ.get("GRAFT_SF10_SRC", "/root/testdata/sf0.1")
N_DOCS = 5000   # sf0.1 row count (asserted below)
REPS = 100


def main(out: str, sf1: str, src: str = SRC) -> None:
    assert os.path.exists(f"{src}/documents.parquet"), (
        f"source documents table missing under {src}")
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        link_src = f"{sf1}/{t}.parquet"
        assert os.path.exists(link_src), (
            f"sf1 fixture table missing: {link_src} -- run make_sf1.py "
            f"into {sf1} first (a dangling symlink would only fail later "
            "as a confusing read error)")
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(link_src, dst)

    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()[0]
    assert n_docs == N_DOCS, n_docs

    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{src}/documents.parquet'),
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

    # embeddings (r17): a REAL 100x point (200k vectors) instead of the sf1
    # symlink, so the ANN family (q33/q44/q76/q81/q82 read-back partial
    # oracles) certifies at the same deepest scale point as the dedup
    # family. Same construction as make_sf1.py's embeddings: replica 0
    # verbatim (query ids vec_id < 8 keep their exact vectors), replicas
    # 1..99 deterministically perturbed into DISTINCT vectors with the
    # family's sin-based delta.
    n_vecs = con.sql(
        f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
    assert n_vecs == 2000, n_vecs
    con.sql(f"""
      COPY (
        WITH base AS (SELECT * FROM '{src}/embeddings.parquet'),
        reps AS (SELECT unnest(range({REPS})) AS k),
        rep_vecs AS (
          SELECT b.vec_id + k * {n_vecs} AS vec_id, b.embedding,
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

    n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1",
         sys.argv[3] if len(sys.argv) > 3 else SRC)
