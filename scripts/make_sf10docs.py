"""Synthesize the 500k-doc "sf10docs" testdata directory: a deterministic
100-copy documents-only derivation of sf0.1 (the corpus the round-4 grep
crossover was measured on, now committed so the index-backed battery can
run at that scale reproducibly).

* documents: doc_id + k*N for k in 0..99; copy k > 0 appends a ' c<k>'
  marker token (near- not exact-duplicates); n_chars recomputed; lang and
  source carried through so category-filtered entries work unchanged.
* every other battery table is copied verbatim — the index-backed entries
  read only documents, and the DuckDB oracle harness just needs the views
  to exist.

Usage: python scripts/make_sf10docs.py [out_dir]
       (default /tmp/testdata/sf10docs)
Then:  SPARK_GRAFT_SF_DIR=/tmp/testdata/sf10docs \
         python scripts/verify_entry.py wand_topk wand_filtered ...
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 100
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf10docs"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ks AS SELECT unnest(range({COPIES})) AS k")
    n_docs = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT d.doc_id + k.k * {n_docs} AS doc_id,
         CASE WHEN k.k = 0 THEN d.text ELSE d.text || ' c' || k.k END AS text,
         d.lang, d.source,
         length(CASE WHEN k.k = 0 THEN d.text
                     ELSE d.text || ' c' || k.k END)::BIGINT AS n_chars
  FROM '{SRC}/documents.parquet' d CROSS JOIN ks k
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
    for t in TABLES:
        if t == "documents":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    n = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet'"
    ).fetchone()[0]
    print(f"{out}: {n:,} documents ({COPIES}x {n_docs:,})")


if __name__ == "__main__":
    main()
