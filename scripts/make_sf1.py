"""Synthesize a deterministic sf1.0 (10x sf0.1) testdata directory.

The driver ships sf{0.001,0.01,0.1}; the scale claims (LSH band cap,
merge-on-read, segment fan-in) deserve an empirical 10x point, so this
derives sf1.0 from sf0.1 by replicating each battery table 10 times with
shifted ids — a pure deterministic function of the driver data, no
external input:

* documents: doc_id + k*N; copy k > 0 appends a ' c<k>' marker token so
  copies are near- (not exact-) duplicates; n_chars recomputed.
* embeddings: vec_id + k*V; each copy's vectors get a tiny deterministic
  offset (+k*0.001) so cross-copy cosine mirrors stay near- not exact-dups.
* events: event_id/user_id shifted per copy (disjoint user populations →
  sessionization structure identical per copy).
* the TPC-H-ish tables are copied verbatim (no battery entry reads them;
  the oracle harness only needs the views to exist).

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/testdata/sf1.0)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1.0"
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

    n_vec = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT e.vec_id + k.k * {n_vec} AS vec_id,
         list_transform(e.embedding, x -> (x + k.k * 0.001)::FLOAT)
           AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e CROSS JOIN ks k
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

    n_ev, n_user = con.execute(
        f"SELECT count(*), max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()
    con.execute(f"""
COPY (
  SELECT e.event_id + k.k * {n_ev} AS event_id, e.ts,
         e.user_id + k.k * {n_user} AS user_id,
         e.event_type, e.value, e.props
  FROM '{SRC}/events.parquet' e CROSS JOIN ks k
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ("documents", "embeddings", "events"):
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()
        print(t, n[0])


if __name__ == "__main__":
    main()
