"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` twin on DuckDB, compare row count, sorted column names and
order-insensitive values. Usage::

    python scripts/verify_entry.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from information_retrieval_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    # Type-tagged like the driver's value hasher: a bit-identical value in
    # the wrong type (e.g. DuckDB decimal128 from a bare sum() vs Spark
    # int64) must FAIL here, not first in CORRECTNESS_r{N}.json.
    import decimal

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, bool):
                tag = "b"
            elif isinstance(v, int):
                tag = "i"
            elif isinstance(v, float):
                tag = "f"
                v = "nan" if math.isnan(v) else f"{v:.9g}"
            elif isinstance(v, decimal.Decimal):
                tag = "dec"
            elif v is None:
                tag = "n"
            else:
                tag = type(v).__name__[0]
            vals.append(f"{tag}:{v}")
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark("verify_entry")
    qs = dict(entry_mod.queries())
    oracles = dict(entry_mod.oracle_sql())
    # twins are not in the driver's 50-entry window but get the same
    # value-level verification here and in the sf1.0 battery
    qs.update(entry_mod.twin_queries())
    oracles.update(entry_mod.twin_oracle_sql())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            failures.append(name)
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(srows)} rows, values match")
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
