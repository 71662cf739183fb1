"""Oracle-SQL result-type lint (driver-gate hygiene).

Two driver rounds were lost to the same class of bug: DuckDB widens bare
integer aggregates (``sum(x)`` → DECIMAL/HUGEINT) while Spark keeps
BIGINT, so the driver's type-tagged value hash mismatches even when every
value is numerically identical (round 1 ``sessionize``, round 3
``repetition``). This lint plans every ``oracle_sql()`` /
``twin_oracle_sql()`` statement against DuckDB at sf0.001 and fails if a
DECIMAL, HUGEINT, or UHUGEINT column reaches the FINAL projection — the
fix is always an explicit cast (``sum(x)::BIGINT AS ...``) in the oracle.

Planning only (``duckdb.sql`` is lazy): no query executes, so the whole
battery lints in seconds.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

WIDE = ("DECIMAL", "HUGEINT", "UHUGEINT")


def _all_oracles() -> dict[str, str]:
    oracles = dict(entry_mod.oracle_sql())
    oracles.update(entry_mod.twin_oracle_sql())
    return oracles


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"no testdata at {SF_DIR}")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(_all_oracles()))
def test_oracle_final_projection_has_no_wide_integer(con, name):
    sql = _all_oracles()[name]
    rel = con.sql(sql)  # plans only; nothing executes
    bad = [
        (c, str(t).upper())
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith(WIDE)
    ]
    assert not bad, (
        f"oracle {name!r} projects wide-integer column(s) {bad} — DuckDB"
        " widens bare integer aggregates; cast explicitly in the SQL"
        " (e.g. sum(x)::BIGINT AS alias) so the driver's type-tagged"
        " value hash matches Spark's BIGINT"
    )
