"""Corpus-hygiene ops (decontamination / repetition / collocations) vs
their DuckDB twins and vs brute-force Python at sf0.001."""

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def texts(spark):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def _words(text):
    import re

    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def test_contamination_matches_duckdb(spark, con):
    from information_retrieval_spark.ops.hygiene import (
        SQL_CONTAMINATION,
        q_contamination,
    )

    got = {(r.doc_id, r.n_probes_hit) for r in q_contamination(spark, SF).collect()}
    want = set(map(tuple, con.execute(SQL_CONTAMINATION).fetchall()))
    assert got == want


def test_contamination_matches_bruteforce(spark, texts):
    from information_retrieval_spark.ops.hygiene import (
        PROBE_MOD,
        PROBE_REM,
        PROBE_W,
        q_contamination,
    )

    def shingles(text):
        ws = _words(text)
        return {
            " ".join(ws[i : i + PROBE_W]) for i in range(len(ws) - PROBE_W + 1)
        }

    probes = set()
    for did, t in texts.items():
        if did % PROBE_MOD == PROBE_REM:
            probes |= shingles(t)
    want = {}
    for did, t in texts.items():
        if did % PROBE_MOD == PROBE_REM:
            continue
        n = len(shingles(t) & probes)
        if n:
            want[did] = n
    got = {r.doc_id: r.n_probes_hit for r in q_contamination(spark, SF).collect()}
    assert got == want


def test_repetition_matches_duckdb_and_bounds(spark, con, texts):
    from information_retrieval_spark.ops.hygiene import (
        SQL_REPETITION,
        q_repetition,
    )

    rows = q_repetition(spark, SF).collect()
    got = {(r.doc_id, r.n_bigrams, r.dup2_frac_r, r.top2_frac_r) for r in rows}
    want = set(map(tuple, con.execute(SQL_REPETITION).fetchall()))
    assert got == want
    # every doc with >=2 words appears; fractions live in [0, 1)/(0, 1]
    n_expected = sum(1 for t in texts.values() if len(_words(t)) >= 2)
    assert len(rows) == n_expected
    for r in rows:
        assert 0.0 <= r.dup2_frac_r < 1.0
        assert 0.0 < r.top2_frac_r <= 1.0
        # top bigram mass can't be below the duplicate-implied floor
        # (5e-7 slack: the column is rounded to 6 decimals)
        assert r.top2_frac_r >= 1.0 / r.n_bigrams - 5e-7


def test_collocations_matches_duckdb_and_pmi_formula(spark, con, texts):
    from information_retrieval_spark.ops.hygiene import (
        COLLOC_K,
        COLLOC_MIN_CNT,
        SQL_COLLOCATIONS,
        q_collocations,
    )

    rows = q_collocations(spark, SF).collect()
    got = [(r.rank, r.x, r.y, r.c2, r.pmi_r) for r in sorted(rows)]
    want = sorted(map(tuple, con.execute(SQL_COLLOCATIONS).fetchall()))
    assert got == want
    assert len(rows) <= COLLOC_K
    # recompute PMI for the top row by brute force
    uni, bg = {}, {}
    for t in texts.values():
        ws = _words(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    n1, n2 = sum(uni.values()), sum(bg.values())
    top = min(rows, key=lambda r: r.rank)
    assert bg[(top.x, top.y)] == top.c2 >= COLLOC_MIN_CNT
    pmi = math.log(
        (top.c2 / n2) / ((uni[top.x] / n1) * (uni[top.y] / n1))
    )
    assert abs(pmi - top.pmi_r) < 1e-6
    # ranks are deterministic: descending pmi with (x, y) tie-break
    srt = sorted(rows, key=lambda r: (-r.pmi_r, r.x, r.y))
    assert [r.rank for r in srt] == list(range(1, len(rows) + 1))
