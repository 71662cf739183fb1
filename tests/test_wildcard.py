"""Wildcard ranked search: DuckDB twin identity, expansion semantics,
and equivalence to an explicit multi-term BM25 query.

Runs at sf0.01 (not the usual sf0.001): at 50 docs the corpus-relative
top-20 stop list swallows most of the tiny vocabulary, so every wildcard
pattern would expand to nothing."""

import re
from fnmatch import fnmatchcase

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


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


def _like(term: str, pat: str) -> bool:
    return fnmatchcase(term, pat.replace("%", "*"))


def test_wildcard_matches_duckdb(spark, con):
    from information_retrieval_spark.ops.ir_direct import (
        SQL_WILDCARD_TOPK,
        q_wildcard_topk,
    )

    got = {
        (r.query_id, r.rank, r.doc_id, f"{r.score_r:.9g}")
        for r in q_wildcard_topk(spark, SF).collect()
    }
    want = {
        (a, b, c, f"{d:.9g}")
        for a, b, c, d in con.execute(SQL_WILDCARD_TOPK).fetchall()
    }
    assert got == want
    assert got, "wildcard patterns should match fixture vocabulary"


def test_wildcard_hits_contain_matching_term(spark, texts):
    """Every returned doc must contain at least one non-stop term matching
    its query's pattern (OR-expansion candidate semantics)."""
    from information_retrieval_spark.ops.ir_direct import (
        STOP_K,
        WILDCARD_QUERY_SET,
        q_wildcard_topk,
    )

    counts = {}
    for t in texts.values():
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    stop = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :STOP_K
        ]
    }
    pats = dict(WILDCARD_QUERY_SET)
    for r in q_wildcard_topk(spark, SF).collect():
        words = {
            w
            for w in re.split(r"[^a-z0-9]+", texts[r.doc_id].lower())
            if w and w not in stop
        }
        assert any(_like(w, pats[r.query_id]) for w in words), r


def test_wildcard_equals_explicit_expansion(spark, texts):
    """Expanding a pattern by hand and scoring it as an explicit weight-1
    multi-term query must give the identical ranking (the multi-term
    rewrite is pure sugar over the BM25 machinery)."""
    from pyspark.sql import functions as F

    from information_retrieval_spark.ops.ir_direct import (
        STOP_K,
        WILDCARD_QUERY_SET,
        _bm25_topk,
        q_wildcard_topk,
    )

    counts = {}
    for t in texts.values():
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    stop = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :STOP_K
        ]
    }
    vocab = sorted(set(counts) - stop)
    rows = [
        (qid, term, 1)
        for qid, pat in WILDCARD_QUERY_SET
        for term in vocab
        if _like(term, pat)
    ]
    assert rows

    def explicit(tf):
        return F.broadcast(
            tf.sparkSession.createDataFrame(
                rows, "query_id int, qterm string, mult int"
            )
        )

    got = {
        (r.query_id, r.rank, r.doc_id, f"{r.score_r:.9g}")
        for r in q_wildcard_topk(spark, SF).collect()
    }
    want = {
        (r.query_id, r.rank, r.doc_id, f"{r.score_r:.9g}")
        for r in _bm25_topk(spark, SF, None, qterms_fn=explicit).collect()
    }
    assert got == want
