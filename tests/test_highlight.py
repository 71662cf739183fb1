"""Highlight markup (F13) — offsets from the positional index wrap the
matched terms in the ORIGINAL text (code tokenizer: positions are char
offsets, quirk Q4)."""

from information_retrieval_spark.query.engine import QuerySpec, SearchEngine
from information_retrieval_spark.query.highlight import (
    MARK_CLOSE,
    MARK_OPEN,
    apply_markup,
    highlight_results,
)


def test_apply_markup_basic():
    assert (
        apply_markup("a tokenizer here", [(2, 9)])
        == f"a {MARK_OPEN}tokenizer{MARK_CLOSE} here"
    )


def test_apply_markup_multiple_and_overlap_guard():
    out = apply_markup("xx yy xx", [(0, 2), (6, 2), (1, 2)])
    assert out == f"{MARK_OPEN}xx{MARK_CLOSE} yy {MARK_OPEN}xx{MARK_CLOSE}"


def test_highlight_results_marks_query_terms(spark, index_dir, corpus_df):
    eng = SearchEngine(spark, index_dir)
    q = QuerySpec(1, "tokenizer", "okapi25", 3, spell=False, match_mode="exact")
    res = eng.search([q])
    rows = highlight_results(
        spark, index_dir, res, corpus_df, ["tokenizer"],
        {"abstract": "content"},
    )
    assert rows
    for row in rows:
        assert f"{MARK_OPEN}tokenizer{MARK_CLOSE}" in row["abstract"]
        # markup only wraps, never alters, the underlying text
        assert (
            row["abstract"].replace(MARK_OPEN, "").replace(MARK_CLOSE, "")
            in {r.content for r in corpus_df.collect()}
        )
