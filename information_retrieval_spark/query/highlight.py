"""Match highlighting (F13, `ui/backend/mir/search/common.py:158-170`).

The reference inserts markup around the stored character offsets of matched
query terms in the final k result rows. Positions here come from the
``postings_flat.positions`` arrays (offset sets, quirk Q4) — a tiny
broadcast-join lookup for the k result docs, then pure-Python markup on the
driver (k rows; the reference does exactly this driver-side).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MARK_OPEN = "<mark>"
MARK_CLOSE = "</mark>"


def match_offsets(
    spark: SparkSession,
    index_dir: str,
    results: DataFrame,
    qterms: list[str],
) -> DataFrame:
    """(doc_id, section, term, positions) for the result docs × query terms.
    Pushed-filter scan on the term-sorted postings table + broadcast semi
    join against the (tiny) result set."""
    from information_retrieval_spark.index.catalog import read_table

    postings = read_table(spark, index_dir, "postings_flat")
    docs = results.select("doc_id").distinct()
    return (
        postings.filter(F.col("term").isin(list(qterms)))
        .join(F.broadcast(docs), "doc_id")
        .select("doc_id", "section", "term", "positions")
    )


def apply_markup(text: str, offsets: list[tuple[int, int]]) -> str:
    """Insert markup around (offset, length) spans; spans must not overlap
    (offsets are distinct token starts)."""
    out = []
    last = 0
    for off, ln in sorted(offsets):
        if off < last:
            continue  # defensive: skip overlapping span
        out.append(text[last:off])
        out.append(MARK_OPEN + text[off : off + ln] + MARK_CLOSE)
        last = off + ln
    out.append(text[last:])
    return "".join(out)


def highlight_results(
    spark: SparkSession,
    index_dir: str,
    results: DataFrame,
    corpus: DataFrame,
    qterms: list[str],
    section_cols: dict[str, str],
) -> list[dict]:
    """Driver-side markup of the final k rows: returns
    [{query_id, rank, doc_id, <section>: marked_text, ...}]."""
    res_rows = results.collect()
    doc_ids = {r.doc_id for r in res_rows}
    offs = match_offsets(spark, index_dir, results, qterms).collect()
    by_doc: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for r in offs:
        for p in r.positions:
            by_doc.setdefault((r.doc_id, r.section), []).append((p, len(r.term)))
    texts = {
        r["doc_id"]: r
        for r in corpus.filter(F.col("doc_id").isin(list(doc_ids))).collect()
    }
    out = []
    for r in res_rows:
        row = {"query_id": r.query_id, "rank": r.rank, "doc_id": r.doc_id,
               "score": r.score}
        src = texts.get(r.doc_id)
        for section, col in section_cols.items():
            text = src[col] if src else ""
            row[section] = apply_markup(
                text, by_doc.get((r.doc_id, section), [])
            )
        out.append(row)
    return out
