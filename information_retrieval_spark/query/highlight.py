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


# ----------------------------------------------------------- best passage

ELLIPSIS = "…"


def best_passage(
    spans: list[tuple[int, int, str]], window: int
) -> tuple[int, list[tuple[int, int]]]:
    """Choose the best ``window``-char passage for a doc's match spans
    ``(offset, length, term)``: the window START is anchored at some
    span's offset (an optimal window can always be slid right until it
    hits one), scored by (#spans fully inside, #distinct terms inside),
    ties → earliest. Returns (window_start, spans_inside) — spans sorted,
    two-pointer, O(n). The reference marks up whole sections
    (`common.py:158-170`); at 100 TB result docs are megabytes, so the
    server returns a query-dense excerpt instead of the document."""
    if not spans:
        return 0, []
    spans = sorted(spans)
    best = (-1, -1, 0, 0)  # (-count, -distinct) maximized via > compare
    j = 0
    for i, (off, _ln, _t) in enumerate(spans):
        if j < i:
            j = i
        while j < len(spans) and spans[j][0] + spans[j][1] <= off + window:
            j += 1
        inside = spans[i:j]
        score = (len(inside), len({t for _, _, t in inside}))
        if score > best[:2]:
            best = (score[0], score[1], off, i)
    start, i0 = best[2], best[3]
    inside = [
        (o, ln) for o, ln, _ in spans[i0:]
        if o + ln <= start + window
    ]
    return start, inside


def passage_results(
    spark: SparkSession,
    index_dir: str,
    results: DataFrame,
    corpus: DataFrame,
    qterms: list[str],
    section_cols: dict[str, str],
    window: int = 160,
) -> list[dict]:
    """`highlight_results`, but each section carries only its BEST
    ``window``-char passage (max matched spans, then max distinct terms,
    then earliest — `best_passage`), clipped with ellipses, plus
    ``<section>_range = (start, end)`` into the original text. Sections
    with no match return their head ``window`` chars unmarked (the
    reference UI's behavior for unmatched sections). Driver-side over
    the k result rows only — corpus text reaches the driver k rows at a
    time, never corpus-sized."""
    res_rows = results.collect()
    doc_ids = {r.doc_id for r in res_rows}
    offs = match_offsets(spark, index_dir, results, qterms).collect()
    by_doc: dict[tuple[int, str], list[tuple[int, int, str]]] = {}
    for r in offs:
        for p in r.positions:
            by_doc.setdefault((r.doc_id, r.section), []).append(
                (p, len(r.term), r.term)
            )
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
            spans = by_doc.get((r.doc_id, section), [])
            start, inside = best_passage(spans, window)
            end = min(len(text), start + window)
            marked = apply_markup(
                text[start:end], [(o - start, ln) for o, ln in inside]
            )
            row[section] = (
                (ELLIPSIS if start > 0 else "")
                + marked
                + (ELLIPSIS if end < len(text) else "")
            )
            row[f"{section}_range"] = (start, end)
        out.append(row)
    return out
