"""Best-passage extraction (query/highlight.py): the two-pointer window
selector must match a brute-force oracle on random span sets, and the
e2e passage_results markup must mark exactly the query terms inside a
bounded excerpt."""

import random

from information_retrieval_spark.query.highlight import (
    ELLIPSIS,
    MARK_CLOSE,
    MARK_OPEN,
    best_passage,
)


def _brute(spans, window):
    """Optimal (count, distinct) over windows anchored at each span."""
    spans = sorted(spans)
    best = (0, 0)
    for off, _ln, _t in spans:
        inside = [s for s in spans if s[0] >= off and s[0] + s[1] <= off + window]
        score = (len(inside), len({t for _, _, t in inside}))
        best = max(best, score)
    return best


def test_best_passage_matches_brute_oracle():
    # regime deliberately includes windows SMALLER than the longest term
    # and dense overlapping spans — the corner where a blocking long span
    # precedes a short fitting one (a monotone two-pointer under-counts
    # there; caught by review, regression below)
    rng = random.Random(42)
    terms = ["alpha", "be", "gamma7", "superlongterm12"]
    for trial in range(400):
        n = rng.randrange(0, 12)
        spans = []
        for _ in range(n):
            t = rng.choice(terms)
            spans.append((rng.randrange(0, 60), len(t), t))
        window = rng.choice([5, 10, 40, 120])
        start, inside = best_passage(spans, window)
        if not spans:
            assert (start, inside) == (0, [])
            continue
        got = (
            len(inside),
            len({t for o, ln, t in spans
                 if (o, ln) in set(inside) and o >= start}),
        )
        # the selected window achieves the brute optimum
        want = _brute(spans, window)
        assert got[0] == want[0], (trial, spans, window, start, inside)
        # every chosen span really fits the window
        assert all(start <= o and o + ln <= start + window
                   for o, ln in inside)


def test_best_passage_overlapping_blocker_regression():
    """Review repro: the window anchored at 33 holds 3 spans, but a
    monotone two-pointer stops at the long blocker (38,9) (end 47 > 43)
    and never counts (39,2) which fits — must return start 33."""
    spans = [(4, 5, "c"), (11, 2, "a"), (12, 9, "b"), (33, 1, "b"),
             (35, 7, "c"), (38, 9, "c"), (39, 2, "b")]
    start, inside = best_passage(spans, 10)
    assert start == 33
    assert sorted(inside) == [(33, 1), (35, 7), (39, 2)]


def test_best_passage_prefers_distinct_terms_and_earliest():
    # same count: two 'a's at 0 vs ('a','b') at 200 — distinct wins
    spans = [(0, 1, "a"), (5, 1, "a"), (200, 1, "a"), (205, 1, "b")]
    start, _ = best_passage(spans, 50)
    assert start == 200
    # full tie: earliest anchor wins
    spans = [(300, 1, "a"), (10, 1, "a")]
    start, _ = best_passage(spans, 50)
    assert start == 10


def test_passage_results_e2e(spark, tmp_path_factory):
    from information_retrieval_spark.fixtures import corpus_rows
    from information_retrieval_spark.index.build import IndexBuilder
    from information_retrieval_spark.query.engine import (
        QuerySpec,
        SearchEngine,
    )
    from information_retrieval_spark.query.highlight import passage_results
    from information_retrieval_spark.tokenize import code_terms

    rows = corpus_rows(60)
    d = str(tmp_path_factory.mktemp("pass"))
    corpus = spark.createDataFrame(
        [(r.doc_id, r.path, r.content) for r in rows],
        "doc_id long, path string, content string",
    )
    IndexBuilder(
        spark, d, {"title": "path", "abstract": "content"},
        tokenizer="code", stop_k=10,
    ).build(corpus)
    eng = SearchEngine(spark, d)
    q = "tokenizer stream"
    res = eng.search(
        [QuerySpec(1, q, "okapi25", 5, spell=False, match_mode="exact")]
    )
    qterms = code_terms(q)
    WINDOW = 80
    out = passage_results(
        spark, d, res, corpus, qterms,
        {"title": "path", "abstract": "content"}, window=WINDOW,
    )
    assert len(out) == 5
    texts = {r.doc_id: r.content for r in rows}
    for row in out:
        body = row["abstract"].strip(ELLIPSIS)
        # excerpt is bounded (markup inflates by tag lengths only)
        n_marks = body.count(MARK_OPEN)
        assert (len(body) - n_marks * (len(MARK_OPEN) + len(MARK_CLOSE))
                <= WINDOW)
        # every marked substring is a query term (surface may differ in
        # case from the processed term; lengths always agree)
        rest = body
        while MARK_OPEN in rest:
            rest = rest.split(MARK_OPEN, 1)[1]
            marked, rest = rest.split(MARK_CLOSE, 1)
            assert marked.lower() in qterms, marked
        # the range maps back into the original text
        s, e = row["abstract_range"]
        assert 0 <= s <= e <= len(texts[row["doc_id"]])
    # unmatched section (title) must still be present and bounded
    assert all(len(r["title"]) <= WINDOW + 2 for r in out)
