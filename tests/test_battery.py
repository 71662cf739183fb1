"""Battery-contract tests: the driver verifies exactly the first 50
``queries()`` entries, so the battery must BE exactly 50 with an oracle per
entry, and every merged battery entry must equal the composition of the
narrow ops it fused (so moving the narrow ops to ``twin_queries()`` loses
no verification surface)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _entry_mod():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    return m


def test_battery_is_exactly_50_with_full_oracle_cover():
    m = _entry_mod()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) == 50
    missing = sorted(set(qs) - set(oracles))
    assert not missing, f"battery entries without oracle: {missing}"
    twins = m.twin_queries()
    t_oracles = m.twin_oracle_sql()
    assert sorted(twins) == sorted(t_oracles)
    assert not set(twins) & set(qs), "a twin shadows a battery entry"


def test_text_stats_equals_join_of_narrow_ops(spark):
    from information_retrieval_spark.ops import textstats as ts

    merged = {r["doc_id"]: r.asDict() for r in ts.q_text_stats(spark, SF).collect()}
    parts = [
        ts.q_token_count(spark, SF),
        ts.q_quality(spark, SF),
        ts.q_langid(spark, SF),
        ts.q_fingerprint(spark, SF),
    ]
    joined: dict[int, dict] = {}
    for p in parts:
        for r in p.collect():
            joined.setdefault(r["doc_id"], {"doc_id": r["doc_id"]}).update(r.asDict())
    assert set(merged) == set(joined)
    for did, row in merged.items():
        assert row == joined[did], did


def test_tfidf_topk_is_tagged_union_of_both_schemes(spark):
    from information_retrieval_spark.ops import ir_direct as ir

    merged = {
        (r.scheme, r.query_id, r.rank): (r.doc_id, r.score_r)
        for r in ir.q_tfidf_topk(spark, SF).collect()
    }
    want = {}
    for scheme, fn in (("ltn", ir.q_tfidf_ltn), ("ltc", ir.q_tfidf_ltc)):
        for r in fn(spark, SF).collect():
            want[(scheme, r.query_id, r.rank)] = (r.doc_id, r.score_r)
    assert merged == want
