"""Graph scoring vs pure-Python oracles: personalized PageRank must match
the reference's non-standard additive-teleport recurrence exactly
(`search/phase3.py:23-82` semantics), and HITS must produce L2-normalized
hub/authority vectors."""

import pytest

from information_retrieval_spark.ops.graph import (
    DAMPING,
    personalized_pagerank,
    q_hits,
    q_pagerank,
)

SF = "/root/testdata/sf0.001"


def _edges():
    # mirror ops.graph.edges_df for n docs (doc_id 0..n-1)
    n = 500
    out = set()
    for i in range(n):
        for j in (1, 2, 3):
            d = (i * 7 + j) % n
            if d != i:
                out.add((i, d))
    return sorted(out), n


def _ppr_oracle(edges, n, prefs, d=DAMPING, tol=1e-4, max_iter=100):
    total = sum(prefs.values()) or 1.0
    prefs = {k: v / total for k, v in prefs.items()}
    outdeg = {}
    incoming = {}
    for s, t in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        incoming.setdefault(t, []).append(s)
    r = {v: 1.0 / n for v in range(n)}
    base = {
        v: (1 - d) / n + (1 - d) * prefs.get(v, 0.0) for v in range(n)
    }
    for _ in range(max_iter):
        new = {}
        for v in range(n):
            inflow = sum(r[u] / outdeg[u] for u in incoming.get(v, []))
            new[v] = base[v] + d * inflow
        l1 = sum(abs(new[v] - r[v]) for v in range(n))
        r = new
        if l1 < tol:
            break
    return r


def test_personalized_pagerank_matches_oracle(spark):
    from pyspark.sql import functions as F

    edges, n = _edges()
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    prefs = {3: 2.0, 77: 1.0, 410: 1.0}
    got = {
        r.doc_id: r.pr
        for r in personalized_pagerank(spark, e, nodes, prefs).collect()
    }
    want = _ppr_oracle(edges, n, prefs)
    assert len(got) == n
    for v in range(n):
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    # the additive teleport makes preferred nodes strictly richer
    base = {
        r.doc_id: r.pr
        for r in personalized_pagerank(spark, e, nodes, {}).collect()
    }
    for v in prefs:
        assert got[v] > base[v]


def test_pagerank_sums_to_one(spark):
    rows = q_pagerank(spark, SF).collect()
    assert sum(r.pr_r for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_hits_l2_normalized(spark):
    rows = q_hits(spark, SF).collect()
    hub2 = sum(r.hub_r ** 2 for r in rows)
    auth2 = sum(r.auth_r ** 2 for r in rows)
    # outputs round to 7 decimals (cross-engine oracle headroom), so the
    # reconstructed norm carries ~sqrt(N)*5e-8 of rounding noise
    assert hub2 == pytest.approx(1.0, rel=1e-5)
    assert auth2 == pytest.approx(1.0, rel=1e-5)


def test_author_hits_bipartite(spark):
    """Bipartite author-paper HITS: hub vector L2-normalized over the
    author pool; every author in the synthetic graph gets a score; a
    pure-Python power iteration over the same edges reproduces the hubs
    (correct-by-spec replacement for the reference's string-sorted
    output, ir-phase-3.ipynb:c34)."""
    import math

    from information_retrieval_spark.ops.graph import (
        AUTHORS_PER_PAPER,
        N_AUTHORS_DIV,
        N_ITERS,
        author_edges,
        q_author_hits,
    )

    rows = {r.author_id: r.hub_r for r in q_author_hits(spark, SF).collect()}
    assert sum(v * v for v in rows.values()) == pytest.approx(1.0, rel=1e-5)
    edges = {(r.author_id, r.paper_id)
             for r in author_edges(spark, SF).collect()}
    authors = {a for a, _ in edges}
    assert set(rows) == authors
    # pure-Python twin
    hub = {a: 1.0 for a in authors}
    for _ in range(N_ITERS):
        auth = {}
        for a, p in edges:
            auth[p] = auth.get(p, 0.0) + hub[a]
        z = math.sqrt(sum(v * v for v in auth.values()))
        auth = {p: v / z for p, v in auth.items()}
        hub = {}
        for a, p in edges:
            hub[a] = hub.get(a, 0.0) + auth[p]
        z = math.sqrt(sum(v * v for v in hub.values()))
        hub = {a: v / z for a, v in hub.items()}
    for a in authors:
        assert rows[a] == pytest.approx(hub[a], abs=5e-7), a
