"""Graph scoring: PageRank + HITS as iterative DataFrame programs.

Reference: personalized PageRank (G1, `ui/backend/mir/search/search/
phase3.py:23-82`) and HITS author ranking (G2, `ir-phase-3.ipynb:c34`).
The reference rebuilds its citation graph per query from the corpus
(`phase3.py:147-149`); here the analogous deterministic link graph derives
from ``documents``: doc i links to (i·7+j) mod N for j ∈ {1,2,3}, self-loops
dropped — a pure function of the table, identical in the DuckDB twin.

PageRank runs a FIXED iteration count so the SQL oracle can unroll the same
recurrence as chained CTEs — the driver value-checks a genuinely iterative
operator. The personalized variant (non-standard additive teleport,
`phase3.py:59-80`) is exposed for the engine path and pytest-checked.

Scale notes: each iteration is one join (ranks ⨝ edges on src, shuffle on
dst). At web scale: pre-partition both sides by the join key once
(`repartition(src)`) so iterations reuse the exchange, and
``localCheckpoint`` every few iterations to truncate lineage — done here
too (lineage grows O(iters) otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DAMPING = 0.85
N_ITERS = 10
FANOUT = 3


def edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): deterministic synthetic link graph over documents."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    targets = F.array(*[(F.col("doc_id") * 7 + j) % n for j in (1, 2, 3)])
    return (
        d.select(F.col("doc_id").alias("src"), F.explode(targets).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


SQL_EDGES = f"""
  SELECT DISTINCT doc_id AS src, (doc_id * 7 + j) % n AS dst
  FROM documents, (SELECT count(*) AS n FROM documents) nn,
       unnest([1, 2, 3]) AS t(j)
  WHERE doc_id <> (doc_id * 7 + j) % n
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pr_r): PageRank after exactly N_ITERS synchronous
    iterations, uniform init 1/N, r' = (1−d)/N + d·Σ_in r/outdeg."""
    e = edges_df(spark, sf_dir)
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id")
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-partition the static side once; every iteration reuses it
    e_deg = e.join(outdeg, "src").repartition("src").cache()
    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("pr"))
    for i in range(N_ITERS):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.doc_id)
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.doc_id == contrib.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit((1.0 - DAMPING) / n)
                    + DAMPING * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
        )
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint()  # truncate lineage
    e_deg.unpersist()
    return ranks.select("doc_id", F.round("pr", 9).alias("pr_r"))


def _sql_pagerank() -> str:
    cte = [
        f"e AS ({SQL_EDGES})",
        "nn AS (SELECT count(*) AS n FROM documents)",
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg ON e.src = deg.src)",
        "r0 AS (SELECT doc_id, 1.0::DOUBLE / nn.n AS pr FROM documents, nn)",
    ]
    for i in range(N_ITERS):
        prev, cur = f"r{i}", f"r{i + 1}"
        cte.append(
            f"""{cur} AS (
  SELECT d.doc_id,
         (1.0 - {DAMPING})::DOUBLE / nn.n
         + {DAMPING} * coalesce(i.inflow, 0.0::DOUBLE) AS pr
  FROM documents d
  CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst, sum({prev}.pr / ed.outdeg) AS inflow
    FROM ed JOIN {prev} ON ed.src = {prev}.doc_id
    GROUP BY ed.dst
  ) i ON d.doc_id = i.dst
)"""
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT doc_id, round(pr, 9) AS pr_r FROM r{N_ITERS}"
    )


SQL_PAGERANK = _sql_pagerank()


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hub_r, auth_r): HITS after N_ITERS iterations with L2
    normalization each step (`nx.hits` semantics, tol ignored — fixed
    iteration count for determinism).

    Outputs round to 7 decimals (not the usual 9): each iteration's L2
    norm sums ~N squares in engine-dependent order, so cross-engine drift
    after 2·N_ITERS normalizations is ~1e-13 — round-9 boundaries (5e-10)
    would leave a small but real chance of a value-hash flake across the
    whole vector; 5e-8 boundaries make it negligible."""
    e = edges_df(spark, sf_dir).cache()
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    hubs = nodes.select("doc_id", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(N_ITERS):
        # the L2 norms stay IN-PLAN as one-row broadcast cross joins (the
        # SQL twin's az/hz CTEs): zero scalar driver round-trips per
        # iteration. Each normalized vector is localCheckpoint-ed — the
        # norm subplan references its input twice, so without
        # materialization the plan tree would double per iteration.
        auth = (
            e.join(hubs, e.src == hubs.doc_id)
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
        )
        anorm = auth.agg(F.sqrt(F.sum(F.col("auth") ** 2)).alias("az"))
        auth = (
            auth.crossJoin(F.broadcast(anorm))
            .select(
                F.col("dst").alias("adst"),
                (F.col("auth") / F.col("az")).alias("auth"),
            )
            .localCheckpoint()
        )
        hub = (
            e.join(auth, e.dst == auth.adst)
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
        )
        hnorm = hub.agg(F.sqrt(F.sum(F.col("hub") ** 2)).alias("hz"))
        hubs = (
            hub.crossJoin(F.broadcast(hnorm))
            .select(
                F.col("src").alias("doc_id"),
                (F.col("hub") / F.col("hz")).alias("hub"),
            )
            .localCheckpoint()
        )
    auths = auth.select(F.col("adst").alias("doc_id"), "auth")
    out = (
        nodes.join(hubs, "doc_id", "left")
        .join(auths, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("hub", F.lit(0.0)), 7).alias("hub_r"),
            F.round(F.coalesce("auth", F.lit(0.0)), 7).alias("auth_r"),
        )
    )
    e.unpersist()
    return out


N_AUTHORS_DIV = 5  # synthetic author pool = |docs| / 5
AUTHORS_PER_PAPER = 2


def author_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(author_id, paper_id): deterministic synthetic bipartite authorship
    graph over documents — paper d is written by authors (d·13 + j·7) mod
    A for j ∈ {0, 1}, A = max(1, N/5). Pure function of the table,
    identical in the DuckDB twin."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    na = max(1, n // N_AUTHORS_DIV)
    authors = F.array(
        *[(F.col("doc_id") * 13 + j * 7) % na for j in range(AUTHORS_PER_PAPER)]
    )
    return d.select(
        F.explode(authors).alias("author_id"),
        F.col("doc_id").alias("paper_id"),
    ).distinct()


def q_author_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(author_id, hub_r): the reference's phase-3 author ranking
    (`ir-phase-3.ipynb:c34:4-51`) — HITS on the bipartite author–paper
    graph, authors as hubs and papers as authorities, N_ITERS iterations
    with L2 normalization per step. The reference sorts its author scores
    via a STRING sort of the numeric score (a display bug that reorders
    e.g. 0.9 before 0.11); implemented here correct-by-spec (numeric
    hub score, ties pinned by author_id downstream), documented rather
    than replicated. Same in-plan one-row-norm + localCheckpoint shape as
    ``q_hits``; round-7 for the same cross-engine drift reason."""
    e = author_edges(spark, sf_dir).cache()
    hubs = e.select("author_id").distinct().withColumn("hub", F.lit(1.0))
    for _ in range(N_ITERS):
        auth = (
            e.join(hubs, "author_id")
            .groupBy("paper_id")
            .agg(F.sum("hub").alias("auth"))
        )
        anorm = auth.agg(F.sqrt(F.sum(F.col("auth") ** 2)).alias("az"))
        auth = (
            auth.crossJoin(F.broadcast(anorm))
            .select("paper_id", (F.col("auth") / F.col("az")).alias("auth"))
            .localCheckpoint()
        )
        hub = (
            e.join(auth, "paper_id")
            .groupBy("author_id")
            .agg(F.sum("auth").alias("hub"))
        )
        hnorm = hub.agg(F.sqrt(F.sum(F.col("hub") ** 2)).alias("hz"))
        hubs = (
            hub.crossJoin(F.broadcast(hnorm))
            .select("author_id", (F.col("hub") / F.col("hz")).alias("hub"))
            .localCheckpoint()
        )
    out = hubs.select("author_id", F.round("hub", 7).alias("hub_r"))
    e.unpersist()
    return out


def _sql_author_hits() -> str:
    """DuckDB twin of q_author_hits: N_ITERS unrolled with one-row L2-norm
    CTEs over the bipartite edges (MATERIALIZED for the same exponential-
    inlining reason as _sql_hits)."""
    js = ", ".join(str(j) for j in range(AUTHORS_PER_PAPER))
    cte = [
        "nn AS MATERIALIZED (SELECT greatest(1, count(*) // "
        f"{N_AUTHORS_DIV}) AS na FROM documents)",
        f"""ae AS MATERIALIZED (
  SELECT DISTINCT (doc_id * 13 + t.j * 7) % nn.na AS author_id,
         doc_id AS paper_id
  FROM documents, nn, unnest([{js}]) AS t(j)
)""",
        "h0 AS MATERIALIZED (SELECT DISTINCT author_id, 1.0::DOUBLE AS hub"
        " FROM ae)",
    ]
    for i in range(1, N_ITERS + 1):
        p = i - 1
        cte.append(
            f"a{i} AS MATERIALIZED (SELECT ae.paper_id, sum(h.hub) AS auth"
            f" FROM ae JOIN h{p} h ON ae.author_id = h.author_id"
            " GROUP BY ae.paper_id)"
        )
        cte.append(
            f"az{i} AS MATERIALIZED (SELECT sqrt(sum(auth * auth)) AS z FROM a{i})"
        )
        cte.append(
            f"an{i} AS MATERIALIZED"
            f" (SELECT paper_id, auth / z AS auth FROM a{i} CROSS JOIN az{i})"
        )
        cte.append(
            f"hh{i} AS MATERIALIZED (SELECT ae.author_id, sum(an.auth) AS hub"
            f" FROM ae JOIN an{i} an ON ae.paper_id = an.paper_id"
            " GROUP BY ae.author_id)"
        )
        cte.append(
            f"hz{i} AS MATERIALIZED (SELECT sqrt(sum(hub * hub)) AS z FROM hh{i})"
        )
        cte.append(
            f"h{i} AS MATERIALIZED (SELECT author_id, hub / z AS hub"
            f" FROM hh{i} CROSS JOIN hz{i})"
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT author_id, round(hub, 7) AS hub_r FROM h{N_ITERS}"
    )


SQL_AUTHOR_HITS = _sql_author_hits()


def _sql_hits() -> str:
    """DuckDB twin of q_hits: N_ITERS unrolled, each iteration a grouped
    sum plus a one-row L2-norm CTE (same pattern as SQL_PAGERANK — the
    'iterative global normalization' is just a scalar cross-join per
    step). Joins/normalizations mirror the Spark loop exactly: auth from
    hubs over src-edges, hub from normalized auth over dst-edges.

    Every CTE is MATERIALIZED: most are referenced twice per iteration, and
    DuckDB's default inlining re-expands each reference — across 10 chained
    iterations that's exponential plan growth (observed as a too-many-open-
    files explosion of repeated parquet scans)."""
    cte = [
        f"e AS MATERIALIZED ({SQL_EDGES})",
        "h0 AS MATERIALIZED (SELECT doc_id, 1.0::DOUBLE AS hub FROM documents)",
    ]
    for i in range(1, N_ITERS + 1):
        p = i - 1
        cte.append(
            f"a{i} AS MATERIALIZED (SELECT e.dst, sum(h.hub) AS auth"
            f" FROM e JOIN h{p} h ON e.src = h.doc_id GROUP BY e.dst)"
        )
        cte.append(
            f"az{i} AS MATERIALIZED (SELECT sqrt(sum(auth * auth)) AS z FROM a{i})"
        )
        cte.append(
            f"an{i} AS MATERIALIZED"
            f" (SELECT dst, auth / z AS auth FROM a{i} CROSS JOIN az{i})"
        )
        cte.append(
            f"hh{i} AS MATERIALIZED (SELECT e.src, sum(an.auth) AS hub"
            f" FROM e JOIN an{i} an ON e.dst = an.dst GROUP BY e.src)"
        )
        cte.append(
            f"hz{i} AS MATERIALIZED (SELECT sqrt(sum(hub * hub)) AS z FROM hh{i})"
        )
        cte.append(
            f"h{i} AS MATERIALIZED (SELECT src AS doc_id, hub / z AS hub"
            f" FROM hh{i} CROSS JOIN hz{i})"
        )
    return (
        "WITH " + ",\n".join(cte) + f"""
SELECT d.doc_id,
       round(coalesce(h.hub, 0.0), 7) AS hub_r,
       round(coalesce(a.auth, 0.0), 7) AS auth_r
FROM documents d
LEFT JOIN h{N_ITERS} h ON d.doc_id = h.doc_id
LEFT JOIN an{N_ITERS} a ON d.doc_id = a.dst
"""
    )


SQL_HITS = _sql_hits()


# ------------------------------------------------------------- rank fusion

FUSION_PW = 0.3  # pagerank weight (reference default personalization_weight)


def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, doc_id, fused_r): phase-3 style fusion
    (`search/phase3.py:160-179`): BM25 top-k and PageRank are each
    ÷max-normalized (F11), then fused (1−pw)·search + pw·pagerank (F12)
    and re-ranked. Normalization here is over the top-k score set and the
    global PageRank vector respectively; ties pinned (-fused, doc_id)."""
    from pyspark.sql import Window

    from information_retrieval_spark.ops.ir_direct import q_bm25_topk

    bm = q_bm25_topk(spark, sf_dir).select("query_id", "doc_id", "score_r")
    pr = q_pagerank(spark, sf_dir)
    wq = Window.partitionBy("query_id")
    bmn = bm.withColumn("s_norm", F.col("score_r") / F.max("score_r").over(wq))
    # global PageRank max stays in-plan as a one-row broadcast (same
    # pattern as the HITS norms): no driver job, no recomputation of the
    # post-checkpoint iterations just to fetch a scalar
    pr_mx = pr.agg(F.max("pr_r").alias("pr_max"))
    fused = (
        bmn.join(pr, "doc_id")
        .crossJoin(F.broadcast(pr_mx))
        .withColumn(
            "fused",
            (1 - FUSION_PW) * F.col("s_norm")
            + FUSION_PW * (F.col("pr_r") / F.col("pr_max")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("fused", 9)), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .select("query_id", "rank", "doc_id", F.round("fused", 6).alias("fused_r"))
    )


def _sql_rank_fusion() -> str:
    from information_retrieval_spark.ops.ir_direct import SQL_BM25_TOPK

    return f"""
WITH bm AS (SELECT query_id, doc_id, score_r FROM ({SQL_BM25_TOPK})),
pr AS ({SQL_PAGERANK}),
prmax AS (SELECT max(pr_r) AS m FROM pr),
bmn AS (
  SELECT query_id, doc_id,
         score_r / max(score_r) OVER (PARTITION BY query_id) AS s_norm
  FROM bm
),
fused AS (
  SELECT b.query_id, b.doc_id,
         (1 - {FUSION_PW}) * b.s_norm + {FUSION_PW} * (p.pr_r / m.m) AS fused
  FROM bmn b JOIN pr p ON b.doc_id = p.doc_id CROSS JOIN prmax m
)
SELECT query_id,
       row_number() OVER (
         PARTITION BY query_id ORDER BY round(fused, 9) DESC, doc_id ASC
       ) AS rank,
       doc_id, round(fused, 6) AS fused_r
FROM fused
"""


SQL_RANK_FUSION = _sql_rank_fusion()


# ----------------------------------------------- personalized PageRank (G1)

PPR_PREFS = {3: 2.0, 77: 1.0, 140: 1.0}  # fixture professor preferences


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pr_r): the reference's ADDITIVE-teleport personalized
    PageRank (`search/phase3.py:23-82` — preferred nodes gain
    (1−d)·pref(v) ON TOP of the uniform teleport; the vector does not sum
    to 1) after exactly N_ITERS iterations, so the SQL twin can unroll
    the recurrence like SQL_PAGERANK with a per-node base term."""
    e = edges_df(spark, sf_dir)
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    # tol < 0 disables early convergence: exactly max_iter iterations
    ranks = personalized_pagerank(
        spark, e, nodes, dict(PPR_PREFS), tol=-1.0, max_iter=N_ITERS
    )
    return ranks.select("doc_id", F.round("pr", 9).alias("pr_r"))


def _sql_ppr() -> str:
    vals = ", ".join(f"({k}, {float(v)})" for k, v in PPR_PREFS.items())
    cte = [
        f"e AS MATERIALIZED ({SQL_EDGES})",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM documents)",
        f"prefs(doc_id, w) AS (VALUES {vals})",
        "tot AS (SELECT sum(w) AS t FROM prefs)",
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "ed AS MATERIALIZED (SELECT e.src, e.dst, deg.outdeg"
        " FROM e JOIN deg ON e.src = deg.src)",
        f"""base AS MATERIALIZED (
  SELECT d.doc_id,
         (1.0 - {DAMPING})::DOUBLE / nn.n
         + (1.0 - {DAMPING}) * coalesce(p.w / tot.t, 0.0::DOUBLE) AS b
  FROM documents d CROSS JOIN nn CROSS JOIN tot
  LEFT JOIN prefs p ON d.doc_id = p.doc_id
)""",
        "r0 AS (SELECT doc_id, 1.0::DOUBLE / nn.n AS pr FROM documents, nn)",
    ]
    for i in range(N_ITERS):
        prev, cur = f"r{i}", f"r{i + 1}"
        cte.append(
            f"""{cur} AS MATERIALIZED (
  SELECT base.doc_id,
         base.b + {DAMPING} * coalesce(i.inflow, 0.0::DOUBLE) AS pr
  FROM base
  LEFT JOIN (
    SELECT ed.dst, sum({prev}.pr / ed.outdeg) AS inflow
    FROM ed JOIN {prev} ON ed.src = {prev}.doc_id
    GROUP BY ed.dst
  ) i ON base.doc_id = i.dst
)"""
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT doc_id, round(pr, 9) AS pr_r FROM r{N_ITERS}"
    )


SQL_PPR = _sql_ppr()

def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame,
    preferences: dict[int, float],
    damping: float = DAMPING,
    tol: float = 1e-4,
    max_iter: int = 100,
) -> DataFrame:
    """Reference-exact personalized PageRank (`search/phase3.py:23-82`):

      r'(v) = (1−d)/N + d·Σ_in r(u)/outdeg(u) + (1−d)·pref(v)

    — the teleport term is ADDED for preferred nodes only (non-standard:
    the resulting vector does not sum to 1; replicated deliberately for
    score-identity, SURVEY.md §2.9 G1). ``preferences`` are normalized to
    sum 1 as the reference does (`phase3.py:151-155`). Stops at L1 change
    < tol or max_iter. Driver sees one scalar per iteration (the L1 agg);
    ranks stay distributed, lineage truncated every few iterations.
    """
    n = nodes.count()
    total = sum(preferences.values()) or 1.0
    pref_rows = [(int(k), float(v) / total) for k, v in preferences.items()]
    pref = (
        spark.createDataFrame(pref_rows, "doc_id long, pref double")
        if pref_rows
        else spark.createDataFrame([], "doc_id long, pref double")
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e_deg = edges.join(outdeg, "src").repartition("src").cache()
    base = nodes.join(F.broadcast(pref), "doc_id", "left").select(
        "doc_id",
        (
            F.lit((1.0 - damping) / n)
            + (1.0 - damping) * F.coalesce(F.col("pref"), F.lit(0.0))
        ).alias("base"),
    ).cache()
    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("pr"))
    for i in range(max_iter):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.doc_id)
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            base.join(contrib, base.doc_id == contrib.dst, "left")
            .select(
                "doc_id",
                (
                    F.col("base")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
        ).localCheckpoint()
        l1 = (
            new_ranks.join(
                ranks.withColumnRenamed("pr", "pr_old"), "doc_id"
            )
            .agg(F.sum(F.abs(F.col("pr") - F.col("pr_old"))).alias("d"))
            .collect()[0]
            .d
        )
        ranks = new_ranks
        if l1 < tol:
            break
    e_deg.unpersist()
    base.unpersist()
    return ranks
