"""IR evaluation metrics (A10/A11, `ir-phase-1.ipynb:c34-39`) as one
declarative plan — Precision/Recall/F1, AP, binary NDCG@k, MRR per query.

Relevance here is derived, not annotated (the reference's validation.json
qrels are DVC-external): a doc is *relevant* to a query iff it contains ALL
the query's terms (conjunctive semantics). That makes the whole evaluation
— ranking AND qrels AND metrics — a pure function of the corpus, so the
DuckDB oracle can value-check it end to end.

Definitions (binary relevance, k = 10):
  P@k = |hits| / k-returned,  R = |hits| / |rel|,  F1 harmonic
  AP  = Σ_{i: pred_i rel} P@i / min(|rel|, k)
  DCG = Σ_{i: pred_i rel} 1/log2(i+1);  IDCG = Σ_{i=1..min(|rel|,k)} …
  MRR = 1 / first relevant rank (0 if none)

All window/join algebra, no UDFs; per-query cardinalities are tiny (k rows)
— the expensive part is the upstream ranking, shared with ``q_bm25_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from information_retrieval_spark.ops.ir_direct import (
    SQL_BM25_TOPK,
    SQL_QTERMS,
    SQL_TF,
    TOP_K,
    _qterms,
    q_bm25_topk,
    q_tf,
)


def _relevant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id) docs containing ALL the query's terms."""
    tf = q_tf(spark, sf_dir)
    qt = _qterms(spark)
    nterms = qt.groupBy("query_id").agg(F.countDistinct("qterm").alias("n_terms"))
    m = tf.join(F.broadcast(qt), tf.term == qt.qterm).select(
        "query_id", "doc_id", "qterm"
    )
    return (
        m.groupBy("query_id", "doc_id")
        .agg(F.countDistinct("qterm").alias("hit_terms"))
        .join(F.broadcast(nterms), "query_id")
        .filter(F.col("hit_terms") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_ret, n_rel, n_hit, p_r, r_r, f1_r, ap_r, ndcg_r, mrr_r)."""
    pred = q_bm25_topk(spark, sf_dir).select("query_id", "rank", "doc_id")
    rel = _relevant(spark, sf_dir)
    hits = pred.join(rel, ["query_id", "doc_id"]).select(
        "query_id", "rank"
    )
    n_rel = rel.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    n_ret = pred.groupBy("query_id").agg(F.count("*").alias("n_ret"))

    # P@i at each hit: rank-of-hit among hits / rank in list
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id").orderBy("rank")
    h = hits.withColumn("hit_no", F.row_number().over(wq))
    per_hit = h.groupBy("query_id").agg(
        F.count("*").alias("n_hit"),
        F.sum(F.col("hit_no") / F.col("rank")).alias("sum_p_at_hit"),
        F.sum(1.0 / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.min("rank").alias("first_hit"),
    )
    base = (
        n_ret.join(n_rel, "query_id", "left")
        .na.fill({"n_rel": 0})
        .join(per_hit, "query_id", "left")
        .na.fill({"n_hit": 0, "sum_p_at_hit": 0.0, "dcg": 0.0})
    )
    denom = F.least(F.col("n_rel"), F.lit(TOP_K))
    # IDCG = Σ_{i=1..denom} 1/log2(i+1), closed-form-free: tiny literal sum
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {TOP_K}))),"
        " cast(0.0 as double), (a, i) -> a + 1.0 / log2(i + 1))"
    )
    p = F.col("n_hit") / F.col("n_ret")
    r = F.when(F.col("n_rel") > 0, F.col("n_hit") / F.col("n_rel")).otherwise(0.0)
    out = base.select(
        "query_id",
        "n_ret",
        "n_rel",
        "n_hit",
        F.round(p, 6).alias("p_r"),
        F.round(r, 6).alias("r_r"),
        F.round(
            F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0), 6
        ).alias("f1_r"),
        F.round(
            F.when(denom > 0, F.col("sum_p_at_hit") / denom).otherwise(0.0), 6
        ).alias("ap_r"),
        F.round(
            F.when(F.col("n_rel") > 0, F.col("dcg") / idcg).otherwise(0.0), 6
        ).alias("ndcg_r"),
        F.round(
            F.when(F.col("first_hit").isNotNull(), 1.0 / F.col("first_hit"))
            .otherwise(0.0),
            6,
        ).alias("mrr_r"),
    )
    return out


SQL_EVAL_METRICS = f"""
WITH pred AS (
  SELECT query_id, rank, doc_id FROM ({SQL_BM25_TOPK})
),
tf AS ({SQL_TF}),
qt AS ({SQL_QTERMS}),
nterms AS (SELECT query_id, count(DISTINCT qterm) AS n_terms FROM qt GROUP BY query_id),
rel AS (
  SELECT m.query_id, m.doc_id
  FROM (
    SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.qterm) AS hit_terms
    FROM tf JOIN qt ON tf.term = qt.qterm
    GROUP BY qt.query_id, tf.doc_id
  ) m JOIN nterms n ON m.query_id = n.query_id
  WHERE m.hit_terms = n.n_terms
),
hits AS (
  SELECT p.query_id, p.rank,
         row_number() OVER (PARTITION BY p.query_id ORDER BY p.rank) AS hit_no
  FROM pred p JOIN rel r ON p.query_id = r.query_id AND p.doc_id = r.doc_id
),
n_rel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id),
n_ret AS (SELECT query_id, count(*) AS n_ret FROM pred GROUP BY query_id),
per_hit AS (
  SELECT query_id, count(*) AS n_hit,
         sum(hit_no::DOUBLE / rank) AS sum_p_at_hit,
         sum(1.0 / log2(rank + 1)) AS dcg,
         min(rank) AS first_hit
  FROM hits GROUP BY query_id
),
base AS (
  SELECT r.query_id, r.n_ret,
         coalesce(nr.n_rel, 0) AS n_rel,
         coalesce(ph.n_hit, 0) AS n_hit,
         coalesce(ph.sum_p_at_hit, 0.0) AS sum_p_at_hit,
         coalesce(ph.dcg, 0.0) AS dcg,
         ph.first_hit,
         least(coalesce(nr.n_rel, 0), {TOP_K}) AS denom
  FROM n_ret r
  LEFT JOIN n_rel nr ON r.query_id = nr.query_id
  LEFT JOIN per_hit ph ON r.query_id = ph.query_id
),
idcg AS (
  SELECT b.query_id,
         coalesce((SELECT sum(1.0 / log2(i + 1))
                   FROM unnest(generate_series(1, b.denom)) AS t(i)), 0.0) AS idcg
  FROM base b
)
SELECT b.query_id, b.n_ret, b.n_rel, b.n_hit,
  round(b.n_hit::DOUBLE / b.n_ret, 6) AS p_r,
  round(CASE WHEN b.n_rel > 0 THEN b.n_hit::DOUBLE / b.n_rel ELSE 0.0 END, 6) AS r_r,
  round(CASE WHEN (b.n_hit::DOUBLE / b.n_ret)
             + (CASE WHEN b.n_rel > 0 THEN b.n_hit::DOUBLE / b.n_rel ELSE 0.0 END) > 0
        THEN 2 * (b.n_hit::DOUBLE / b.n_ret)
               * (CASE WHEN b.n_rel > 0 THEN b.n_hit::DOUBLE / b.n_rel ELSE 0.0 END)
             / ((b.n_hit::DOUBLE / b.n_ret)
                + (CASE WHEN b.n_rel > 0 THEN b.n_hit::DOUBLE / b.n_rel ELSE 0.0 END))
        ELSE 0.0 END, 6) AS f1_r,
  round(CASE WHEN b.denom > 0 THEN b.sum_p_at_hit / b.denom ELSE 0.0 END, 6) AS ap_r,
  round(CASE WHEN b.n_rel > 0 THEN b.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg_r,
  round(CASE WHEN b.first_hit IS NOT NULL THEN 1.0 / b.first_hit ELSE 0.0 END, 6) AS mrr_r
FROM base b JOIN idcg i ON b.query_id = i.query_id
"""
