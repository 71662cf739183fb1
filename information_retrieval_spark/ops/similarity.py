"""Similarity search over the ``embeddings`` table (vec_id, embedding[64],
label).

* **brute-force cosine top-k** — the exactness baseline: query set broadcast
  against all vectors, dot product via ``zip_with``/``aggregate`` in JVM
  expressions (double accumulation, index order — bit-reproducible in
  DuckDB's ``list_dot_product`` over DOUBLE lists).
* **LSH-bucketed ANN** — sign-random-projection (SRP) bucketing: SRP_BITS
  deterministic pseudo-random hyperplanes (portable md5-based coefficients)
  → SRP_BITS-bit bucket id; neighbor candidates share a bucket with the query
  (multi-probe: exact bucket + Hamming-1 probes). Recall measured against
  the brute-force baseline in tests.

Scale notes (10^9+ vectors): brute force is one broadcast-join scan — right
for reranking a candidate set, wrong as the global path; SRP bucketing keys
the shuffle on (bucket) so each query probes ~n/2^SRP_BITS of the corpus. An IVF
variant is the same plan with k-means centroids as the bucketer.

Reference analogue: embedding kNN / similar-docs (G6,
`ui/backend/mir/clustering/similar.py:6-30` — L2 there, cosine here as the
modern default; both exposed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from information_retrieval_spark.ops.common import portable_hash32, sql_hash32

TOP_K = 10
N_QUERY_VECS = 5  # vec_id < 5 are the query set
SRP_BITS = 6  # 2^6 buckets; sized so small-SF tests retrieve candidates
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    """Σ a_i·b_i in index order, double accumulation (JVM, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k over (query_id, vec_id, sim):
    ties pinned to (-round(sim,9), vec_id)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("sim", 9)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("sim", 6).alias("sim_r"))
    )


def brute_topk(
    e: DataFrame, n_query: int = N_QUERY_VECS, k: int = TOP_K
) -> DataFrame:
    """Brute-force cosine top-k for queries vec_id < n_query: one
    broadcast-join scan of the corpus per batch — the exactness baseline
    (and ground truth for `scripts/bench_ann_recall.py`)."""
    q = e.filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("qv"), F.col("embedding")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    return _rank_topk(pairs.select("query_id", "vec_id", sim.alias("sim")), k)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, vec_id, sim_r): brute-force cosine top-10 for the
    5-query set. Ties pinned to (-round(sim,9), vec_id)."""
    return brute_topk(_emb(spark, sf_dir))


SQL_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.v, e.v))) AS sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, round(sim, 6) AS sim_r
FROM (
  SELECT query_id, vec_id, sim,
    row_number() OVER (
      PARTITION BY query_id ORDER BY round(sim, 9) DESC, vec_id ASC
    ) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


# ------------------------------------------------------- SRP bucketed ANN

N_TABLES = 4  # independent LSH tables; recall ≈ 1 − (1 − p)^L


def _srp_planes(
    spark: SparkSession, n_tables: int = N_TABLES, n_bits: int = SRP_BITS
) -> DataFrame:
    """(tbl, bit, dim, coef): deterministic pseudo-random hyperplane
    coefficients in [-1, 1) for n_tables independent SRP tables,
    coef = portable_hash32('t<tbl>p<bit>d<dim>') / 2^31 − 1. Identical in
    the DuckDB twin — bucketing is bit-reproducible across engines, and a
    (tbl, bit) subset of a wider configuration hashes identically."""
    t = spark.range(n_tables).select(F.col("id").cast("int").alias("tbl"))
    b = spark.range(n_bits).select(F.col("id").cast("int").alias("bit"))
    d = spark.range(DIM).select(F.col("id").cast("int").alias("dim"))
    return (
        t.crossJoin(b)
        .crossJoin(d)
        .withColumn(
            "coef",
            portable_hash32(
                F.format_string("t%dp%dd%d", "tbl", "bit", "dim")
            ) / F.lit(float(1 << 31)) - 1.0,
        )
    )


def srp_buckets(
    e: DataFrame, n_tables: int = N_TABLES, n_bits: int = SRP_BITS
) -> DataFrame:
    """(vec_id, tbl, bucket) over any (vec_id, embedding) DataFrame —
    n_bits-bit sign-random-projection bucket per vector per LSH table.
    explode(embedding) ⨝broadcast planes → per-(vec,tbl,bit) dot sign →
    bit-pack. Shuffle grain: (vec_id, tbl, bit) then (vec_id, tbl) —
    never wider than the signature itself."""
    comp = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    planes = _srp_planes(e.sparkSession, n_tables, n_bits)
    proj = (
        comp.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "tbl", "bit")
        .agg(F.sum(F.col("x") * F.col("coef")).alias("p"))
    )
    # sign test on round(p, 9): float addition is non-associative, so a
    # projection that is mathematically 0 (± 1 ulp of engine-dependent sum
    # noise) would otherwise flip its bucket bit between Spark and DuckDB;
    # rounding first pins such values to bit 0 in both engines
    return (
        proj.groupBy("vec_id", "tbl")
        .agg(
            F.sum(
                F.when(
                    F.round(F.col("p"), 9) > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), bit)"),
                ).otherwise(0)
            ).alias("bucket")
        )
    )


def q_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: SRP buckets over the embeddings table."""
    return srp_buckets(_emb(spark, sf_dir))


_COEF = sql_hash32("format('t{}p{}d{}', t.tbl, b.bit, d.dim)".replace('{}', '\x7b\x7d'))

_SQL_COMP_EMB = f"""
  SELECT vec_id, (i - 1) AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, {DIM})) AS t(i)
"""


def _sql_srp_buckets_over(comp_sql: str) -> str:
    """SRP bucket SQL over any (vec_id, dim, x) component relation."""
    return f"""
WITH planes AS (
  SELECT t.tbl, b.bit, d.dim,
         {_COEF} / {float(1 << 31)} - 1.0 AS coef
  FROM (SELECT unnest(generate_series(0, {N_TABLES - 1})) AS tbl) t
  CROSS JOIN (SELECT unnest(generate_series(0, {SRP_BITS - 1})) AS bit) b
  CROSS JOIN (SELECT unnest(generate_series(0, {DIM - 1})) AS dim) d
),
comp AS ({comp_sql}),
proj AS (
  SELECT c.vec_id, p.tbl, p.bit, sum(c.x * p.coef) AS p
  FROM comp c JOIN planes p ON c.dim = p.dim
  GROUP BY c.vec_id, p.tbl, p.bit
)
SELECT vec_id, tbl,
       sum(CASE WHEN round(p, 9) > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS bucket
FROM proj GROUP BY vec_id, tbl
"""


SQL_SRP_BUCKETS = _sql_srp_buckets_over(_SQL_COMP_EMB)


def lsh_topk(
    e: DataFrame,
    n_query: int = N_QUERY_VECS,
    k: int = TOP_K,
    n_tables: int = N_TABLES,
    n_bits: int = SRP_BITS,
    multi_probe: bool = True,
) -> DataFrame:
    """ANN top-k over multi-table SRP LSH — candidates share a bucket with
    the query in ANY of the n_tables tables (exact bucket + optional
    Hamming-1 multi-probe per table). The candidate join keys on
    (tbl, bucket): per-query work is ~ L·(n_bits+1)/2^n_bits of the corpus
    instead of a full scan. (n_tables, n_bits, multi_probe) is the
    recall/cost dial, measured in `scripts/bench_ann_recall.py`."""
    buckets = srp_buckets(e, n_tables, n_bits)
    eb = e.join(buckets, "vec_id")
    q = eb.filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("tbl"),
        F.col("bucket").alias("qbucket"),
    )
    # multi-probe: exact bucket + flip each of the n_bits bits
    probe_set = [F.col("qbucket")]
    if multi_probe:
        probe_set += [
            F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)
        ]
    probes = q.select(
        "query_id",
        "qv",
        "tbl",
        F.explode(F.array(*probe_set)).alias("bucket"),
    )
    cand = eb.join(F.broadcast(probes), ["tbl", "bucket"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("qv"), F.col("embedding")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    scored = cand.select("query_id", "vec_id", sim.alias("sim")).distinct()
    return _rank_topk(scored, k)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, vec_id, sim_r): ANN top-10 for the 5-query set
    over multi-table SRP LSH at the library defaults."""
    return lsh_topk(_emb(spark, sf_dir))


SQL_ANN_LSH_TOPK = f"""
WITH buckets AS ({SQL_SRP_BUCKETS}),
e AS (SELECT em.vec_id, em.embedding::DOUBLE[] AS v, b.tbl, b.bucket
      FROM embeddings em JOIN buckets b ON em.vec_id = b.vec_id),
q AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket AS qbucket
      FROM e WHERE vec_id < {N_QUERY_VECS}),
probes AS (
  SELECT query_id, qv, tbl,
         CASE WHEN f.bit = -1 THEN qbucket
              ELSE xor(qbucket, (1::BIGINT << f.bit)) END AS bucket
  FROM q, (SELECT unnest(generate_series(-1, {SRP_BITS - 1})) AS bit) f
),
scored AS (
  SELECT DISTINCT p.query_id, e.vec_id,
         list_dot_product(p.qv, e.v)
           / (sqrt(list_dot_product(p.qv, p.qv))
              * sqrt(list_dot_product(e.v, e.v))) AS sim
  FROM e JOIN probes p ON e.tbl = p.tbl AND e.bucket = p.bucket
  WHERE e.vec_id <> p.query_id
)
SELECT query_id, rank, vec_id, round(sim, 6) AS sim_r
FROM (
  SELECT query_id, vec_id, sim,
    row_number() OVER (
      PARTITION BY query_id ORDER BY round(sim, 9) DESC, vec_id ASC
    ) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


# ----------------------------------------- embedding-cosine near-dup pairs

DUP_TAU = 0.45
N_MIRROR = 40
MIRROR_OFFSET = 100_000


def _aug_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus deterministic mirror copies of the first N_MIRROR
    vectors (vec_id + MIRROR_OFFSET): the synthetic table has no true
    duplicates, so the mirrors make the dedup path's positive class real
    (cosine exactly 1.0) while the raw tail exercises the near-threshold
    band. Real pipelines drop this and read the corpus directly."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    mirror = e.filter(F.col("vec_id") < N_MIRROR).select(
        (F.col("vec_id") + MIRROR_OFFSET).alias("vec_id"), "embedding"
    )
    return e.unionByName(mirror)


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, sim_r): embedding-cosine near-duplicate pairs — vectors
    sharing an SRP bucket in ANY LSH table, exact-cosine verified ≥ τ.

    The dedup analogue of ``q_ann_lsh_topk``: candidate generation is the
    bucketed self-join keyed on (tbl, bucket) — per-bucket work
    ~ (n/2^SRP_BITS)² per table instead of the O(n²) all-pairs — and the
    exact zip_with cosine is the verify stage. Candidate recall is the
    LSH dial (more tables/fewer bits → higher recall, bigger buckets);
    missed-by-bucketing pairs are the documented tradeoff, identical in
    the DuckDB twin (bucketing is bit-reproducible)."""
    aug = _aug_emb(spark, sf_dir)
    eb = aug.select("vec_id").join(srp_buckets(aug), "vec_id")
    a, b = eb.alias("a"), eb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("a"), F.col("b.vec_id").alias("b"))
        .distinct()
    )
    va = aug.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    vb = aug.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sim = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea")))
        * F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn("sim", sim)
        .filter(F.round("sim", 9) >= DUP_TAU)
        .select("a", "b", F.round("sim", 6).alias("sim_r"))
    )


_SQL_COMP_AUG = f"""
  SELECT vec_id, (i - 1) AS dim, v[i] AS x
  FROM (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {MIRROR_OFFSET}, embedding::DOUBLE[] FROM embeddings
    WHERE vec_id < {N_MIRROR}
  ), unnest(generate_series(1, {DIM})) AS t(i)
"""

SQL_EMBEDDING_DUPS = f"""
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {MIRROR_OFFSET}, embedding::DOUBLE[] FROM embeddings
  WHERE vec_id < {N_MIRROR}
),
buckets AS ({_sql_srp_buckets_over(_SQL_COMP_AUG)}),
cand AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.a, c.b,
         list_dot_product(va.v, vb.v)
           / (sqrt(list_dot_product(va.v, va.v))
              * sqrt(list_dot_product(vb.v, vb.v))) AS sim
  FROM cand c
  JOIN aug va ON c.a = va.vec_id
  JOIN aug vb ON c.b = vb.vec_id
)
SELECT a, b, round(sim, 6) AS sim_r FROM scored
WHERE round(sim, 9) >= {DUP_TAU}
"""


# ----------------------------------------------------------- IVF-style ANN

N_PROBE = 2  # coarse-quantizer cells probed per query


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_query: int = N_QUERY_VECS,
    k: int = TOP_K,
    n_probe: int = N_PROBE,
    k_cells: int | None = None,
) -> DataFrame:
    """IVF-style ANN — the k-means centroids (ops/ml.py, deterministic
    Lloyd) are the coarse quantizer; each query probes its n_probe nearest
    cells and exact-reranks their members by cosine. The candidate join
    keys on the cell id, so per-query work is ~n_probe/K of the corpus;
    larger K shrinks the probe set (the classic IVF recall/cost dial,
    measured in `scripts/bench_ann_recall.py`).

    ``k_cells``: coarse-quantizer cell count — None keeps the shared
    K_CLUSTERS default (tiny, pinned for the DuckDB oracle's exact
    k-means twin); production sizing is K ≈ √N so probe-1 candidate
    work is ~N/√N = √N per query (the FAISS IVF rule of thumb)."""
    from information_retrieval_spark.ops.ml import kmeans_assign, kmeans_centroids

    comp, cent = kmeans_centroids(spark, sf_dir, k_clusters=k_cells)
    assign = kmeans_assign(comp, cent)
    e = _emb(spark, sf_dir).join(assign, "vec_id")
    # per-query distance to every centroid → n_probe nearest cells
    qcomp = comp.filter(F.col("vec_id") < n_query)
    qdist = (
        qcomp.join(F.broadcast(cent), "dim")
        .groupBy(F.col("vec_id").alias("query_id"), "k")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.asc(F.round("d2", 9)), F.asc("k")
    )
    probes = (
        qdist.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", F.col("k").alias("cluster"))
    )
    q = _emb(spark, sf_dir).filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = (
        e.join(F.broadcast(probes), "cluster")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("qv"), F.col("embedding")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    return _rank_topk(cand.select("query_id", "vec_id", sim.alias("sim")), k)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, vec_id, sim_r): IVF ANN top-10 for the 5-query set
    at the library defaults (N_PROBE cells probed)."""
    return ivf_topk(spark, sf_dir)


def _sql_ann_ivf() -> str:
    from information_retrieval_spark.ops.ml import (
        KMEANS_ITERS,
        _sql_kmeans_ctes,
    )

    ctes = _sql_kmeans_ctes()
    last = f"c{KMEANS_ITERS}"
    ctes.append(
        f"""assign AS (
  SELECT vec_id, k AS cluster FROM (
    SELECT comp.vec_id, {last}.k,
      row_number() OVER (
        PARTITION BY comp.vec_id
        ORDER BY round(sum((comp.x - {last}.c) * (comp.x - {last}.c)), 9) ASC,
                 {last}.k ASC
      ) AS r
    FROM comp JOIN {last} ON comp.dim = {last}.dim
    GROUP BY comp.vec_id, {last}.k
  ) WHERE r = 1
)"""
    )
    ctes.append(
        f"""probes AS (
  SELECT query_id, k AS cluster FROM (
    SELECT comp.vec_id AS query_id, {last}.k,
      row_number() OVER (
        PARTITION BY comp.vec_id
        ORDER BY round(sum((comp.x - {last}.c) * (comp.x - {last}.c)), 9) ASC,
                 {last}.k ASC
      ) AS r
    FROM comp JOIN {last} ON comp.dim = {last}.dim
    WHERE comp.vec_id < {N_QUERY_VECS}
    GROUP BY comp.vec_id, {last}.k
  ) WHERE r <= {N_PROBE}
)"""
    )
    ctes.append(
        f"""ev AS (
  SELECT em.vec_id, em.embedding::DOUBLE[] AS v, a.cluster
  FROM embeddings em JOIN assign a ON em.vec_id = a.vec_id
)"""
    )
    ctes.append(
        f"""qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {N_QUERY_VECS}
)"""
    )
    ctes.append(
        """scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.v, e.v))) AS sim
  FROM ev e
  JOIN probes p ON e.cluster = p.cluster
  JOIN qv q ON q.query_id = p.query_id
  WHERE e.vec_id <> q.query_id
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT query_id, rank, vec_id, round(sim, 6) AS sim_r
FROM (
  SELECT query_id, vec_id, sim,
    row_number() OVER (
      PARTITION BY query_id ORDER BY round(sim, 9) DESC, vec_id ASC
    ) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""
    )


SQL_ANN_IVF_TOPK = _sql_ann_ivf()
