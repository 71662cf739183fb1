"""Classification + clustering parity ops (SURVEY.md §2.9 G3/G5),
re-expressed as declarative Spark plans with DuckDB twins.

* **Naive Bayes** (G5, `ir-phase-2.ipynb:c22`): multinomial with Laplace
  α=1, trained on (term counts → lang) over ``documents`` and applied back
  to the corpus (self-classification — the driver gate checks the math,
  pytest checks accuracy > majority-class baseline is NOT expected since
  the synthetic text is language-independent; determinism is the contract).
  Everything is two hash-aggs + a broadcast grid join: the model IS a
  (term × class) log-prob table.
* **k-means** (G3, `ui/backend/mir/clustering/clustering.py:11-53`): K=4,
  FIXED 3 iterations (deterministic init = vectors of vec_id 0..3), L2
  assignment with (dist, cluster) tie-break, mean update — the fixed
  iteration count lets the SQL oracle unroll the recurrence exactly like
  PageRank's. Reference uses random init + allclose stop; we pin both for
  rank-identity (documented deviation).

Scale notes: NB model size = |vocab|×|classes| (broadcast); k-means
iterations shuffle on (cluster, dim) — K·DIM rows — while assignments
shuffle on vec_id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

K_CLUSTERS = 4
KMEANS_ITERS = 3
DIM = 64


# ------------------------------------------------------------- Naive Bayes

def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pred_lang): multinomial NB with Laplace 1 smoothing,
    features = simple-token counts, classes = ``lang``."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    tf = (
        d.select("doc_id", "lang", F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "lang", "term")
        .agg(F.count("*").alias("tf"))
    ).localCheckpoint()

    n_docs = d.count()
    priors = (
        d.groupBy("lang")
        .agg(F.count("*").alias("nc"))
        .select("lang", F.log(F.col("nc") / F.lit(float(n_docs))).alias("log_prior"))
    )
    vocab = tf.select("term").distinct()
    v_size = vocab.count()
    class_term = tf.groupBy("lang", "term").agg(F.sum("tf").alias("ct"))
    class_tot = class_term.groupBy("lang").agg(F.sum("ct").alias("tot"))
    # full vocab × class grid with Laplace smoothing
    grid = (
        vocab.crossJoin(class_tot)
        .join(class_term, ["lang", "term"], "left")
        .withColumn("ct", F.coalesce(F.col("ct"), F.lit(0)))
        .select(
            "term",
            F.col("lang").alias("cls"),
            F.log(
                (F.col("ct") + 1.0) / (F.col("tot") + F.lit(float(v_size)))
            ).alias("log_p"),
        )
    )
    scores = (
        tf.select("doc_id", "term", "tf")
        .join(F.broadcast(grid), "term")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("tf") * F.col("log_p")).alias("ll"))
        .join(F.broadcast(priors.withColumnRenamed("lang", "cls")), "cls")
        .withColumn("score", F.col("ll") + F.col("log_prior"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("score", 9)), F.asc("cls")
    )
    return (
        scores.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("doc_id", F.col("cls").alias("pred_lang"))
    )


SQL_NAIVE_BAYES = """
WITH tf AS (
  SELECT doc_id, lang, term, count(*) AS tf
  FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents
  )
  WHERE term <> ''
  GROUP BY doc_id, lang, term
),
nd AS (SELECT count(*) AS n_docs FROM documents),
priors AS (
  SELECT lang, ln(count(*)::DOUBLE / nd.n_docs) AS log_prior
  FROM documents, nd GROUP BY lang, nd.n_docs
),
vocab AS (SELECT DISTINCT term FROM tf),
vs AS (SELECT count(*) AS v FROM vocab),
class_term AS (SELECT lang, term, sum(tf) AS ct FROM tf GROUP BY lang, term),
class_tot AS (SELECT lang, sum(ct) AS tot FROM class_term GROUP BY lang),
grid AS (
  SELECT v.term, t.lang AS cls,
         ln((coalesce(c.ct, 0) + 1.0) / (t.tot + vs.v)) AS log_p
  FROM vocab v
  CROSS JOIN class_tot t
  CROSS JOIN vs
  LEFT JOIN class_term c ON c.lang = t.lang AND c.term = v.term
),
scores AS (
  SELECT f.doc_id, g.cls, sum(f.tf * g.log_p) + any_value(p.log_prior) AS score
  FROM tf f
  JOIN grid g ON f.term = g.term
  JOIN priors p ON p.lang = g.cls
  GROUP BY f.doc_id, g.cls
)
SELECT doc_id, cls AS pred_lang FROM (
  SELECT doc_id, cls,
    row_number() OVER (
      PARTITION BY doc_id ORDER BY round(score, 9) DESC, cls ASC
    ) AS r
  FROM scores
) WHERE r = 1
"""


# ---------------------------------------------------------------- k-means

def kmeans_centroids(
    spark: SparkSession,
    sf_dir: str,
    k_clusters: int | None = None,
    iters: int | None = None,
):
    """(comp, centroids): the exploded component table and the centroid
    table after ``iters`` (default KMEANS_ITERS) Lloyd iterations, init =
    vectors of vec_id 0..K-1. Shared by q_kmeans (at the K_CLUSTERS
    default, pinned for the DuckDB oracle) and the IVF ANN coarse
    quantizer, whose production dial is K ≈ √N cells
    (`similarity.ivf_topk(k_cells=...)`, measured in
    `scripts/bench_ann_recall.py`)."""
    k_clusters = K_CLUSTERS if k_clusters is None else int(k_clusters)
    iters = KMEANS_ITERS if iters is None else int(iters)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comp = (
        e.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .withColumn("x", F.col("x").cast("double"))
        .localCheckpoint()
    )
    cent = (
        comp.filter(F.col("vec_id") < k_clusters)
        .select(F.col("vec_id").cast("int").alias("k"), "dim", F.col("x").alias("c"))
    )
    from pyspark.sql import Window

    for _ in range(iters):
        dist = (
            comp.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "k")
            .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.asc(F.round("d2", 9)), F.asc("k")
        )
        assign = (
            dist.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("vec_id", "k")
        )
        cent = (
            comp.join(assign, "vec_id")
            .groupBy("k", "dim")
            .agg(F.avg("x").alias("c"))
        ).localCheckpoint()
    return comp, cent


def kmeans_assign(comp: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cluster): nearest-centroid assignment, tie → k asc."""
    from pyspark.sql import Window

    dist = (
        comp.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "k")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc(F.round("d2", 9)), F.asc("k"))
    return (
        dist.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", F.col("k").alias("cluster"))
    )


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster): assignment after KMEANS_ITERS Lloyd iterations,
    centroids initialized to the vectors of vec_id 0..K-1."""
    comp, cent = kmeans_centroids(spark, sf_dir)
    return kmeans_assign(comp, cent)


def _sql_kmeans_ctes() -> list[str]:
    cte = [
        f"""comp AS (
  SELECT vec_id, (i - 1) AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, {DIM})) AS t(i)
)""",
        f"""c0 AS (
  SELECT vec_id::INT AS k, dim, x AS c FROM comp WHERE vec_id < {K_CLUSTERS}
)""",
    ]
    for i in range(KMEANS_ITERS):
        prev, cur = f"c{i}", f"c{i + 1}"
        cte.append(
            f"""a{i} AS (
  SELECT vec_id, k FROM (
    SELECT comp.vec_id, {prev}.k,
      row_number() OVER (
        PARTITION BY comp.vec_id
        ORDER BY round(sum((comp.x - {prev}.c) * (comp.x - {prev}.c)), 9) ASC,
                 {prev}.k ASC
      ) AS r
    FROM comp JOIN {prev} ON comp.dim = {prev}.dim
    GROUP BY comp.vec_id, {prev}.k
  ) WHERE r = 1
)"""
        )
        cte.append(
            f"""{cur} AS (
  SELECT a.k, comp.dim, avg(comp.x) AS c
  FROM comp JOIN a{i} a ON comp.vec_id = a.vec_id
  GROUP BY a.k, comp.dim
)"""
        )
    return cte


def _sql_kmeans() -> str:
    cte = _sql_kmeans_ctes()
    last = f"c{KMEANS_ITERS}"
    return (
        "WITH "
        + ",\n".join(cte)
        + f"""
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
"""
    )


SQL_KMEANS = _sql_kmeans()


# ------------------------------------------- purity / confusion matrix (A9)

def q_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster, label, n, purity_r): k-means cluster evaluation — the
    label × cluster confusion matrix plus global purity
    Σ_c max_l n(c,l) / N (reference `ir-phase-2.ipynb:c160:3-20`), the
    purity repeated on every row so the value hash pins it. Two tiny
    hash-aggs over the assignment; no driver-side math."""
    lab = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    )
    conf = (
        q_kmeans(spark, sf_dir)
        .join(lab, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("n"))
    )
    scalars = (
        conf.groupBy("cluster")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").alias("num"))
        .crossJoin(conf.agg(F.sum("n").alias("tot")))
    )
    return conf.crossJoin(F.broadcast(scalars)).select(
        "cluster",
        "label",
        "n",
        F.round(F.col("num") / F.col("tot"), 6).alias("purity_r"),
    )


def _sql_purity() -> str:
    cte = _sql_kmeans_ctes()
    last = f"c{KMEANS_ITERS}"
    cte.append(
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
    cte.append(
        """conf AS (
  SELECT a.cluster, e.label, count(*) AS n
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY a.cluster, e.label
)"""
    )
    cte.append(
        "sc AS (SELECT (SELECT sum(mx) FROM (SELECT max(n) AS mx FROM conf"
        " GROUP BY cluster))::DOUBLE / (SELECT sum(n) FROM conf) AS purity)"
    )
    return (
        "WITH " + ",\n".join(cte)
        + """
SELECT conf.cluster, conf.label, conf.n, round(sc.purity, 6) AS purity_r
FROM conf CROSS JOIN sc
"""
    )


SQL_PURITY = _sql_purity()


# -------------------------------------------- PLSA topic model (G4 analogue)

N_TOPICS = 4
PLSA_ITERS = 3


def q_plsa_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, main_topic, p_r): per-document main topic after PLSA_ITERS
    EM iterations of PLSA over simple-token counts.

    Reference G4 runs sklearn LDA for a per-doc main topic
    (`ui/backend/mir/clustering/preprocess.py:34-61`); LDA's Gibbs/
    variational fits are nondeterministic across library versions, so —
    same policy as the spaCy tokenizer swap (SURVEY §1.4) — the engine
    ships PLSA (LDA without Dirichlet priors) with pinned deterministic
    init and a FIXED iteration count, making the fit value-checkable by an
    unrolled SQL twin exactly like k-means/PageRank.

      E: r(d,w,z) ∝ p(z|d)·p(w|z)
      M: p(z|d) ∝ Σ_w n(d,w)·r;  p(w|z) ∝ Σ_d n(d,w)·r

    Init: p(w|z) ∝ portable_hash32(w#z) % 1000 + 1 (per-topic normalized),
    p(z|d) uniform. Scale notes: per iteration one (d,w)-grain window
    normalize + two hash-aggs; the p(w|z) table is vocab×T (broadcast),
    p(z|d) shuffles on doc_id only.
    """
    from information_retrieval_spark.ops.common import portable_hash32
    from pyspark.sql import Window

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    tf = (
        d.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    z = spark.range(N_TOPICS).select(F.col("id").cast("int").alias("z"))
    wz = Window.partitionBy("z")
    pwz = (
        tf.select("term").distinct()
        .crossJoin(F.broadcast(z))
        .withColumn(
            "s",
            (
                portable_hash32(
                    F.concat(F.col("term"), F.lit("#"), F.col("z").cast("string"))
                )
                % 1000
                + 1
            ).cast("double"),
        )
        .withColumn("pwz", F.col("s") / F.sum("s").over(wz))
        .select("term", "z", "pwz")
    )
    pzd = (
        tf.select("doc_id").distinct()
        .crossJoin(F.broadcast(z))
        .withColumn("pzd", F.lit(1.0 / N_TOPICS))
    )
    wdw = Window.partitionBy("doc_id", "term")
    wd = Window.partitionBy("doc_id")
    for _ in range(PLSA_ITERS):
        joint = (
            tf.join(pzd, "doc_id")
            .join(F.broadcast(pwz), ["term", "z"])
            .withColumn("q", F.col("pzd") * F.col("pwz"))
            .withColumn("r", F.col("q") / F.sum("q").over(wdw))
            .select("doc_id", "term", "z", "n", "r")
            .localCheckpoint()
        )
        num = joint.groupBy("doc_id", "z").agg(
            F.sum(F.col("n") * F.col("r")).alias("s")
        )
        pzd = num.withColumn("pzd", F.col("s") / F.sum("s").over(wd)).select(
            "doc_id", "z", "pzd"
        )
        wnum = joint.groupBy("term", "z").agg(
            F.sum(F.col("n") * F.col("r")).alias("s")
        )
        pwz = wnum.withColumn("pwz", F.col("s") / F.sum("s").over(wz)).select(
            "term", "z", "pwz"
        )
    wtop = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("pzd", 9)), F.asc("z")
    )
    return (
        pzd.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("z").alias("main_topic"),
            F.round("pzd", 6).alias("p_r"),
        )
    )


def _sql_plsa() -> str:
    from information_retrieval_spark.ops.common import sql_hash32

    cte = [
        """tf AS MATERIALIZED (
  SELECT doc_id, term, count(*) AS n
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents
  )
  WHERE term <> ''
  GROUP BY doc_id, term
)""",
        f"zz AS (SELECT unnest(generate_series(0, {N_TOPICS - 1}))::INT AS z)",
        f"""pwz0 AS MATERIALIZED (
  SELECT term, z, s / sum(s) OVER (PARTITION BY z) AS pwz FROM (
    SELECT v.term, zz.z,
           ({sql_hash32("v.term || '#' || zz.z::VARCHAR")} % 1000 + 1)::DOUBLE AS s
    FROM (SELECT DISTINCT term FROM tf) v CROSS JOIN zz
  )
)""",
        f"""pzd0 AS MATERIALIZED (
  SELECT doc_id, z, 1.0::DOUBLE / {N_TOPICS} AS pzd
  FROM (SELECT DISTINCT doc_id FROM tf) CROSS JOIN zz
)""",
    ]
    for i in range(1, PLSA_ITERS + 1):
        p = i - 1
        cte.append(
            f"""joint{i} AS MATERIALIZED (
  SELECT doc_id, term, z, n,
         q / sum(q) OVER (PARTITION BY doc_id, term) AS r
  FROM (
    SELECT tf.doc_id, tf.term, d.z, tf.n, d.pzd * w.pwz AS q
    FROM tf
    JOIN pzd{p} d ON tf.doc_id = d.doc_id
    JOIN pwz{p} w ON tf.term = w.term AND d.z = w.z
  )
)"""
        )
        cte.append(
            f"""pzd{i} AS MATERIALIZED (
  SELECT doc_id, z, s / sum(s) OVER (PARTITION BY doc_id) AS pzd FROM (
    SELECT doc_id, z, sum(n * r) AS s FROM joint{i} GROUP BY doc_id, z
  )
)"""
        )
        cte.append(
            f"""pwz{i} AS MATERIALIZED (
  SELECT term, z, s / sum(s) OVER (PARTITION BY z) AS pwz FROM (
    SELECT term, z, sum(n * r) AS s FROM joint{i} GROUP BY term, z
  )
)"""
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
SELECT doc_id, z AS main_topic, round(pzd, 6) AS p_r FROM (
  SELECT doc_id, z, pzd,
    row_number() OVER (
      PARTITION BY doc_id ORDER BY round(pzd, 9) DESC, z ASC
    ) AS rk
  FROM pzd{PLSA_ITERS}
) WHERE rk = 1
"""
    )


SQL_PLSA_TOPICS = _sql_plsa()


# ------------------------------- per-cluster main topic (G4 feature space)

TOPIC_TOP = 5  # reference keeps topic_words[:5] (preprocess.py:59)


def q_cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster, rank, ngram, cnt): top-5 1-3gram features per k-means
    cluster — the reference's per-cluster "main topic"
    (`ui/backend/mir/clustering/preprocess.py:34-61`: CountVectorizer
    (ngram_range=(1,3)) over the cluster's documents, then a SINGLE-topic
    sklearn LDA whose components_[0] ordering degenerates to total n-gram
    frequency — with one topic every word's unnormalized topic weight is
    its corpus count plus a constant prior). The engine therefore computes
    that ranking directly and deterministically: total occurrence count
    per (cluster, 1-3gram), ties broken ngram-ascending (the reference's
    tie order is an argsort artifact of sklearn's feature ordering; pinned
    here by spec, same policy as the tokenizer swap, SURVEY §1.4). The
    reference joins the top five into one string — kept as ranked rows
    here (strictly more information, and value-checkable).

    Plan shape: embeddings k-means assignment (shared Lloyd iterations) ⨝
    documents on the aligned id space; n-grams built JVM-side as array
    expressions (transform over sequence — no shuffle, no UDF); one
    (cluster, ngram) hash-agg; K×5-row top window. The n-gram explode is
    ~3× the token stream — map-side only; at 100 TB the single wide
    shuffle keys on (cluster, ngram), vocabulary-grain, AQE-coalesced.
    """
    from information_retrieval_spark.ops.common import SPLIT

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assign = q_kmeans(spark, sf_dir)  # (vec_id, cluster)
    a = F.filter(
        F.split(F.lower(F.col("text")), SPLIT), lambda x: x != ""
    )
    empty = F.array().cast("array<string>")
    grams = d.select("doc_id", a.alias("a")).select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("a"),
                F.when(
                    F.size("a") >= 2,
                    F.expr(
                        "transform(sequence(0, size(a) - 2),"
                        " i -> concat(a[i], ' ', a[i+1]))"
                    ),
                ).otherwise(empty),
                F.when(
                    F.size("a") >= 3,
                    F.expr(
                        "transform(sequence(0, size(a) - 3),"
                        " i -> concat(a[i], ' ', a[i+1], ' ', a[i+2]))"
                    ),
                ).otherwise(empty),
            )
        ).alias("ngram"),
    )
    cnt = (
        grams.join(assign, grams.doc_id == assign.vec_id)
        .groupBy("cluster", "ngram")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(F.desc("cnt"), F.asc("ngram"))
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPIC_TOP)
        .select("cluster", "rank", "ngram", "cnt")
    )


def _sql_cluster_topics() -> str:
    """DuckDB twin: the same k-means assignment CTEs, then RELATIONAL
    n-gram construction (pos+1 / pos+2 self-joins over the positional
    token stream — a deliberately different implementation from Spark's
    array expressions agreeing on the same values)."""
    cte = _sql_kmeans_ctes()
    last = f"c{KMEANS_ITERS}"
    cte.append(
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
    cte.append(
        """toks AS MATERIALIZED (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term,
           unnest(range(len(string_split_regex(lower(text), '[^a-z0-9]+'))))
             AS pos
    FROM documents
  ) WHERE term <> ''
)"""
    )
    cte.append(
        """ng AS (
  SELECT doc_id, term AS ngram FROM toks
  UNION ALL
  SELECT t1.doc_id, t1.term || ' ' || t2.term
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  UNION ALL
  SELECT t1.doc_id, t1.term || ' ' || t2.term || ' ' || t3.term
  FROM toks t1
  JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
)"""
    )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"""
SELECT cluster, rank, ngram, cnt FROM (
  SELECT cluster, ngram, cnt,
    row_number() OVER (
      PARTITION BY cluster ORDER BY cnt DESC, ngram ASC
    ) AS rank
  FROM (
    SELECT a.cluster, ng.ngram, count(*) AS cnt
    FROM ng JOIN assign a ON ng.doc_id = a.vec_id
    GROUP BY a.cluster, ng.ngram
  )
) WHERE rank <= {TOPIC_TOP}
"""
    )


SQL_CLUSTER_TOPICS = _sql_cluster_topics()
