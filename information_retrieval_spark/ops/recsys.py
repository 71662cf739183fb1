"""Recommender parity ops (SURVEY.md §2.9 G7/G8), DuckDB-twinned.

* **G7 collaborative-filtering kNN** (`ir-phase-3.ipynb:c45`): the reference
  builds a user×field count matrix and finds cosine-nearest users. Here the
  user behavior matrix derives from ``events`` (event_type count vector per
  user — a pivot), and ``user_knn`` returns each user's top-5 cosine
  neighbors. Plan: one pivot agg + a self-join on the (tiny) user matrix;
  at real scale the self-join becomes LSH-bucketed exactly like
  ops/similarity.py.
* **G8 content-based recommendation** (`ir-phase-3.ipynb:c47`): user
  profile = mean embedding of the user's liked items; recommend unliked
  items by cosine. "Likes" are a deterministic pure function
  (hash32(u#v) % 17 == 0) so the whole evaluation is corpus-derived and
  value-checkable — the driver gate checks the MATH; real interaction data
  would drop in as a (user_id, vec_id) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from information_retrieval_spark.ops.common import portable_hash32, sql_hash32

KNN_K = 5
REC_K = 5
N_REC_USERS = 8  # user_id < 8 get recommendations
LIKE_MOD = 17
DIM = 64

#: loud ceiling for the EXACT all-pairs kNN (O(U²) — a verification
#: baseline, not a production path). Above this many users the call
#: raises and points at the LSH path instead of silently launching a
#: quadratic self-join; override via IR_EXACT_KNN_MAX_USERS for
#: deliberate large baselines.
EXACT_KNN_MAX_USERS = 50_000

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ------------------------------------------------------------- G7 user kNN

def _user_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, c0..c4, norm): the user × event_type count matrix."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    vec_cols = [
        F.sum((F.col("event_type") == t).cast("int")).alias(f"c{i}")
        for i, t in enumerate(EVENT_TYPES)
    ]
    m = e.groupBy("user_id").agg(*vec_cols)
    cs = [f"c{i}" for i in range(len(EVENT_TYPES))]
    norm = F.sqrt(sum(F.col(c) * F.col(c) for c in cs))
    return m.withColumn("norm", norm)


def q_user_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, rank, neighbor_id, sim_r): top-5 cosine neighbors over the
    user × event_type count matrix — EXACT all-pairs path, the small-N
    baseline (O(U²): fine for thousands of users, wrong at 10⁸ — that's
    ``q_user_knn_lsh``). Guarded: a capped probe (``limit(cap+1)``, never
    a full count) raises above ``EXACT_KNN_MAX_USERS`` so the quadratic
    join is unreachable by accident at scale."""
    import os

    m = _user_matrix(spark, sf_dir)
    cap = int(
        os.environ.get("IR_EXACT_KNN_MAX_USERS", EXACT_KNN_MAX_USERS)
    )
    if m.limit(cap + 1).count() > cap:
        raise ValueError(
            f"user_knn is the EXACT O(U²) verification baseline and the "
            f"user matrix exceeds {cap} rows — use q_user_knn_lsh (SRP-"
            f"bucketed) at this scale, or raise IR_EXACT_KNN_MAX_USERS "
            f"to force the all-pairs join deliberately"
        )
    cs = [f"c{i}" for i in range(len(EVENT_TYPES))]
    a, b = m.alias("a"), m.alias("b")
    dot = sum(F.col(f"a.{c}") * F.col(f"b.{c}") for c in cs)
    sim = dot / (F.col("a.norm") * F.col("b.norm"))
    pairs = (
        a.join(b, F.col("a.user_id") != F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("b.user_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.round("sim", 9)), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("user_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim_r"))
    )


_PIVOT = ",\n    ".join(
    f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS c{i}"
    for i, t in enumerate(EVENT_TYPES)
)
_DOT = " + ".join(f"a.c{i} * b.c{i}" for i in range(len(EVENT_TYPES)))
_NORM_A = " + ".join(f"a.c{i} * a.c{i}" for i in range(len(EVENT_TYPES)))
_NORM_B = " + ".join(f"b.c{i} * b.c{i}" for i in range(len(EVENT_TYPES)))

SQL_USER_KNN = f"""
WITH m AS (
  SELECT user_id,
    {_PIVOT}
  FROM events GROUP BY user_id
),
pairs AS (
  SELECT a.user_id, b.user_id AS neighbor_id,
         ({_DOT})::DOUBLE / (sqrt(({_NORM_A})::DOUBLE) * sqrt(({_NORM_B})::DOUBLE)) AS sim
  FROM m a JOIN m b ON a.user_id <> b.user_id
)
SELECT user_id, rank, neighbor_id, round(sim, 6) AS sim_r
FROM (
  SELECT user_id, neighbor_id, sim,
    row_number() OVER (
      PARTITION BY user_id ORDER BY round(sim, 9) DESC, neighbor_id ASC
    ) AS rank
  FROM pairs
)
WHERE rank <= {KNN_K}
"""


# ------------------------------------------------ G7 LSH-bucketed user kNN

KNN_TABLES = 4
KNN_BITS_MIN = 4
KNN_BITS_MAX = 12
KNN_TARGET_BUCKET = 64  # aim for ~this many users per (table, bucket)
_NDIM = len(EVENT_TYPES)


def _knn_bits(n_users: int) -> int:
    """SRP bits for this user count: 2^B ≈ n_users / KNN_TARGET_BUCKET so
    the expected bucket size stays CONSTANT as the user base grows —
    candidate volume is then O(U · tables · (B+1) · bucket), i.e. linear
    in U up to the log factor, instead of the quadratic collapse a fixed
    B suffers (fixed 4 bits measured 208s at 15k users; adaptive ~linear).
    Integer bit-length keeps the rule portably computable in SQL
    (length of the binary rendering — no float log2 boundary risk)."""
    return min(
        KNN_BITS_MAX,
        max(KNN_BITS_MIN, max(1, n_users // KNN_TARGET_BUCKET).bit_length()),
    )


def _knn_bucket_expr(t: int, bits: int):
    """SRP bucket for LSH table ``t`` as a pure column expression over the
    literal c0..c4 columns, MEAN-CENTERED (m0..m4 columns): count vectors
    are all-positive and low-dimensional, so hyperplanes through the
    origin barely separate them — most users collapse into a handful of
    buckets and the candidate self-join degenerates toward all-pairs.
    Centering on the per-dimension mean spreads the signs (measured at
    sf0.1: 18.5s → ~1s for the whole query). Hyperplane coefficients are
    portable-hash constants (same formula as ops/similarity.py), sign
    tested on round(p, 9) for cross-engine determinism."""
    bucket = None
    for b in range(bits):
        p = None
        for i in range(_NDIM):
            coef = portable_hash32(F.lit(f"u{t}p{b}d{i}")) / F.lit(
                float(1 << 31)
            ) - 1.0
            term = (F.col(f"c{i}").cast("double") - F.col(f"m{i}")) * coef
            p = term if p is None else p + term
        bit = F.when(F.round(p, 9) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def q_user_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, rank, neighbor_id, sim_r): approximate top-5 cosine
    neighbors via multi-table SRP LSH over the user count matrix — the
    scale path for G7 (the exact all-pairs self-join is O(U²)).

    Plan: pivot → mean-centering (one-row broadcast) → per-table bucket
    columns (pure expressions) → explode to (user, tbl, bucket) →
    Hamming-1 multi-probe → candidate self-join keyed on (tbl, bucket) —
    an equi hash join, NOT a nested loop — → ID pairs deduped as two
    longs → exact cosine rerank with the (small) matrix broadcast back →
    per-user window top-5. Per-user work ~ L·(BITS+1)/2^BITS of the user
    base instead of all of it.

    Regime note: the synthetic event counts are locality-FREE (every
    user's vector points near the same mean direction), which is LSH's
    worst case — hitting the recall target there forces probe coverage
    toward all-pairs. On real behavioral data with genuine clusters the
    same parameters prune aggressively; for small user bases the exact
    ``q_user_knn`` is the right tool regardless.

    The bit count ADAPTS to the user base (``_knn_bits``: 2^B ≈ U/64):
    fixed bits make the candidate self-join quadratic again as U grows.
    """
    m = _user_matrix(spark, sf_dir)
    bits = _knn_bits(m.count())
    cs = [f"c{i}" for i in range(_NDIM)]
    means = m.agg(
        *[F.avg(F.col(f"c{i}")).alias(f"m{i}") for i in range(_NDIM)]
    )
    mm = m.crossJoin(F.broadcast(means))
    tb = mm.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _knn_bucket_expr(t, bits).alias("bucket"),
                    )
                    for t in range(KNN_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("user_id", F.col("tb.tbl"), F.col("tb.bucket"))
    probes = tb.select(
        F.col("user_id").alias("q_user"),
        "tbl",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << b))
                    for b in range(bits)
                ],
            )
        ).alias("bucket"),
    )
    # dedup ID PAIRS before attaching vectors: the candidate stream is the
    # big intermediate, so it travels as two longs, and the (small) user
    # matrix is broadcast back for the exact cosine rerank
    cand = (
        tb.join(probes, ["tbl", "bucket"])
        .filter(F.col("user_id") != F.col("q_user"))
        .select(
            F.col("q_user").alias("user_id"),
            F.col("user_id").alias("neighbor_id"),
        )
        .distinct()
    )
    qside = m.select(
        "user_id",
        *[F.col(c).alias(f"q{c}") for c in cs],
        F.col("norm").alias("q_norm"),
    )
    nside = m.select(
        F.col("user_id").alias("neighbor_id"), *cs, "norm"
    )
    dot = sum(
        F.col(f"qc{i}").cast("double") * F.col(f"c{i}").cast("double")
        for i in range(_NDIM)
    )
    scored = (
        cand.join(F.broadcast(qside), "user_id")
        .join(F.broadcast(nside), "neighbor_id")
        .withColumn("sim", dot / (F.col("q_norm") * F.col("norm")))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.round("sim", 9)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select(
            "user_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim_r")
        )
    )


def _sql_knn_bucket(t: int) -> str:
    """Raw KNN_BITS_MAX-bit SRP bucket; the adaptive bit count is applied
    afterwards by masking the low bits (identical to building only the
    first B hyperplanes, since bit b carries weight 1 << b)."""
    bits = []
    for b in range(KNN_BITS_MAX):
        terms = " + ".join(
            f"(c{i}::DOUBLE - m{i}) * ({sql_hash32(repr(f'u{t}p{b}d{i}'))}"
            f" / {float(1 << 31)} - 1.0)"
            for i in range(_NDIM)
        )
        bits.append(f"(CASE WHEN round({terms}, 9) > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")::BIGINT"


def _sql_user_knn_lsh() -> str:
    tb_selects = "\n  UNION ALL ".join(
        f"SELECT user_id, {t} AS tbl, {_sql_knn_bucket(t)} AS raw FROM m2"
        for t in range(KNN_TABLES)
    )
    dot = " + ".join(f"q.c{i}::DOUBLE * n.c{i}::DOUBLE" for i in range(_NDIM))
    qnorm = " + ".join(f"q.c{i} * q.c{i}" for i in range(_NDIM))
    tnorm = " + ".join(f"n.c{i} * n.c{i}" for i in range(_NDIM))
    means = ", ".join(f"avg(c{i}) AS m{i}" for i in range(_NDIM))
    # _knn_bits in SQL: bit_length(max(1, U // target)) clamped — the
    # binary-string length is DuckDB's integer bit_length
    nb = (
        f"greatest({KNN_BITS_MIN}, least({KNN_BITS_MAX}, "
        f"length(format('{{:b}}', greatest(1, count(*) // "
        f"{KNN_TARGET_BUCKET})))))"
    )
    return f"""
WITH m AS (
  SELECT user_id,
    {_PIVOT}
  FROM events GROUP BY user_id
),
nb AS (SELECT {nb} AS bits FROM m),
means AS (SELECT {means} FROM m),
m2 AS (SELECT m.*, means.* FROM m CROSS JOIN means),
tb AS (
  SELECT user_id, tbl, raw & ((1::BIGINT << nb.bits) - 1) AS bucket
  FROM ({tb_selects}) CROSS JOIN nb
),
probes AS (
  SELECT user_id AS q_user, tbl,
         CASE WHEN f.bit = -1 THEN bucket
              ELSE xor(bucket, (1::BIGINT << f.bit)) END AS bucket
  FROM tb CROSS JOIN nb,
       (SELECT unnest(generate_series(-1, {KNN_BITS_MAX - 1})) AS bit) f
  WHERE f.bit < nb.bits
),
cand AS (
  SELECT DISTINCT c.q_user AS user_id, t.user_id AS neighbor_id
  FROM probes c JOIN tb t ON c.tbl = t.tbl AND c.bucket = t.bucket
  WHERE t.user_id <> c.q_user
),
scored AS (
  SELECT cand.user_id, cand.neighbor_id,
         ({dot}) / (sqrt(({qnorm})::DOUBLE) * sqrt(({tnorm})::DOUBLE)) AS sim
  FROM cand
  JOIN m q ON cand.user_id = q.user_id
  JOIN m n ON cand.neighbor_id = n.user_id
)
SELECT user_id, rank, neighbor_id, round(sim, 6) AS sim_r
FROM (
  SELECT user_id, neighbor_id, sim,
    row_number() OVER (
      PARTITION BY user_id ORDER BY round(sim, 9) DESC, neighbor_id ASC
    ) AS rank
  FROM scored
)
WHERE rank <= {KNN_K}
"""


SQL_USER_KNN_LSH = _sql_user_knn_lsh()


# --------------------------------------------------- G8 content-based recs

def _likes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, vec_id): deterministic synthetic interactions — each user
    likes ~V/LIKE_MOD items, vec_id = (u·7919 + j·LIKE_MOD) mod V for
    j < V//LIKE_MOD, generated by EXPLODING a per-user index sequence.
    The previous definition cross-joined users × all items and kept a
    hash residue — a CartesianProduct in every consuming plan, O(U·V) at
    scale; the explode emits exactly the liked rows (fixture cost ∝
    |likes|). vec_ids are contiguous 0..V-1 in the fixture tables."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct()
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    n_like = max(1, n_vec // LIKE_MOD)
    return (
        e.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(n_like - 1))))
        .select(
            "user_id",
            (
                (F.col("user_id") * 7919 + F.col("j") * LIKE_MOD) % n_vec
            ).alias("vec_id"),
        )
        .distinct()
    )


def q_content_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, rank, vec_id, sim_r): cosine of each unliked item against
    the user's mean-of-liked-embeddings profile, top-5, for user_id <
    N_REC_USERS. explode(embedding) keeps profile building as plain aggs."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    likes = _likes(spark, sf_dir).filter(F.col("user_id") < N_REC_USERS)
    profile = (
        likes.join(comp, "vec_id")
        .groupBy("user_id", "dim")
        .agg(F.avg("x").alias("p"))
    )
    pnorm = profile.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("p") * F.col("p"))).alias("pnorm")
    )
    vnorm = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("vnorm")
    )
    dots = (
        comp.join(F.broadcast(profile), "dim")
        .withColumn("px", F.col("p") * F.col("x"))
        .groupBy("user_id", "vec_id")
        .agg(F.sum("px").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(pnorm), "user_id")
        .join(vnorm, "vec_id")
        .withColumn("sim", F.col("dot") / (F.col("pnorm") * F.col("vnorm")))
        .join(likes, ["user_id", "vec_id"], "left_anti")  # unliked only
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.round("sim", 9)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= REC_K)
        .select("user_id", "rank", "vec_id", F.round("sim", 6).alias("sim_r"))
    )


SQL_CONTENT_RECS = f"""
WITH users AS (SELECT DISTINCT user_id FROM events WHERE user_id < {N_REC_USERS}),
nn AS (SELECT count(*) AS v, greatest(1, count(*) // {LIKE_MOD}) AS l
       FROM embeddings),
likes AS (
  SELECT DISTINCT u.user_id,
         (u.user_id * 7919 + j.j * {LIKE_MOD}) % nn.v AS vec_id
  FROM users u
  CROSS JOIN nn
  JOIN (SELECT vec_id AS j FROM embeddings) j ON j.j < nn.l
),
comp AS (
  SELECT vec_id, (i - 1) AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, {DIM})) AS t(i)
),
profile AS (
  SELECT l.user_id, c.dim, avg(c.x) AS p
  FROM likes l JOIN comp c ON l.vec_id = c.vec_id
  GROUP BY l.user_id, c.dim
),
pnorm AS (SELECT user_id, sqrt(sum(p * p)) AS pnorm FROM profile GROUP BY user_id),
vnorm AS (SELECT vec_id, sqrt(sum(x * x)) AS vnorm FROM comp GROUP BY vec_id),
dots AS (
  SELECT pr.user_id, c.vec_id, sum(pr.p * c.x) AS dot
  FROM comp c JOIN profile pr ON c.dim = pr.dim
  GROUP BY pr.user_id, c.vec_id
),
scored AS (
  SELECT d.user_id, d.vec_id, d.dot / (pn.pnorm * vn.vnorm) AS sim
  FROM dots d
  JOIN pnorm pn ON d.user_id = pn.user_id
  JOIN vnorm vn ON d.vec_id = vn.vec_id
  LEFT JOIN likes l ON d.user_id = l.user_id AND d.vec_id = l.vec_id
  WHERE l.vec_id IS NULL
)
SELECT user_id, rank, vec_id, round(sim, 6) AS sim_r
FROM (
  SELECT user_id, vec_id, sim,
    row_number() OVER (
      PARTITION BY user_id ORDER BY round(sim, 9) DESC, vec_id ASC
    ) AS rank
  FROM scored
)
WHERE rank <= {REC_K}
"""
