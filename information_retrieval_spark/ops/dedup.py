"""Deduplication operators for training-data pipelines.

Four tiers, each a single declarative Spark plan over ``documents`` with an
exact DuckDB SQL twin (driver correctness gate):

* **exact**      — md5(text) groupBy; canonical = min doc_id per hash group.
* **minhash**    — word-3-shingles → 16 portable minhashes → 4 bands of 4 →
                   band-bucket self-join → candidate pairs.
* **simhash**    — 32-bit simhash over term frequencies (bitwise majority of
                   per-term hashes weighted by tf).
* **jaccard**    — exact n-gram Jaccard ≥ τ via shingle-inverted-index
                   self-join (the verify stage downstream of minhash/LSH).

Scale notes (100 TB):
* exact: one hash-agg shuffle on a 16-byte key — the canonical first pass.
* minhash: signatures are per-doc maps (no shuffle); the band self-join
  shuffles on (band, bucket-hash) — bucket sizes are the skew hazard, so
  buckets larger than MAX_BAND_BUCKET bypass the quadratic self-join and
  emit star pairs (bucket-min doc ↔ each member) instead: a 1M-doc
  exact-duplicate cluster costs 1M−1 rows, not 10¹² — connectivity of the
  duplicate cluster is preserved for the downstream union-find/verify.
* jaccard: the shingle self-join explodes on hot shingles — we drop
  shingles with df > max_df via a LEFT ANTI join against a broadcast of
  the HOT shingle list (tiny by construction: ≤ |corpus|/max_df entries),
  the standard "common-shingle suppression" that bounds join fan-out.
  Broadcasting the kept (cold) set would be vocabulary-sized — the wrong
  side at 100 TB.

All hashing is the engine-portable md5-based ``portable_hash32`` so the
DuckDB oracle reproduces bucket assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from information_retrieval_spark.ops.common import portable_hash32, sql_hash32

N_HASHES = 16
N_BANDS = 4  # rows per band = N_HASHES / N_BANDS = 4
SHINGLE_W = 3
JACCARD_TAU = 0.5
MAX_SHINGLE_DF = 50  # suppress shingles present in > this many docs
MAX_BAND_BUCKET = 64  # LSH buckets above this emit star pairs, not all-pairs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- exact dup

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, canonical_id, group_size): exact-duplicate clustering by
    md5(text). One shuffle on the digest; min() picks the canonical doc."""
    d = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("h"))
    g = d.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return d.join(g, "h").select("doc_id", "canonical_id", "group_size")


SQL_DEDUP_EXACT = """
WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM d GROUP BY h)
SELECT d.doc_id, g.canonical_id, g.group_size FROM d JOIN g ON d.h = g.h
"""


# ----------------------------------------------------------------- shingles

def _shingles(d: DataFrame) -> DataFrame:
    """(doc_id, shingle): DISTINCT word-3-grams of the lowercased text.
    Built JVM-side: split → transform(sequence) → explode → distinct."""
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    sh = F.expr(
        "transform(sequence(1, greatest(size(words) - {w} + 1, 0)), "
        "i -> concat_ws(' ', slice(words, i, {w})))".format(w=SHINGLE_W)
    )
    return (
        d.withColumn("words", words)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id,
         array_to_string(words[i : i + {SHINGLE_W} - 1], ' ') AS shingle
  FROM (
    SELECT doc_id,
      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
    FROM documents
  ), unnest(generate_series(1, greatest(len(words) - {SHINGLE_W} + 1, 0))) AS t(i)
"""


# ------------------------------------------------------------------ minhash

def minhash_signatures(d: DataFrame) -> DataFrame:
    """(doc_id, hash_id, minhash) over a (doc_id, text) DataFrame.
    Each hash_id h uses min over shingles of hash32(h || '#' || shingle).
    Computed as shingles × 16-row literal hash-id table → groupBy(doc_id,
    hash_id) min — a single shuffle keyed (doc_id, hash_id)."""
    sh = _shingles(d)
    hid = d.sparkSession.range(N_HASHES).select(
        F.col("id").cast("int").alias("hash_id")
    )
    ex = sh.crossJoin(F.broadcast(hid))
    hv = portable_hash32(
        F.concat(F.col("hash_id").cast("string"), F.lit("#"), F.col("shingle"))
    )
    return (
        ex.withColumn("hv", hv)
        .groupBy("doc_id", "hash_id")
        .agg(F.min("hv").alias("minhash"))
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: 16 portable min-hashes per document."""
    return minhash_signatures(_docs(spark, sf_dir))


SQL_MINHASH_SIG = f"""
SELECT doc_id, hash_id, min(hv) AS minhash
FROM (
  SELECT s.doc_id, h.hash_id,
         {sql_hash32("h.hash_id::VARCHAR || '#' || s.shingle")} AS hv
  FROM ({SQL_SHINGLES}) s
  CROSS JOIN (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS hash_id) h
)
GROUP BY doc_id, hash_id
"""


def minhash_pairs(d: DataFrame, cap: int = MAX_BAND_BUCKET) -> DataFrame:
    """(a, b): LSH candidate pairs — docs sharing ≥1 identical band of 4
    consecutive minhashes, over a (doc_id, text) DataFrame.

    Skew guard: band-bucket sizes and the bucket-min come from ONE window
    over (band, band_key) — the same grain the pair self-join shuffles on.
    A window (vs the former aggregate + rejoin) sizes the buckets in a
    single exchange; co-locating a hot bucket on one task is inherent to
    ANY per-bucket computation and stays O(|bucket|) rows. Buckets ≤
    ``cap`` go through the pair self-join; larger buckets — near-certain
    duplicate clusters — emit star pairs (bucket-min doc, member)
    instead, bounding the output at O(|bucket|) and keeping the duplicate
    cluster connected for downstream verification/union-find. Star pairs
    keep the a < b orientation since the hub is the bucket minimum.
    """
    sig = minhash_signatures(d).withColumn(
        "band", (F.col("hash_id") / (N_HASHES // N_BANDS)).cast("int")
    )
    bands = sig.groupBy("doc_id", "band").agg(
        F.concat_ws(",", F.array_sort(F.collect_list(
            F.format_string("%02d:%d", "hash_id", "minhash")
        ))).alias("band_key")
    )
    wb = Window.partitionBy("band", "band_key")
    sized = bands.withColumn("bucket_n", F.count("*").over(wb)).withColumn(
        "min_doc", F.min("doc_id").over(wb)
    )
    small = sized.filter(F.col("bucket_n") <= cap).select(
        "doc_id", "band", "band_key"
    )
    a = small.alias("a")
    b = small.alias("b")
    pairs_small = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
    )
    pairs_star = (
        sized.filter(
            (F.col("bucket_n") > cap) & (F.col("doc_id") != F.col("min_doc"))
        )
        .select(F.col("min_doc").alias("a"), F.col("doc_id").alias("b"))
    )
    return pairs_small.unionByName(pairs_star).distinct()


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: LSH candidate pairs over documents."""
    return minhash_pairs(_docs(spark, sf_dir))


SQL_MINHASH_PAIRS = f"""
WITH sig AS ({SQL_MINHASH_SIG}),
bands AS (
  SELECT doc_id, (hash_id // {N_HASHES // N_BANDS}) AS band,
    array_to_string(
      list_sort(list(format('{{:02d}}:{{}}', hash_id, minhash))), ','
    ) AS band_key
  FROM sig GROUP BY doc_id, band
),
bsize AS (
  SELECT band, band_key, count(*) AS bucket_n, min(doc_id) AS min_doc
  FROM bands GROUP BY band, band_key
),
small AS (
  SELECT b.doc_id, b.band, b.band_key
  FROM bands b JOIN bsize s ON b.band = s.band AND b.band_key = s.band_key
  WHERE s.bucket_n <= {MAX_BAND_BUCKET}
)
SELECT DISTINCT a, b FROM (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM small a JOIN small b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  UNION ALL
  SELECT s.min_doc AS a, b.doc_id AS b
  FROM bands b JOIN bsize s ON b.band = s.band AND b.band_key = s.band_key
  WHERE s.bucket_n > {MAX_BAND_BUCKET} AND b.doc_id <> s.min_doc
)
"""


# ------------------------------------------------------------------ simhash

SIMHASH_BITS = 32


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over (term, tf) — bit b is set iff
    Σ_terms tf · sign(bit b of hash32(term)) > 0.

    Plan: tf hash-agg → per-doc bit-vector fold entirely in column
    expressions (shiftright/bitwise-and, 32 literal terms) → one groupBy
    per doc. No UDF, no per-bit explode (the 32-way expansion is unrolled
    into the aggregate expression so the shuffle stays at (doc_id) grain).
    """
    d = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    tf = (
        d.select("doc_id", F.explode(words).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("hv", portable_hash32(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tf.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def _sql_simhash_bits() -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    sel = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return sums, sel


_SQL_SIMHASH_SUMS, _SQL_SIMHASH_SEL = _sql_simhash_bits()

SQL_SIMHASH = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf,
         {sql_hash32("term")} AS hv
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents
  )
  WHERE term <> ''
  GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id,
    {_SQL_SIMHASH_SUMS}
  FROM tf GROUP BY doc_id
)
SELECT doc_id, ({_SQL_SIMHASH_SEL})::BIGINT AS simhash FROM bits
"""


# ----------------------------------------------------------- exact Jaccard

def jaccard_pairs(d: DataFrame) -> DataFrame:
    """(a, b, jaccard_r): exact word-3-shingle Jaccard for pairs ≥ τ, over
    a (doc_id, text) DataFrame.

    Inverted-index self-join: shingle → docs (df-capped to suppress hot
    shingles), pair-count intersection, |A∪B| = |A|+|B|−|∩|. The df cap
    bounds per-shingle fan-out to MAX_SHINGLE_DF² pairs — the knob that
    keeps this join feasible at corpus scale. The cap is applied as a
    LEFT ANTI join against a broadcast of the HOT shingles (df > cap):
    that list is at most |total shingle occurrences| / cap entries —
    small by construction — whereas the kept (cold) set is the whole
    shingle vocabulary and must never be broadcast.
    """
    sh = _shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    hot = sdf.filter(F.col("sdf") > MAX_SHINGLE_DF).select("shingle")
    keep = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = keep.alias("a")
    b = keep.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .withColumn(
            "jac", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .filter(F.col("jac") >= JACCARD_TAU)
    )
    return out.select("a", "b", F.round("jac", 6).alias("jaccard_r"))


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: exact n-gram Jaccard pairs over documents."""
    return jaccard_pairs(_docs(spark, sf_dir))


SQL_JACCARD_PAIRS = f"""
WITH sh AS ({SQL_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
sdf AS (SELECT shingle, count(*) AS sdf FROM sh GROUP BY shingle),
keep AS (SELECT sh.* FROM sh JOIN sdf ON sh.shingle = sdf.shingle
         WHERE sdf.sdf <= {MAX_SHINGLE_DF}),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
  FROM keep a JOIN keep b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a, i.b,
       round(i.inter::DOUBLE / (sa.n + sb.n - i.inter), 6) AS jaccard_r
FROM inter i
JOIN sizes sa ON i.a = sa.doc_id
JOIN sizes sb ON i.b = sb.doc_id
WHERE i.inter::DOUBLE / (sa.n + sb.n - i.inter) >= {JACCARD_TAU}
"""
