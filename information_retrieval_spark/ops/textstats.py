"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

Each op is one declarative Spark plan over ``documents`` (no UDFs — all
built-in string/regex functions, whole-stage codegen) with an exact DuckDB
SQL twin for the driver's correctness gate.

Scale notes: all of these are embarrassingly parallel per-row maps — no
shuffle at all except the final (absent) write. At 100 TB they run at scan
speed with full column pruning (only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from information_retrieval_spark.ops.common import portable_hash32, sql_hash32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ------------------------------------------------------------ token counts

# BPE-ish pre-tokenization: letter runs, digit runs, or single non-space
# symbols (the GPT-2 pretokenizer family, simplified to an engine-portable
# regex — no lookaheads, identical in Spark/RE2-ish and DuckDB/RE2).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, n_chars_m): whitespace token count,
    BPE-ish pre-token count, char count — the unit economics of a training
    corpus (tokens per doc drive pack/shard sizing)."""
    d = _docs(spark, sf_dir)
    lower = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " +"), lambda x: x != "")).alias(
            "ws_tokens"
        ),
        F.size(F.regexp_extract_all(lower, F.lit(BPE_RE), 0)).alias("bpe_tokens"),
        F.length("text").alias("n_chars_m"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
  len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) AS ws_tokens,
  len(regexp_extract_all(lower(text), '{BPE_RE}')) AS bpe_tokens,
  length(text) AS n_chars_m
FROM documents
"""


# ---------------------------------------------------------- quality scoring

STOPWORDS_FIXED = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
]


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features + score (Gopher/C4-style filters):
    mean word length, stopword ratio, non-alnum ratio, plus a composite
    keep-score. Round-6 on ratios for the cross-engine compare."""
    d = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_FIXED])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""))
    mean_wl = F.when(
        n_words > 0,
        words_len_sum(words) / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words.cast("double")).otherwise(0.0)
    alnum_ratio = F.when(
        F.length("text") > 0, n_alnum / F.length("text").cast("double")
    ).otherwise(0.0)
    quality = (
        F.when((n_words >= 10) & (mean_wl >= 2.0) & (mean_wl <= 12.0), 1).otherwise(0)
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        quality.alias("keep"),
    )


def words_len_sum(words):
    return F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ).cast("double")


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS_FIXED)

SQL_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
  FROM documents
),
feat AS (
  SELECT doc_id,
    len(words) AS n_words,
    CASE WHEN len(words) > 0
      THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
      ELSE 0.0 END AS mean_wl,
    CASE WHEN len(words) > 0
      THEN len(list_filter(words, x -> x IN ({_STOP_IN})))::DOUBLE / len(words)
      ELSE 0.0 END AS stop_ratio,
    CASE WHEN length(text) > 0
      THEN length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE
           / length(text)
      ELSE 0.0 END AS alnum_ratio
  FROM base
)
SELECT doc_id, n_words,
  round(mean_wl, 6) AS mean_word_len,
  round(stop_ratio, 6) AS stop_ratio,
  round(alnum_ratio, 6) AS alnum_ratio,
  CASE WHEN n_words >= 10 AND mean_wl >= 2.0 AND mean_wl <= 12.0
       THEN 1 ELSE 0 END AS keep
FROM feat
"""


# -------------------------------------------------------------- language ID

# Tiny deterministic marker lists (n-gram-heuristic stand-in; a real model
# is out-of-container). Prediction = argmax marker hits, tie → lang asc,
# zero hits → 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "und", "die", "ist", "mit"],
    "es": ["el", "los", "que", "es", "con"],
    "fr": ["le", "les", "est", "et", "avec"],
}


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pred_lang, hits) — marker-word language heuristic.
    Pure map + per-row argmax over a 4-wide literal array; no shuffle."""
    d = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    # max hits via greatest, then FIRST lang (asc) reaching it — portable
    # argmax with a deterministic tie-break in both engines.
    def _hits(lang: str):
        marks = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(words, lambda x: F.array_contains(marks, x)))

    hit_cols = {lang: _hits(lang) for lang in sorted(LANG_MARKERS)}
    mx = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((mx > 0) & (hit_cols[lang] == mx), F.lit(lang)).otherwise(pred)
    return d.select("doc_id", pred.alias("pred_lang"), mx.alias("hits"))


def _sql_lang_hits(lang: str) -> str:
    marks = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(words, x -> x IN ({marks})))"


SQL_LANGID = f"""
WITH base AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
  FROM documents
),
hits AS (
  SELECT doc_id,
    {", ".join(f"{_sql_lang_hits(lg)} AS h_{lg}" for lg in sorted(LANG_MARKERS))},
    greatest({", ".join(f"{_sql_lang_hits(lg)}" for lg in sorted(LANG_MARKERS))}) AS mx
  FROM base
)
SELECT doc_id,
  CASE WHEN mx = 0 THEN 'und'
       {" ".join(f"WHEN h_{lg} = mx THEN '{lg}'" for lg in sorted(LANG_MARKERS))}
  END AS pred_lang,
  mx AS hits
FROM hits
"""


# ------------------------------------------------------------- fingerprint

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp): content fingerprint = portable hash of the document's
    sorted distinct term set (shingle-free set fingerprint; near-dup
    variants live in ops/dedup.py). Engine-portable via md5-based hash."""
    d = _docs(spark, sf_dir)
    words = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
        )
    )
    return d.select(
        "doc_id", portable_hash32(F.concat_ws("|", words)).alias("fp")
    )


SQL_FINGERPRINT = f"""
WITH base AS (
  SELECT doc_id,
    list_sort(list_distinct(
      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')
    )) AS words
  FROM documents
)
SELECT doc_id, {sql_hash32("array_to_string(words, '|')")} AS fp
FROM base
"""


# ------------------------------------------------- merged per-doc text stats

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four per-document text-analysis ops — token counting, quality
    scoring, language-ID, fingerprint — fused into ONE scan of
    ``documents``. Column-for-column identical to running
    :func:`q_token_count` + :func:`q_quality` + :func:`q_langid` +
    :func:`q_fingerprint` and joining on doc_id (pytest-asserted), but a
    single projection: at 100 TB one pass over the corpus computes the
    whole per-doc stats block instead of four. This is the driver battery
    entry; the four narrow ops remain the user-facing API."""
    d = _docs(spark, sf_dir)
    lower = F.lower(F.col("text"))
    words = F.filter(F.split(lower, "[^a-z0-9]+"), lambda x: x != "")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_FIXED])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x)))
    n_alnum = F.length(F.regexp_replace(lower, "[^a-z0-9]", ""))
    mean_wl = F.when(
        n_words > 0, words_len_sum(words) / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words.cast("double")).otherwise(0.0)
    alnum_ratio = F.when(
        F.length("text") > 0, n_alnum / F.length("text").cast("double")
    ).otherwise(0.0)
    quality = (
        F.when((n_words >= 10) & (mean_wl >= 2.0) & (mean_wl <= 12.0), 1).otherwise(0)
    )

    def _hits(lang: str):
        marks = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(words, lambda x: F.array_contains(marks, x)))

    hit_cols = {lang: _hits(lang) for lang in sorted(LANG_MARKERS)}
    mx = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((mx > 0) & (hit_cols[lang] == mx), F.lit(lang)).otherwise(pred)
    fp_words = F.array_sort(F.array_distinct(words))
    return d.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " +"), lambda x: x != "")).alias(
            "ws_tokens"
        ),
        F.size(F.regexp_extract_all(lower, F.lit(BPE_RE), 0)).alias("bpe_tokens"),
        F.length("text").alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        quality.alias("keep"),
        pred.alias("pred_lang"),
        mx.alias("hits"),
        portable_hash32(F.concat_ws("|", fp_words)).alias("fp"),
    )


SQL_TEXT_STATS = f"""
WITH base AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
  FROM documents
),
feat AS (
  SELECT doc_id, text, words,
    len(words) AS n_words,
    CASE WHEN len(words) > 0
      THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
      ELSE 0.0 END AS mean_wl,
    CASE WHEN len(words) > 0
      THEN len(list_filter(words, x -> x IN ({_STOP_IN})))::DOUBLE / len(words)
      ELSE 0.0 END AS stop_ratio,
    CASE WHEN length(text) > 0
      THEN length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE
           / length(text)
      ELSE 0.0 END AS alnum_ratio,
    {", ".join(f"{_sql_lang_hits(lg)} AS h_{lg}" for lg in sorted(LANG_MARKERS))},
    greatest({", ".join(f"{_sql_lang_hits(lg)}" for lg in sorted(LANG_MARKERS))})
      AS mx
  FROM base
)
SELECT doc_id,
  len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) AS ws_tokens,
  len(regexp_extract_all(lower(text), '{BPE_RE}')) AS bpe_tokens,
  length(text) AS n_chars_m,
  n_words,
  round(mean_wl, 6) AS mean_word_len,
  round(stop_ratio, 6) AS stop_ratio,
  round(alnum_ratio, 6) AS alnum_ratio,
  CASE WHEN n_words >= 10 AND mean_wl >= 2.0 AND mean_wl <= 12.0
       THEN 1 ELSE 0 END AS keep,
  CASE WHEN mx = 0 THEN 'und'
       {" ".join(f"WHEN h_{lg} = mx THEN '{lg}'" for lg in sorted(LANG_MARKERS))}
  END AS pred_lang,
  mx AS hits,
  {sql_hash32("array_to_string(list_sort(list_distinct(words)), '|')")} AS fp
FROM feat
"""


# ------------------------------------------------------- deterministic sample

SAMPLE_PCT = 20  # keep ~20% of docs
SAMPLE_SALT = "s1"


def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket_h): deterministic corpus subsample (S4 — the
    reference's `random.sample(corpus, sample_max_size)` re-expressed as
    hash-based Bernoulli sampling so it is reproducible, engine-portable,
    and cluster-stable: keep iff portable_hash32(salt#doc_id) % 100 <
    SAMPLE_PCT). Pure map over the scan — no shuffle, no RNG state; at
    100 TB this IS how you sample (per-row hash, any executor layout,
    same sample every run). Resampling = change the salt."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = portable_hash32(
        F.concat(F.lit(SAMPLE_SALT), F.lit("#"), F.col("doc_id").cast("string"))
    )
    return (
        d.select("doc_id", (h % 100).cast("int").alias("bucket_h"))
        .filter(F.col("bucket_h") < SAMPLE_PCT)
    )


SQL_SAMPLE = f"""
SELECT doc_id, bucket_h FROM (
  SELECT doc_id,
         ({sql_hash32(f"'{SAMPLE_SALT}#' || doc_id::VARCHAR")} % 100)::INT
           AS bucket_h
  FROM documents
)
WHERE bucket_h < {SAMPLE_PCT}
"""
