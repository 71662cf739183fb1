"""Corpus-hygiene operators for training-data pipelines: benchmark
decontamination, intra-document repetition signals, and collocation mining.

Beyond-reference additions in the same family as ``ops/textstats.py`` /
``ops/dedup.py`` (the reference engine has no analogue — these are the
standard pre-training corpus checks layered over the same shingle/token
machinery). Each op is one declarative Spark plan over ``documents`` with
an exact DuckDB SQL twin for the driver's correctness gate.

* **contamination** — benchmark decontamination: the probe set is every
  distinct ``PROBE_W``-token shingle of the held-out split (here a
  deterministic ``doc_id % 97 == 3`` slice standing in for a benchmark's
  test set); a training document is contaminated iff it shares ≥1 probe
  shingle. This is the n-gram-overlap decontamination used for LLM
  pre-training corpora (e.g. the 13-gram checks of GPT-3 appendix C,
  scaled down to the synthetic vocabulary).
* **repetition** — per-document duplicate-bigram fraction and
  top-bigram mass (Gopher-style repetition quality signals): documents
  dominated by a few repeated n-grams are boilerplate/spam candidates.
* **collocations** — corpus-level PMI-ranked adjacent bigrams with a
  count floor: log(p(xy) / (p(x)·p(y))), the classic collocation score.

Scale notes (100 TB):
* contamination: the probe side is a *held-out benchmark suite* — tiny by
  construction (≤ millions of shingles) — so it broadcasts; the training
  side is a scan → explode → broadcast semi-join → per-doc hash agg. No
  all-pairs anything; one shuffle keyed on doc_id.
* repetition: explode → two hash aggs keyed on (doc_id, bigram) then
  (doc_id). Embarrassingly parallel; partial aggregation does the heavy
  lifting map-side.
* collocations: unigram + bigram counts (vocabulary-sized hash aggs),
  two shuffled joins keyed on the unigram, one-row totals broadcast via
  cross join (stays in-plan, no driver collect), parallel top-K via
  orderBy().limit() (TakeOrderedAndProject — never a global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

#: shingle width (tokens) for decontamination probes. 4 balances
#: specificity against the synthetic corpus's tiny vocabulary; production
#: decontamination uses 8-13 on natural text (same plan, one constant).
PROBE_W = 4

#: deterministic held-out split: doc_id % PROBE_MOD == PROBE_REM is "test".
PROBE_MOD = 97
PROBE_REM = 3

#: collocation mining: minimum bigram count and result size.
COLLOC_MIN_CNT = 5
COLLOC_K = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _word_shingles(d: DataFrame, w: int, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle): word-``w``-grams of the lowercased text, built
    JVM-side (split → transform(sequence) → explode). Same construction
    as ops/dedup.py:_shingles, width-parameterized."""
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    sh = F.expr(
        "transform(sequence(1, greatest(size(words) - {w} + 1, 0)), "
        "i -> concat_ws(' ', slice(words, i, {w})))".format(w=w)
    )
    out = d.withColumn("words", words).select(
        "doc_id", F.explode(sh).alias("shingle")
    )
    return out.distinct() if distinct else out


def _sql_word_shingles(w: int, distinct: bool = True) -> str:
    return f"""
  SELECT {"DISTINCT" if distinct else ""} doc_id,
         array_to_string(words[i : i + {w} - 1], ' ') AS shingle
  FROM (
    SELECT doc_id,
      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
    FROM documents
  ), unnest(generate_series(1, greatest(len(words) - {w} + 1, 0))) AS t(i)
"""


# ------------------------------------------------------- decontamination

def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_probes_hit): training documents sharing ≥1 distinct
    PROBE_W-token shingle with the held-out split, with the number of
    distinct probe shingles they leak. Broadcast semi-join against the
    (tiny) probe set; one per-doc hash agg."""
    sh = _word_shingles(_docs(spark, sf_dir), PROBE_W)
    is_test = (F.col("doc_id") % PROBE_MOD) == PROBE_REM
    probes = sh.filter(is_test).select("shingle").distinct()
    train = sh.filter(~is_test)
    return (
        train.join(F.broadcast(probes), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_probes_hit"))
    )


SQL_CONTAMINATION = f"""
WITH sh AS ({_sql_word_shingles(PROBE_W)}),
probes AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {PROBE_MOD} = {PROBE_REM}
)
SELECT s.doc_id, count(*) AS n_probes_hit
FROM sh s JOIN probes p USING (shingle)
WHERE s.doc_id % {PROBE_MOD} <> {PROBE_REM}
GROUP BY s.doc_id
"""


# ---------------------------------------------------- repetition signals

def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, dup2_frac_r, top2_frac_r): per-document
    duplicate-bigram fraction (1 − distinct/total) and the mass of the
    single most frequent bigram — the Gopher-style repetition quality
    signals. Fractions rounded to 6 decimals (driver float convention)."""
    bg = _word_shingles(_docs(spark, sf_dir), 2, distinct=False)
    per = bg.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count("*").alias("d2"),
            F.max("c").alias("m2"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                1.0 - F.col("d2").cast("double") / F.col("n_bigrams"), 6
            ).alias("dup2_frac_r"),
            F.round(
                F.col("m2").cast("double") / F.col("n_bigrams"), 6
            ).alias("top2_frac_r"),
        )
    )


SQL_REPETITION = f"""
WITH bg AS ({_sql_word_shingles(2, distinct=False)}),
per AS (SELECT doc_id, shingle, count(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id,
  sum(c)::BIGINT AS n_bigrams,
  round(1.0 - count(*)::DOUBLE / sum(c), 6) AS dup2_frac_r,
  round(max(c)::DOUBLE / sum(c), 6) AS top2_frac_r
FROM per GROUP BY doc_id
"""


# -------------------------------------------------------- collocations

def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, x, y, c2, pmi_r): top-COLLOC_K adjacent-bigram collocations
    by pointwise mutual information ln(p(xy)/(p(x)p(y))) with count floor
    COLLOC_MIN_CNT; deterministic (pmi desc, x, y) order. Totals stay
    in-plan as one-row cross joins; top-K via limit() so ranking is a
    parallel TakeOrderedAndProject, never a global window."""
    d = _docs(spark, sf_dir)
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    dw = d.withColumn("words", words)
    # materialize both (vocabulary-sized) aggregates once: without this
    # every consumer branch — totals, the x-join, the y-join — re-scans
    # and re-tokenizes the corpus. At production scale these ARE the
    # persisted term/bigram count tables.
    uni = (
        dw.select(F.explode("words").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint()
    )
    pairs = F.expr(
        "transform(sequence(1, greatest(size(words) - 1, 0)), "
        "i -> struct(words[i-1] as x, words[i] as y))"
    )
    bg = (
        dw.select(F.explode(pairs).alias("p"))
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("c2"))
        .localCheckpoint()
    )
    totals = uni.agg(F.sum("c1").alias("n1")).crossJoin(
        bg.agg(F.sum("c2").alias("n2"))
    )
    ux = uni.select(F.col("term").alias("x"), F.col("c1").alias("cx"))
    uy = uni.select(F.col("term").alias("y"), F.col("c1").alias("cy"))
    scored = (
        bg.filter(F.col("c2") >= COLLOC_MIN_CNT)
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(totals))
        .select(
            "x",
            "y",
            "c2",
            F.round(
                F.log(
                    (F.col("c2").cast("double") / F.col("n2"))
                    / (
                        (F.col("cx").cast("double") / F.col("n1"))
                        * (F.col("cy").cast("double") / F.col("n1"))
                    )
                ),
                6,
            ).alias("pmi_r"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi_r"), F.asc("x"), F.asc("y")
    ).limit(COLLOC_K)
    # rank AFTER the limit; non-foldable constant partition key keeps the
    # K-row window off the global-window path (see ops/ir_direct.py).
    w = Window.partitionBy(F.pmod(F.col("c2"), F.lit(1))).orderBy(
        F.desc("pmi_r"), F.asc("x"), F.asc("y")
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "x", "y", "c2", "pmi_r"
    )


SQL_COLLOCATIONS = f"""
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
  FROM documents
),
uni AS (
  SELECT term, count(*) AS c1
  FROM (SELECT unnest(words) AS term FROM w) GROUP BY term
),
bg AS (
  SELECT words[i] AS x, words[i + 1] AS y, count(*) AS c2
  FROM w, unnest(generate_series(1, greatest(len(words) - 1, 0))) AS t(i)
  GROUP BY 1, 2
),
tot AS (
  SELECT (SELECT sum(c1) FROM uni) AS n1, (SELECT sum(c2) FROM bg) AS n2
),
scored AS (
  SELECT b.x, b.y, b.c2,
    round(ln((b.c2::DOUBLE / tot.n2)
             / ((ux.c1::DOUBLE / tot.n1) * (uy.c1::DOUBLE / tot.n1))), 6)
      AS pmi_r
  FROM bg b, tot, uni ux, uni uy
  WHERE b.c2 >= {COLLOC_MIN_CNT} AND ux.term = b.x AND uy.term = b.y
)
SELECT row_number() OVER (ORDER BY pmi_r DESC, x, y) AS rank, x, y, c2, pmi_r
FROM scored
ORDER BY pmi_r DESC, x, y
LIMIT {COLLOC_K}
"""
