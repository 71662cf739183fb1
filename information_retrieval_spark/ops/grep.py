"""Regex code search (grep) with a trigram-prefilter scale path.

A code-search engine must answer regex queries, not just term queries.
The brute-force plan greps every document; the scale path is the classic
trigram-index prefilter (Cox, "Regular Expression Matching with a Trigram
Index", the Google Code Search design): every match of a regex must
contain its *required literal factor*, therefore must contain every
character trigram of that factor — so an AND-query over a trigram index
yields a candidate superset, and the (expensive) exact regex runs only on
candidates. Both paths return identical rows and share one DuckDB oracle.

The query set carries hand-derived literal factors (each is a substring
of every possible match of its regex — verified by construction: the
regex's variable parts lie outside the factor). A production engine
derives factors automatically from the regex AST and falls back to a full
scan when no ≥3-char factor exists; the fallback IS ``q_grep_topk``.

Regex dialect: character classes, alternation, ``*`` — identical
semantics in Java regex (Spark) and RE2 (DuckDB); both extract
non-overlapping leftmost matches.

Scale notes (100 TB):
* brute: one scan, per-row constant-pattern regex counting (JVM
  codegen), per-query top-K via a query_id-partitioned window over only
  the matching docs. Scan-bound — the baseline, and the fallback for
  factor-less regexes.
* trigram path: the distinct (doc_id, trigram) relation is index-shaped —
  at scale it is a persisted, trigram-partitioned table written once at
  ingest (exactly like the packed term index); here it is derived in-plan
  from the same scan. The needed-trigram set is tiny (≤ a few per query)
  and broadcasts; candidates come from one hash-agg keyed (query_id,
  doc_id) with an AND-count filter; the exact regex then touches ONLY
  candidate docs — the 100 TB win is that the full corpus is never
  regexed, only scanned once at index-build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOP_K = 10

#: (query_id, regex, required literal factor). The factor is a substring
#: of every match (the regex's alternations/classes lie outside it).
GREP_QUERY_SET: list[tuple[int, str, str]] = [
    (0, "merge (sort|join)", "merge "),
    (1, "s[ck]an slow", "an slow"),
    (2, "(big|small) table", " table"),
    (3, "window [a-z]*gg[a-z]*", "window "),
    (4, "hash (join|value)", "hash "),
]


def _trigrams(s: str) -> list[str]:
    return sorted({s[i : i + 3] for i in range(len(s) - 2)})


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rank_topk(matched: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_matches"), F.asc("doc_id")
    )
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "n_matches")
    )


# ------------------------------------------------------------- brute scan

def q_grep_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, doc_id, n_matches): per-regex top-K documents by
    match count. One scan; all regex counting in a single projection."""
    d = _docs(spark, sf_dir)
    lower = F.lower(F.col("text"))
    per_q = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                F.size(
                    F.regexp_extract_all(lower, F.lit(regex), F.lit(0))
                ).alias("n_matches"),
            )
            for qid, regex, _ in GREP_QUERY_SET
        ]
    )
    matched = (
        d.select("doc_id", F.explode(per_q).alias("q"))
        .select("q.query_id", "doc_id", "q.n_matches")
        .filter(F.col("n_matches") > 0)
    )
    return _rank_topk(matched)


def _sql_grep_matches() -> str:
    branches = "\n  UNION ALL\n".join(
        f"  SELECT {qid} AS query_id, doc_id, "
        f"len(regexp_extract_all(lower(text), '{regex}')) AS n_matches "
        f"FROM documents"
        for qid, regex, _ in GREP_QUERY_SET
    )
    return branches


SQL_GREP_TOPK = f"""
WITH m AS (
{_sql_grep_matches()}
),
f AS (SELECT * FROM m WHERE n_matches > 0),
r AS (
  SELECT query_id, doc_id, n_matches,
         row_number() OVER (
           PARTITION BY query_id ORDER BY n_matches DESC, doc_id
         ) AS rank
  FROM f
)
SELECT query_id, rank, doc_id, n_matches FROM r WHERE rank <= {TOP_K}
"""


# ------------------------------------------------- trigram-prefiltered path

_TG_EXPR = (
    "transform(sequence(1, greatest(length(t) - 2, 0)), "
    "i -> substring(t, i, 3))"
)


def _doc_trigrams(d: DataFrame) -> DataFrame:
    """(doc_id, trigram): DISTINCT character trigrams of lower(text)."""
    return (
        d.withColumn("t", F.lower(F.col("text")))
        .select("doc_id", F.explode(F.expr(_TG_EXPR)).alias("trigram"))
        .distinct()
    )


def _grep_via_trigrams(
    spark: SparkSession, doc_tg: DataFrame, d: DataFrame
) -> DataFrame:
    """Candidate AND-query over a (doc_id, trigram) relation + exact-regex
    verify on candidates only; shared by the in-plan and persisted paths."""
    needed_rows = [
        (qid, tri)
        for qid, _, lit in GREP_QUERY_SET
        for tri in _trigrams(lit)
    ]
    all_needed = sorted({tri for _, tri in needed_rows})
    needed = spark.createDataFrame(needed_rows, "query_id int, trigram string")
    n_req = spark.createDataFrame(
        [(qid, len(_trigrams(lit))) for qid, _, lit in GREP_QUERY_SET],
        "query_id int, n_req int",
    )
    # explicit isin BEFORE the join: on the persisted table this is the
    # pushed In(trigram, ...) filter that prunes row groups / partitions.
    cands = (
        doc_tg.filter(F.col("trigram").isin(all_needed))
        .join(F.broadcast(needed), "trigram")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_have"))
        .join(F.broadcast(n_req), "query_id")
        .filter(F.col("n_have") == F.col("n_req"))
        .select("query_id", "doc_id")
    )
    # exact verify on candidates only: constant-pattern regex per branch
    # selected by a CASE chain (one join, no union re-scans).
    verify = cands.join(d.select("doc_id", "text"), "doc_id")
    n_col = None
    for qid, regex, _ in GREP_QUERY_SET:
        cnt = F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(regex), F.lit(0))
        )
        n_col = (
            F.when(F.col("query_id") == qid, cnt)
            if n_col is None
            else n_col.when(F.col("query_id") == qid, cnt)
        )
    matched = verify.select(
        "query_id", "doc_id", n_col.alias("n_matches")
    ).filter(F.col("n_matches") > 0)
    return _rank_topk(matched)


def q_grep_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as :func:`q_grep_topk` via the trigram-index plan:
    AND-query over distinct character trigrams prefilters candidates, the
    exact regex verifies only candidates. Shares SQL_GREP_TOPK as oracle
    (two physical strategies, one logical query)."""
    d = _docs(spark, sf_dir)
    return _grep_via_trigrams(spark, _doc_trigrams(d), d)


# ------------------------------------------------ persisted trigram index

def build_trigram_index(spark: SparkSession, d: DataFrame, out_dir: str) -> None:
    """Write the distinct (doc_id, trigram) relation as a query-prunable
    parquet table: hive-partitioned by the trigram's first character and
    sorted by trigram within files, so a query's In(trigram, ...) filter
    prunes whole partitions (PartitionFilters) and row groups (min/max on
    the sorted column). This is the ingest-time artifact the 100 TB grep
    path reads instead of re-deriving trigrams per query; at that scale it
    lives in the snapshot catalog next to the packed term index."""
    tg = _doc_trigrams(d).withColumn(
        "tg1", F.substring(F.col("trigram"), 1, 1)
    )
    (
        tg.repartition("tg1")
        .sortWithinPartitions("trigram", "doc_id")
        .write.partitionBy("tg1")
        .mode("overwrite")
        .parquet(out_dir)
    )


def grep_persisted(
    spark: SparkSession, trigram_dir: str, d: DataFrame
) -> DataFrame:
    """GREP_QUERY_SET over a persisted trigram index: identical rows to
    :func:`q_grep_topk`, but the prefilter reads only the needed trigrams'
    partitions/row groups — the corpus is regexed on candidates only and
    never scanned for trigrams at query time."""
    doc_tg = spark.read.parquet(trigram_dir).select("doc_id", "trigram")
    return _grep_via_trigrams(spark, doc_tg, d)


def ensure_trigram_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir, manifest = parquet _SUCCESS) the persisted
    trigram index into a /tmp cache — same idempotent-build pattern as
    ``engine_entry.ensure_documents_index``."""
    import hashlib
    import os

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/ir_trigram_index_{key}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        build_trigram_index(spark, _docs(spark, sf_dir), out)
    return out


def q_grep_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DRIVER/bench entry for indexed grep: reads the ingest-time
    persisted trigram table (partition-pruned by the query's In(trigram)
    filter) instead of re-deriving trigrams in-plan per query — at 100 TB
    the in-plan derivation IS a full corpus scan + explode, the exact cost
    the index exists to avoid. Same rows, same SQL_GREP_TOPK oracle as
    :func:`q_grep_topk` / :func:`q_grep_index`."""
    d = _docs(spark, sf_dir)
    return grep_persisted(spark, ensure_trigram_index(spark, sf_dir), d)
