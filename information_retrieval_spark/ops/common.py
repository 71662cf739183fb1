"""Shared helpers for the driver-verifiable operator battery.

Every op in ``ops/`` is written twice: once as a declarative Spark plan and
once as ANSI SQL for DuckDB (`__spark_entry__.oracle_sql`). Anything
hash-like must therefore be *engine-portable*: ``portable_hash32`` is the
first 8 hex chars of md5 parsed as an unsigned 32-bit int, which both engines
compute identically (Spark ``conv(substr(md5(x),1,8),16,10)``, DuckDB
``('0x'||substr(md5(x),1,8))::BIGINT``). md5 here is a deterministic mixer,
not a security primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Spark split pattern == DuckDB string_split_regex pattern (tokenize.py).
SPLIT = "[^a-z0-9]+"


def portable_hash32(col: Column) -> Column:
    """Deterministic unsigned-32-bit hash of a string column, identical in
    Spark and DuckDB (see module docstring). JVM-side, no UDF."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sql_hash32(expr: str) -> str:
    """DuckDB rendering of :func:`portable_hash32` over ``expr``."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def tokens_view(documents: DataFrame) -> DataFrame:
    """(doc_id, pos, term) — simple tokenizer over ``text``.

    Stays fully JVM-side (split + posexplode → whole-stage codegen); the
    tokens never shuffle — downstream aggregations consume them pipelined.
    Reference analogue: `ui/backend/mir/search/preprocess.py:23-39`.
    """
    toks = F.split(F.lower(F.col("text")), SPLIT)
    return (
        documents.select("doc_id", F.posexplode(toks).alias("pos", "term"))
        .filter(F.col("term") != "")
    )


SQL_TOKENS = """
  SELECT doc_id, term
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents
  )
  WHERE term <> ''
"""


def stop_terms_df(tokens: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-relative stop words: top-K terms by (count desc, term asc) —
    reference quirk Q6 (`ui/backend/mir/search/corpus/phase1.py:46-52`).
    Partial+final hash agg then a K-row sort; cost ~ vocabulary size."""
    return (
        tokens.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(k)
    )


SQL_STOP = """
  SELECT term FROM (
    SELECT term, count(*) AS cnt FROM ({tokens}) GROUP BY term
    ORDER BY cnt DESC, term ASC LIMIT {k}
  )
""".strip()


def sql_stop(k: int = 20) -> str:
    return SQL_STOP.format(tokens=SQL_TOKENS, k=k)
