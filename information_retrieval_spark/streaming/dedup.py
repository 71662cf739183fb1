"""Streaming exact deduplication: first-seen-wins across micro-batches.

The streaming twin of ``ops/dedup.q_dedup_exact``'s canonical pass: as
documents arrive, only the FIRST occurrence of each content digest is
emitted downstream; every later duplicate — inside the same micro-batch
or any later one — is dropped. This is the ingest-time shape of training
-data dedup: dedup once on arrival instead of re-clustering the corpus.

Built on ``dropDuplicates`` over a streaming frame, which keeps one
state-store row per distinct digest (first-seen-wins is Structured
Streaming's documented semantics for streaming dropDuplicates). Two
variants:

* :func:`dedup_stream` — unbounded state: exact across ALL history. At
  100 TB-scale ingest the state store is RocksDB-backed and the digest
  key is 16 bytes/doc — viable but ever-growing.
* :func:`dedup_stream_within_watermark` — ``dropDuplicatesWithinWatermark``
  over an event-time column: state is bounded by the watermark horizon
  (duplicates separated by more than the horizon both survive — the
  standard bounded-state trade; the periodic batch MinHash/exact pass
  downstream catches long-range dupes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def dedup_stream(spark: SparkSession, watch_dir: str) -> DataFrame:
    """readStream over parquet doc files → md5 digest → streaming
    dropDuplicates on the digest. Returns the (unstarted) streaming frame
    of first-seen documents."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(watch_dir)
    return (
        stream.withColumn("h", F.md5("text"))
        .dropDuplicates(["h"])
        .select("doc_id", "text", "h")
    )


def dedup_stream_within_watermark(
    spark: SparkSession, watch_dir: str, horizon: str = "2 hours"
) -> DataFrame:
    """Bounded-state variant: duplicates are only suppressed within the
    event-time watermark ``horizon``; state for older digests is evicted."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(watch_dir)
    return (
        stream.withColumn("h", F.md5("text"))
        .withWatermark("ts", horizon)
        .dropDuplicatesWithinWatermark(["h"])
        .select("doc_id", "text", "h")
    )


def drain_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    checkpoint_dir: str,
    table: str,
) -> None:
    """availableNow-drain the streaming frame into an in-memory sink
    (test/verification harness; production writes parquet/append)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
