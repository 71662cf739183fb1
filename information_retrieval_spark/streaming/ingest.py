"""Structured Streaming ingestion: a continuously-arriving corpus drives
incremental index maintenance.

The reference has no streaming (SURVEY.md §2.10); its closest analogue is
dynamic `add_document` (`ir-phase-1.ipynb:c22`). This module is the
Spark-native composition of that capability with a streaming source:

    files landing in <watch_dir>  ──readStream──►  micro-batch
      └─ foreachBatch ► IndexMaintenance.add_documents(batch)

Delivery semantics: Structured Streaming's file source + checkpoint gives
at-least-once batch delivery to ``foreachBatch``; ``add_documents`` is NOT
idempotent (it appends postings), so an applied-batch ledger
(``<index_dir>/stream_batches.json``) makes replays no-ops — the standard
foreachBatch idempotence pattern (batchId-keyed commits).

Use ``trigger(availableNow=True)`` for catch-up/batch-drain runs (tests do
this) or a processing-time trigger for continuous operation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def _ledger_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_batches.json")


def _applied(index_dir: str) -> set[int]:
    p = _ledger_path(index_dir)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["applied"])


def _mark_applied(index_dir: str, batch_id: int) -> None:
    ids = _applied(index_dir)
    ids.add(int(batch_id))
    tmp = _ledger_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"applied": sorted(ids)}, f)
    os.replace(tmp, _ledger_path(index_dir))


def run_incremental_indexing(
    spark: SparkSession,
    index_dir: str,
    watch_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    schema: T.StructType = CORPUS_SCHEMA,
):
    """Drain (or continuously consume) parquet files from ``watch_dir`` into
    the index at ``index_dir``. Returns the StreamingQuery (already
    terminated when ``available_now``)."""
    from information_retrieval_spark.index.maintenance import IndexMaintenance

    stream = spark.readStream.schema(schema).parquet(watch_dir)

    def handle(batch_df, batch_id: int) -> None:
        if int(batch_id) in _applied(index_dir):
            return  # replay after crash/restart: already committed
        if batch_df.isEmpty():
            _mark_applied(index_dir, batch_id)
            return
        IndexMaintenance(spark, index_dir).add_documents(batch_df)
        _mark_applied(index_dir, batch_id)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
