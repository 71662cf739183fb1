"""Structured Streaming ingestion: a continuously-arriving corpus drives
incremental index maintenance.

The reference has no streaming (SURVEY.md §2.10); its closest analogue is
dynamic `add_document` (`ir-phase-1.ipynb:c22`). This module is the
Spark-native composition of that capability with a streaming source:

    files landing in <watch_dir>  ──readStream──►  micro-batch
      └─ foreachBatch ► IndexMaintenance.add_documents(batch)

Delivery semantics: Structured Streaming's file source + checkpoint gives
at-least-once batch delivery to ``foreachBatch``. Exactly-once application
is achieved with stage → commit plus a batchId ledger
(``<index_dir>/stream_batches.json``):

* each batch's outputs are STAGED under ``<index_dir>/__stage_batch_<id>``
  without touching live tables (``IndexMaintenance.stage_add``);
* the commit (``commit_add``) is redoable — on replay after a crash
  mid-commit, the frozen stage is re-committed to the same result;
* a replay after the ledger write is a pure no-op; a crash mid-STAGING
  leaves no live-table effects, so the partial stage is discarded and
  rebuilt.

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
        import shutil

        stage = os.path.join(index_dir, f"__stage_batch_{int(batch_id)}")
        if int(batch_id) in _applied(index_dir):
            # replay after the ledger write: drop any leftover stage dir
            if os.path.isdir(stage):
                shutil.rmtree(stage)
            return
        maint = IndexMaintenance(spark, index_dir)
        if IndexMaintenance.is_staged(stage):
            # crash happened during/after commit but before the ledger
            # write: finish committing the FROZEN stage (never re-stage —
            # the staged term_df/stats were merged against the pre-batch
            # tables, so rebuilding after a partial commit would double-add)
            maint.commit_add(stage)
        else:
            if os.path.isdir(stage):
                shutil.rmtree(stage)  # partial stage: no live effects yet
            if batch_df.isEmpty():
                _mark_applied(index_dir, batch_id)
                return
            maint.stage_add(batch_df, stage)
            maint.commit_add(stage)
        _mark_applied(index_dir, batch_id)
        shutil.rmtree(stage)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
