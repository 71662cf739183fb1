"""Structured Streaming ingestion: a continuously-arriving corpus drives
incremental index maintenance.

The reference has no streaming (SURVEY.md §2.10); its closest analogue is
dynamic `add_document` (`ir-phase-1.ipynb:c22`). This module is the
Spark-native composition of that capability with a streaming source:

    files landing in <watch_dir>  ──readStream──►  micro-batch
      └─ foreachBatch ► IndexMaintenance.add_documents(batch, batch_id)

Delivery semantics: Structured Streaming's file source + checkpoint gives
at-least-once batch delivery to ``foreachBatch``. Exactly-once application
falls out of the snapshot catalog (index/catalog.py):

* each batch's outputs are STAGED under ``<index_dir>/__stage_batch_<id>``
  without touching live tables (``IndexMaintenance.stage_add``);
* the commit is ONE atomic snapshot swap whose summary RECORDS the
  ``stream_batch_id`` — the applied-batch ledger IS the snapshot chain, so
  "batch applied" and "batch visible" are the same atomic event (no
  ledger-after-commit window at all);
* a replay after the commit finds its batch id in the snapshot history and
  no-ops; a replay after a crash mid-commit finds the frozen stage and
  finishes the same commit (token-idempotent); a crash mid-STAGING leaves
  no live effects, so the partial stage is discarded and rebuilt.

Use ``trigger(availableNow=True)`` for catch-up/batch-drain runs (tests do
this) or a processing-time trigger for continuous operation.
"""

from __future__ import annotations

import os
import shutil

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


def applied_batches(index_dir: str) -> set[int]:
    """Stream batch ids recorded in the snapshot chain (the ledger) —
    full-history scan, for tests/inspection; the hot path uses
    `batch_applied`."""
    from information_retrieval_spark.index.catalog import Catalog

    if not Catalog.exists(index_dir):
        return set()
    out = set()
    for snap in Catalog(index_dir).history():
        b = snap.get("summary", {}).get("stream_batch_id")
        if b is not None:
            out.add(int(b))
    return out


def batch_applied(index_dir: str, batch_id: int) -> bool:
    """O(1)-ish exactly-once check: batch ids are monotonic (Structured
    Streaming replays only the last incomplete batch), so applied ⟺
    id ≤ the chain's newest recorded stream_batch_id."""
    from information_retrieval_spark.index.catalog import Catalog

    if not Catalog.exists(index_dir):
        return False
    last = Catalog(index_dir).last_stream_batch()
    return last is not None and int(batch_id) <= last


def run_incremental_indexing(
    spark: SparkSession,
    index_dir: str,
    watch_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    schema: T.StructType = CORPUS_SCHEMA,
    reader_options: dict[str, str] | None = None,
    trigger_interval: str = "10 seconds",
    auto_compact_segments: int | None = None,
    auto_compact_mode: str = "tiered",
):
    """Drain (or continuously consume) parquet files from ``watch_dir`` into
    the index at ``index_dir``. Returns the StreamingQuery (already
    terminated when ``available_now``). ``reader_options`` pass through to
    the file source (e.g. ``{"maxFilesPerTrigger": "1"}`` to bound each
    micro-batch — and therefore each staged snapshot commit — to one
    landed file even under an availableNow catch-up drain).

    ``auto_compact_segments``/``auto_compact_mode`` apply the same
    segment-count compaction trigger as ``IndexMaintenance`` to each
    micro-batch's add. The streaming default is TIERED: a continuous
    ingest compacts on every ~K-th batch forever, so per-compaction cost
    must stay ∝ accumulated delta bytes — a full-rewrite default would
    make steady-state ingest cost grow with the index
    (BENCH/BASELINE.md "Tiered vs full compaction")."""
    from information_retrieval_spark.index.maintenance import IndexMaintenance

    reader = spark.readStream.schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(watch_dir)

    def handle(batch_df, batch_id: int) -> None:
        stage = os.path.join(index_dir, f"__stage_batch_{int(batch_id)}")
        if batch_applied(index_dir, int(batch_id)):
            # replay after the committed snapshot. A LEFTOVER FROZEN stage
            # here means the previous attempt crashed after its commit but
            # before cleanup — i.e. possibly inside its auto-compact — so
            # the segment bound may still be violated: re-run the compact
            # check before dropping the stage (without this, the bound
            # stayed broken until a later over-bound batch re-triggered it).
            if (
                auto_compact_segments is not None
                and IndexMaintenance.is_staged(stage)
            ):
                IndexMaintenance(
                    spark, index_dir,
                    auto_compact_segments=auto_compact_segments,
                    auto_compact_mode=auto_compact_mode,
                )._maybe_auto_compact()
            shutil.rmtree(stage, ignore_errors=True)
            return
        maint = IndexMaintenance(
            spark, index_dir,
            auto_compact_segments=auto_compact_segments,
            auto_compact_mode=auto_compact_mode,
        )
        if IndexMaintenance.is_staged(stage):
            # crash happened mid-commit: finish committing the FROZEN stage
            # (never re-stage — the staged aggregates were merged against
            # the pre-batch snapshot; the stage token makes the finish
            # idempotent and the batch id lands in the same snapshot)
            maint.commit_add(stage, batch_id=int(batch_id))
        else:
            if os.path.isdir(stage):
                shutil.rmtree(stage)  # partial stage: no live effects yet
            if batch_df.isEmpty():
                return
            maint.stage_add(batch_df, stage)
            maint.commit_add(stage, batch_id=int(batch_id))
        # amortized merge AFTER the batch's snapshot landed but BEFORE the
        # stage drops — same ordering rationale as add_documents: a crash
        # in compact leaves the frozen committed stage, the replay's
        # batch_applied/commit_add no-op on it and only the compact reruns
        maint._maybe_auto_compact()
        shutil.rmtree(stage, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime=trigger_interval).start()
