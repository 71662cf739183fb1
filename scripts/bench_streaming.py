"""Streaming-ingest throughput evidence (streaming/ingest.py).

Measures the exactly-once incremental-indexing path end to end: N
micro-batches of delta docs land as parquet files in a watch dir; ONE
availableNow drain stages + commits each as its own LSM snapshot. Reports
docs/sec through the commit path, per-batch wall, post-drain segment
count, and verifies every batch id landed exactly once in the snapshot
ledger and that a WAND query over the maintained index is rank-identical
to a fresh build over base+deltas.

Usage: python scripts/bench_streaming.py  (env: STREAM_BASE=20000
STREAM_BATCHES=8 STREAM_BATCH_DOCS=500; appends a section to
BENCH/BASELINE.md when BENCH_APPEND=1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(os.environ.get("STREAM_BASE", "20000"))
N_BATCHES = int(os.environ.get("STREAM_BATCHES", "8"))
BATCH_DOCS = int(os.environ.get("STREAM_BATCH_DOCS", "500"))


def main() -> None:
    from information_retrieval_spark.fixtures import corpus_rows, make_queries
    from information_retrieval_spark.index.build import (
        IndexBuilder,
        index_content_hash,
    )
    from information_retrieval_spark.query.engine import QuerySpec
    from information_retrieval_spark.query.wand import WandEngine
    from information_retrieval_spark.session import get_spark
    from information_retrieval_spark.streaming.ingest import (
        applied_batches,
        run_incremental_indexing,
    )

    spark = get_spark("bench_streaming", shuffle_partitions=32)
    rows = corpus_rows(N_BASE + N_BATCHES * BATCH_DOCS)
    schema = (
        "doc_id long, repo string, path string, commit string,"
        " lang string, content string"
    )

    def df_of(chunk):
        return spark.createDataFrame(
            [(r.doc_id, r.repo, r.path, r.commit, r.lang, r.content) for r in chunk],
            schema,
        )

    work = tempfile.mkdtemp(prefix="bench_stream_")
    idx = os.path.join(work, "idx")
    watch = os.path.join(work, "watch")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(watch)
    sections = {"title": "path", "abstract": "content"}

    IndexBuilder(spark, idx, sections, tokenizer="code", n_buckets=32).build(
        df_of(rows[:N_BASE])
    )
    # one parquet file per micro-batch; maxFilesPerTrigger=1 makes the
    # availableNow drain process them as N separate exactly-once commits
    for b in range(N_BATCHES):
        chunk = rows[N_BASE + b * BATCH_DOCS : N_BASE + (b + 1) * BATCH_DOCS]
        df_of(chunk).coalesce(1).write.mode("append").parquet(watch)

    t0 = time.time()
    run_incremental_indexing(
        spark, idx, watch, ckpt, available_now=True,
        reader_options={"maxFilesPerTrigger": "1"},
    )
    drain_s = time.time() - t0
    applied = sorted(applied_batches(idx))

    # freshness + identity: maintained index == fresh build over
    # base+deltas. The stop list is PINNED to the base build's (LSM adds
    # never rewrite live segments, so the corpus-relative top-K is frozen
    # at build time by design); an unpinned fresh rebuild over base+deltas
    # may derive a shifted top-K and legitimately differ.
    stop_pinned = [
        r.term
        for r in spark.read.parquet(os.path.join(idx, "stopwords"))
        .orderBy("rank")
        .collect()
    ]
    fresh = os.path.join(work, "fresh")
    IndexBuilder(
        spark, fresh, sections, tokenizer="code", n_buckets=32,
        stop_terms=stop_pinned,
    ).build(df_of(rows))
    hash_equal = index_content_hash(spark, idx) == index_content_hash(spark, fresh)

    eng = WandEngine(spark, idx)
    specs = [
        QuerySpec(s.query_id, s.query_text, "okapi25", 10, spell=False,
                  match_mode="exact")
        for s in make_queries(10)
        if s.method == "okapi25"
    ]
    t0 = time.time()
    eng.search(specs).collect()
    query_s = time.time() - t0

    # ---- commit-to-queryable latency (steady state, no backlog) ----------
    # A continuous stream (ASAP trigger) is already running empty; land one
    # delta file at a time and measure file-landed → snapshot-committed.
    # "Queryable" = the batch id is visible in the snapshot ledger, which
    # is exactly the moment a reader resolving the latest snapshot serves
    # the batch's docs (the ledger IS the committed chain).
    from information_retrieval_spark.index.catalog import Catalog

    n_lat = int(os.environ.get("STREAM_LAT_BATCHES", "6"))
    lat_rows = corpus_rows(N_BASE + (N_BATCHES + n_lat) * BATCH_DOCS)
    q = run_incremental_indexing(
        spark, idx, watch, ckpt, available_now=False,
        reader_options={"maxFilesPerTrigger": "1"},
        trigger_interval="0 seconds",
    )
    lats = []
    try:
        cat = Catalog(idx)
        for b in range(n_lat):
            prev_last = cat.last_stream_batch()
            lo = N_BASE + (N_BATCHES + b) * BATCH_DOCS
            chunk = lat_rows[lo : lo + BATCH_DOCS]
            t_land = time.time()
            df_of(chunk).coalesce(1).write.mode("append").parquet(watch)
            while True:
                last = cat.last_stream_batch()
                if last is not None and (prev_last is None or last > prev_last):
                    break
                if time.time() - t_land > 300:
                    raise TimeoutError("stream never committed the batch")
                time.sleep(0.05)
            lats.append(time.time() - t_land)
    finally:
        q.stop()
    lats.sort()
    p50_latency = lats[len(lats) // 2]

    from information_retrieval_spark.index.catalog import table_dirs

    out = {
        "base_docs": N_BASE,
        "batches_applied": applied,
        "delta_docs_total": N_BATCHES * BATCH_DOCS,
        "drain_wall_s": round(drain_s, 2),
        "ingest_docs_per_sec": round(N_BATCHES * BATCH_DOCS / drain_s, 1),
        "per_batch_commit_s": round(drain_s / max(len(applied), 1), 2),
        "packed_segments_after": len(table_dirs(idx, "packed")),
        "maintained_hash_equals_fresh_rebuild": bool(hash_equal),
        "wand_batch_after_drain_s": round(query_s, 2),
        "commit_to_queryable_p50_s": round(p50_latency, 2),
        "commit_to_queryable_all_s": [round(x, 2) for x in lats],
    }
    print("STREAM_BENCH " + json.dumps(out))
    if os.environ.get("BENCH_APPEND") == "1":
        sec = (
            "\n### Streaming ingest: commit-to-queryable latency "
            f"(base {N_BASE} docs, {BATCH_DOCS}-doc batches)\n\n"
            "Backlog drain (availableNow, maxFilesPerTrigger=1): "
            f"{out['ingest_docs_per_sec']} docs/s through the exactly-once "
            f"commit path, {out['per_batch_commit_s']} s per batch commit, "
            f"maintained index hash == fresh rebuild: "
            f"{out['maintained_hash_equals_fresh_rebuild']}.\n\n"
            "Steady state (continuous ASAP-trigger stream, one file landed "
            "at a time): p50 file-landed → batch-id-visible-in-snapshot-"
            f"ledger latency = **{out['commit_to_queryable_p50_s']} s** "
            f"(all samples: {out['commit_to_queryable_all_s']}). The ledger "
            "is the committed snapshot chain, so this IS the moment a "
            "reader resolving the latest snapshot serves the batch.\n"
        )
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH", "BASELINE.md"),
            "a",
        ) as f:
            f.write(sec)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
