"""Size-capped compaction economics (index/maintenance.py
``compact(target_bytes=...)``): after a capped compact splits the index
into K = ceil(bytes / cap) sibling segments, the WORST-CASE future
rewrite unit (purging a tombstone physically, re-merging one segment)
is the CAP, not the index. This bench measures that directly at the
1M-doc layout VERDICT r4 asked for:

  * build one 1M-doc base index, copy it per config
  * uncapped floor: remove 10 docs -> full compact()   (whole rewrite)
  * cap = total/4 and cap = total/16: capped full compact (one-time,
    rewrites everything once — the same price any compaction pays),
    then remove 10 docs resident in split 0 and
    ``compact(segments=[0])`` — the physical purge touches ONE split

Expected: purge wall ∝ cap (three points on a line); content hash
identical across src / capped copies before mutation.

Usage: python scripts/bench_capped.py     # CAPPED_DOCS=1000000
prints one JSON line and appends a section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("CAPPED_DOCS", "1000000"))
FRACS = [int(f) for f in os.environ.get("CAPPED_FRACS", "4 16").split()]


def main() -> None:
    from pyspark.sql import functions as F

    from information_retrieval_spark.fixtures import write_corpus_parquet
    from information_retrieval_spark.index.build import (
        IndexBuilder,
        index_content_hash,
    )
    from information_retrieval_spark.index.catalog import table_dirs
    from information_retrieval_spark.index.maintenance import IndexMaintenance
    from information_retrieval_spark.session import get_spark

    corpus_path = os.environ.get(
        "CAPPED_CORPUS", f"/tmp/ir_incr_corpus_{N_DOCS}.parquet"
    )
    if not os.path.exists(corpus_path):
        write_corpus_parquet(corpus_path, N_DOCS)

    spark = get_spark("bench_capped", shuffle_partitions=32)
    corpus = spark.read.parquet(corpus_path)

    work = "/tmp/ir_capped_work"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    src = os.path.join(work, "src")
    t0 = time.time()
    IndexBuilder(
        spark, src, {"title": "path", "abstract": "content"},
        tokenizer="code", n_buckets=32,
    ).build(corpus)
    build_s = time.time() - t0
    h_src = index_content_hash(spark, src)
    total = sum(IndexMaintenance(spark, src).segment_sizes())

    def purge_ten(idx: str, seg: int) -> float:
        """Remove 10 docs resident in packed segment ``seg`` (read off
        its doclen dir — residency is empirical, not re-derived from the
        split hash) and physically purge them by re-merging that one
        segment. Returns the purge wall (the future rewrite unit)."""
        m = IndexMaintenance(spark, idx)
        ids = [
            r.doc_id
            for r in spark.read.parquet(table_dirs(idx, "doclen")[seg])
            .select("doc_id").distinct().limit(10).collect()
        ]
        assert len(ids) == 10
        m.remove_documents(ids)
        t = time.time()
        if len(table_dirs(idx, "packed")) == 1:
            m.compact()  # uncapped: the only rewrite unit is everything
        else:
            m.compact(segments=[seg])
        return time.time() - t

    rows = []
    # uncapped floor: the rewrite unit is the whole index
    floor_idx = os.path.join(work, "uncapped")
    shutil.copytree(src, floor_idx)
    purge_s = purge_ten(floor_idx, 0)
    rows.append(("uncapped", total, 1, None, purge_s))
    print(f"uncapped: purge-unit {purge_s:.1f}s", flush=True)

    for f in FRACS:
        cap = -(-total // f)  # ceil
        idx = os.path.join(work, f"cap{f}")
        shutil.copytree(src, idx)
        m = IndexMaintenance(spark, idx)
        t0 = time.time()
        m.compact(target_bytes=cap)
        split_s = time.time() - t0
        sizes = m.segment_sizes()
        assert len(sizes) == f, (f, len(sizes))
        h = index_content_hash(spark, idx)
        assert h == h_src, (f, h, h_src)
        purge_s = purge_ten(idx, 0)
        rows.append((f"total/{f}", cap, len(sizes), split_s, purge_s))
        print(
            f"cap=total/{f}: split {split_s:.1f}s -> {len(sizes)} segments"
            f" (max {max(sizes)/1e6:.0f} MB), purge-unit {purge_s:.1f}s",
            flush=True,
        )

    out = {
        "metric": "capped_compaction_purge_unit",
        "n_docs": N_DOCS,
        "index_mb": round(total / 1e6, 1),
        "build_s": round(build_s, 1),
        "rows": [
            {"cap": r[0], "cap_bytes": r[1], "segments": r[2],
             "split_s": None if r[3] is None else round(r[3], 1),
             "purge_s": round(r[4], 1)}
            for r in rows
        ],
    }
    print(json.dumps(out))

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ"
    )
    lines = [
        f"\n### Size-capped compaction: future rewrite units ∝ cap "
        f"({stamp}, `scripts/bench_capped.py`, local[32])\n",
        f"One {N_DOCS:,}-doc base index ({total/1e6:,.0f} MB packed+flat),"
        f" copied byte-identically per config. \"purge unit\" = remove 10"
        f" docs, then the physical purge rewrite (full compact when"
        f" uncapped; re-merge of the ONE split holding them when capped)."
        f" Capped splits verified content-hash-identical to src before"
        f" mutation.\n",
        "| cap | one-time split wall (s) | segments | purge-unit wall (s) |",
        "|---|---|---|---|",
    ]
    for label, _cap, nseg, split_s, purge_s in rows:
        s = "—" if split_s is None else f"{split_s:.1f}"
        lines.append(f"| {label} | {s} | {nseg} | {purge_s:.1f} |")
    with open("BENCH/BASELINE.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
