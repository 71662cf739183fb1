"""Streaming commit-to-queryable latency DECOMPOSITION (round-4 measured
p50 = 6.33 s for a 500-doc batch; this attributes it).

The steady-state latency is
    file-landed → micro-batch scheduled   (Structured Streaming overhead)
  + stage_add                             (tokenize → postings/pack/aggs)
  + commit_add                            (renames + one snapshot swap)

Structured Streaming's share is measured as (end-to-end p50 from
`bench_streaming.py`) − (stage+commit walls here); the stage walls come
from `IndexMaintenance.last_stage_timings` (per-step) and
`last_commit_s`. Reps run against the SAME warm session and base index a
continuous stream would have.

Usage: python scripts/bench_stream_latency.py  (env: LAT_BASE=20000
LAT_BATCH_DOCS=500 LAT_REPS=6; BENCH_APPEND=1 appends to
BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(os.environ.get("LAT_BASE", "20000"))
BATCH_DOCS = int(os.environ.get("LAT_BATCH_DOCS", "500"))
REPS = int(os.environ.get("LAT_REPS", "6"))


def main() -> None:
    from information_retrieval_spark.fixtures import corpus_rows
    from information_retrieval_spark.index.build import IndexBuilder
    from information_retrieval_spark.index.maintenance import IndexMaintenance
    from information_retrieval_spark.session import get_spark

    spark = get_spark("bench_stream_latency", shuffle_partitions=32)
    rows = corpus_rows(N_BASE + REPS * BATCH_DOCS)
    schema = (
        "doc_id long, repo string, path string, commit string,"
        " lang string, content string"
    )

    def df_of(chunk):
        return spark.createDataFrame(
            [(r.doc_id, r.repo, r.path, r.commit, r.lang, r.content)
             for r in chunk],
            schema,
        )

    work = tempfile.mkdtemp(prefix="bench_stream_lat_")
    idx = os.path.join(work, "idx")
    IndexBuilder(
        spark, idx, {"title": "path", "abstract": "content"},
        tokenizer="code", n_buckets=32,
    ).build(df_of(rows[:N_BASE]))
    maint = IndexMaintenance(spark, idx)

    per_step: dict[str, list[float]] = {}
    commits, totals = [], []
    for r in range(REPS):
        lo = N_BASE + r * BATCH_DOCS
        chunk = df_of(rows[lo:lo + BATCH_DOCS])
        stage = os.path.join(idx, "__stage_add")
        t0 = time.time()
        maint.stage_add(chunk, stage)
        maint.commit_add(stage)
        totals.append(time.time() - t0)
        shutil.rmtree(stage)
        for k, v in maint.last_stage_timings.items():
            per_step.setdefault(k, []).append(v)
        commits.append(maint.last_commit_s)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    steps = {k: round(med(v), 2) for k, v in sorted(per_step.items())}
    out = {
        "base_docs": N_BASE,
        "batch_docs": BATCH_DOCS,
        "reps": REPS,
        "stage_plus_commit_p50_s": round(med(totals), 2),
        "commit_p50_s": round(med(commits), 2),
        "stage_steps_p50_s": steps,
        "all_totals_s": [round(x, 2) for x in sorted(totals)],
    }
    print("STREAM_LAT " + json.dumps(out))

    if os.environ.get("BENCH_APPEND") == "1":
        stamp = time.strftime("%Y-%m-%d %H:%MZ", time.gmtime())
        lines = [
            f"\n### Streaming latency decomposition ({stamp},"
            f" `scripts/bench_stream_latency.py`, {BATCH_DOCS}-doc batches"
            f" on a {N_BASE}-doc base, warm session)\n\n"
            f"stage_add + commit_add p50 = **{out['stage_plus_commit_p50_s']} s**"
            f" (commit alone {out['commit_p50_s']} s — metadata renames +"
            " one snapshot swap). Per-step medians inside stage_add:\n\n"
            "| step | p50 (s) |\n|---|---|\n"
        ]
        for k, v in steps.items():
            lines.append(f"| {k} | {v} |\n")
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH", "BASELINE.md"), "a"
        ) as f:
            f.writelines(lines)
        print("appended to BENCH/BASELINE.md")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
