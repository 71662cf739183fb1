"""Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 going
N → 4N executors; sandbox proxy = the SAME job at local[8] vs local[32]
on the SAME input — no real cluster available here).

Runs the full index build (tokenize → aggregate → postings → pack) plus a
BM25 WAND query batch over a deterministic synthetic code corpus at both
parallelism levels in SEPARATE JVMs (a SparkSession master is fixed per
process), then writes BENCH/BASELINE.md with throughput at both levels and
  efficiency = (files_per_sec@4N / files_per_sec@N) / 4

Usage:
  python scripts/bench_scaling.py            # orchestrate + write report
  python scripts/bench_scaling.py --worker 8 # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_DOCS", "100000"))
LEVELS = (8, 32)
CORPUS = f"/tmp/ir_scaling_corpus_{N_DOCS}.parquet"
QUERY_REPS = 3
# One WAND bucket per core at the larger level: the scoring stage's task
# count equals n_buckets, so 8 (the library default, sized for tests)
# caps query parallelism at 8 and the 32-core level can only lose.
# Identical at both levels — the index content hash stays parallelism-
# independent (bucket is a pure function of doc_id).
N_BUCKETS = 32


def ensure_corpus() -> None:
    if not os.path.exists(CORPUS):
        from information_retrieval_spark.fixtures import write_corpus_parquet

        write_corpus_parquet(CORPUS, N_DOCS)


def worker(cores: int) -> None:
    from information_retrieval_spark.fixtures import make_queries
    from information_retrieval_spark.index.build import IndexBuilder
    from information_retrieval_spark.query.engine import QuerySpec
    from information_retrieval_spark.query.wand import WandEngine
    from information_retrieval_spark.session import get_spark

    # vary ONLY the core count: identical shuffle partitioning etc., so the
    # two measurements differ in parallelism alone (no confounds)
    spark = get_spark(
        f"scaling_{cores}", master=f"local[{cores}]", shuffle_partitions=32
    )
    corpus = spark.read.parquet(CORPUS)
    corpus.count()  # warm

    build_times = []
    for rep in range(3):  # best-of-3: absorbs JVM/codegen warmup + GC variance
        idx = tempfile.mkdtemp(prefix=f"scaling_idx_{cores}_{rep}_")
        t0 = time.time()
        IndexBuilder(
            spark, idx, {"title": "path", "abstract": "content"},
            tokenizer="code", n_buckets=N_BUCKETS,
        ).build(corpus)
        build_times.append(time.time() - t0)
        if rep < 2:  # keep only the last rep's index for the query phase
            shutil.rmtree(idx, ignore_errors=True)
    build_s = min(build_times)
    try:

        eng = WandEngine(spark, idx)
        specs = [
            QuerySpec(q.query_id, q.query_text, "okapi25", 10,
                      spell=False, match_mode="exact")
            for q in make_queries(30)
            if q.method == "okapi25"
        ]
        lat = []
        for _ in range(QUERY_REPS):
            t0 = time.time()
            eng.search(specs).collect()
            lat.append(time.time() - t0)
        lat.sort()
        from information_retrieval_spark.index.build import index_content_hash

        print(
            "WORKER_RESULT "
            + json.dumps(
                {
                    "cores": cores,
                    "build_s": round(build_s, 2),
                    "files_per_sec": round(N_DOCS / build_s, 1),
                    "query_batch_p50_s": round(lat[len(lat) // 2], 3),
                    "index_hash": index_content_hash(spark, idx),
                }
            )
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


N_RUNS = int(os.environ.get("SCALING_RUNS", "3"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        ensure_corpus()
        worker(int(sys.argv[2]))
        return

    ensure_corpus()
    n, n4 = LEVELS
    ratio = n4 / n
    runs = []
    for run_no in range(N_RUNS):
        results = {}
        for cores in LEVELS:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
                capture_output=True, text=True, timeout=1800,
            )
            line = [
                l for l in p.stdout.splitlines()
                if l.startswith("WORKER_RESULT ")
            ]
            if not line:
                print(p.stdout[-3000:], p.stderr[-3000:])
                raise SystemExit(f"worker {cores} failed (run {run_no})")
            results[cores] = json.loads(line[-1][len("WORKER_RESULT "):])
        r1, r4 = results[n], results[n4]
        runs.append(
            {
                "run": run_no + 1,
                "r1": r1,
                "r4": r4,
                "eff": (r4["files_per_sec"] / r1["files_per_sec"]) / ratio,
                "speedup_q": r1["query_batch_p50_s"] / r4["query_batch_p50_s"],
                "hash_equal": r1["index_hash"] == r4["index_hash"],
            }
        )
        print(json.dumps({k: runs[-1][k] for k in ("run", "eff", "speedup_q")}))

    eff_med = _median([r["eff"] for r in runs])
    spq_med = _median([r["speedup_q"] for r in runs])
    all_hash = all(r["hash_equal"] for r in runs)

    run_rows = "\n".join(
        f"| {r['run']} | {r['r1']['build_s']} | {r['r1']['files_per_sec']}"
        f" | {r['r4']['build_s']} | {r['r4']['files_per_sec']}"
        f" | {r['eff']:.3f} | {r['r1']['query_batch_p50_s']}"
        f" | {r['r4']['query_batch_p50_s']} | {r['speedup_q']:.2f}× |"
        for r in runs
    )
    os.makedirs("BENCH", exist_ok=True)
    # APPEND a dated batch section — BENCH/BASELINE.md is hand-curated
    # (multiple batches, incremental/fan-in/sf1.0 evidence); rewriting it
    # wholesale destroyed curated sections in earlier rounds
    import datetime

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ"
    )
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(f"""

## Scaling batch (appended {stamp})

Generated by `python scripts/bench_scaling.py` (deterministic synthetic code
corpus, {N_DOCS} files, code tokenizer, full build; query: block-max WAND,
18-query BM25 batch ×{QUERY_REPS}, p50). **{N_RUNS} full runs; the
reported efficiency is the MEDIAN across runs** (single-run numbers on
this sandbox vary with background load).

| run | build@{n} (s) | files/s@{n} | build@{n4} (s) | files/s@{n4} | per-core eff | WAND p50@{n} (s) | WAND p50@{n4} (s) | q speedup |
|---|---|---|---|---|---|---|---|---|
{run_rows}

* **Build scaling efficiency ({n}→{n4} cores, per-core, median of
  {N_RUNS}):** **{eff_med:.3f}** (target ≥ 0.8 — note single-JVM local
  mode shares one shuffle service & GC; a real 4N-executor cluster has no
  such shared-process ceiling)
* **Query batch speedup {n}→{n4} cores (median):** {spq_med:.2f}×
* **Determinism:** index content hash identical across parallelism levels
  in every run: {all_hash} ({runs[0]['r1']['index_hash']})

Per-round operator timings land in `BENCH_r{{N}}.json` via `bench.py`
(steady-state best-of-2 per op at sf0.1, local[32]).
""")
    print(json.dumps({
        "efficiency_build_median": round(eff_med, 3),
        "query_speedup_median": round(spq_med, 2),
        "hash_equal": all_hash,
        "runs": [round(r["eff"], 3) for r in runs],
    }))


if __name__ == "__main__":
    main()
