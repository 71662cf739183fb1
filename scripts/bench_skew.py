"""Skewed-corpus build evidence: the head-term bucket-split packing must
keep build throughput and 8→32 scaling efficiency within ~1.2× of the
uniform corpus when one term sits in 80% of documents (plus a Zipf tail).

The hot term's posting list is ~0.8·n_docs long — orders of magnitude past
any normal term — which is exactly the shape that breaks per-term
parallelism unless postings are doc-bucketed (``bucket = xxhash64(doc_id)
% n_buckets`` splits every list into n_buckets independent groups at
tokenize time, so the packer's unit of work is bounded by the bucket, not
the term).

Builds run with stop_k=10 (the fixture's guaranteed head terms) so the
hot term is NOT absorbed into the stop list: it must flow through
tokenize → aggregate → pack as a real indexed term.

Usage:
  python scripts/bench_skew.py               # orchestrate + print JSON
  python scripts/bench_skew.py --worker 32 uniform   # internal
Env: SKEW_DOCS=100000, BENCH_APPEND=1 appends the table to
BENCH/BASELINE.md.
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

N_DOCS = int(os.environ.get("SKEW_DOCS", "100000"))
LEVELS = (8, 32)
N_BUCKETS = 32
BUILD_REPS = 2


def corpus_path(kind: str) -> str:
    return f"/tmp/ir_skew_corpus_{kind}_{N_DOCS}.parquet"


def ensure_corpora() -> None:
    from information_retrieval_spark.fixtures import (
        skewed_corpus_rows,
        write_corpus_parquet,
    )

    if not os.path.exists(corpus_path("uniform")):
        write_corpus_parquet(corpus_path("uniform"), N_DOCS)
    if not os.path.exists(corpus_path("skew")):
        write_corpus_parquet(
            corpus_path("skew"), N_DOCS, rows=skewed_corpus_rows(N_DOCS)
        )


def worker(cores: int, kind: str) -> None:
    from information_retrieval_spark.index.build import IndexBuilder
    from information_retrieval_spark.session import get_spark

    spark = get_spark(
        f"skew_{kind}_{cores}", master=f"local[{cores}]", shuffle_partitions=32
    )
    corpus = spark.read.parquet(corpus_path(kind))
    corpus.count()  # warm

    build_times = []
    for rep in range(BUILD_REPS):
        idx = tempfile.mkdtemp(prefix=f"skew_idx_{kind}_{cores}_{rep}_")
        t0 = time.time()
        IndexBuilder(
            spark, idx, {"title": "path", "abstract": "content"},
            tokenizer="code", stop_k=10, n_buckets=N_BUCKETS,
        ).build(corpus)
        build_times.append(time.time() - t0)
        # sanity: the hot term must be indexed (not stop-filtered) on skew
        if kind == "skew" and rep == 0:
            stops = {
                r.term
                for r in spark.read.parquet(os.path.join(idx, "stopwords"))
                .collect()
            }
            assert "skewhot" not in stops, "hot term fell into the stop list"
        shutil.rmtree(idx, ignore_errors=True)
    build_s = min(build_times)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "kind": kind,
                "build_s": round(build_s, 2),
                "files_per_sec": round(N_DOCS / build_s, 1),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        ensure_corpora()
        worker(int(sys.argv[2]), sys.argv[3])
        return

    ensure_corpora()
    res: dict[tuple[str, int], dict] = {}
    for kind in ("uniform", "skew"):
        for cores in LEVELS:
            p = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(cores), kind,
                ],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [
                l for l in p.stdout.splitlines()
                if l.startswith("WORKER_RESULT ")
            ]
            if not lines:
                print(p.stdout[-3000:], p.stderr[-3000:])
                raise SystemExit(f"worker {kind}/{cores} failed")
            res[(kind, cores)] = json.loads(lines[-1][len("WORKER_RESULT "):])
            print(json.dumps(res[(kind, cores)]))

    n, n4 = LEVELS
    ratio = n4 / n
    out = {"n_docs": N_DOCS}
    for kind in ("uniform", "skew"):
        out[f"{kind}_build_s_{n}"] = res[(kind, n)]["build_s"]
        out[f"{kind}_build_s_{n4}"] = res[(kind, n4)]["build_s"]
        out[f"{kind}_eff"] = round(
            (res[(kind, n4)]["files_per_sec"] / res[(kind, n)]["files_per_sec"])
            / ratio,
            3,
        )
    out["skew_over_uniform_build_ratio"] = round(
        res[("skew", n4)]["build_s"] / res[("uniform", n4)]["build_s"], 3
    )
    out["skew_over_uniform_eff_ratio"] = round(
        out["uniform_eff"] / out["skew_eff"], 3
    )
    print("SKEW_BENCH " + json.dumps(out))

    if os.environ.get("BENCH_APPEND") == "1":
        tbl = (
            "\n### Skewed-corpus build (head-term stress, "
            f"{N_DOCS} files, n_buckets={N_BUCKETS}, stop_k=10)\n\n"
            "One term (`skewhot`) in ~80% of docs + Zipf tail "
            "(`fixtures.skewed_corpus_rows`); same job, both parallelism "
            "levels, best-of-2 builds, separate JVMs.\n\n"
            "| corpus | build s @8 | build s @32 | files/s @32 | eff 8→32 |\n"
            "|---|---|---|---|---|\n"
        )
        for kind in ("uniform", "skew"):
            r8, r32 = res[(kind, 8)], res[(kind, 32)]
            tbl += (
                f"| {kind} | {r8['build_s']} | {r32['build_s']}"
                f" | {r32['files_per_sec']} | {out[f'{kind}_eff']} |\n"
            )
        tbl += (
            f"\nskew/uniform build-time ratio @32 = "
            f"**{out['skew_over_uniform_build_ratio']}** "
            f"(target ≤ ~1.2×); efficiency ratio = "
            f"{out['skew_over_uniform_eff_ratio']}.\n"
        )
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH", "BASELINE.md"),
            "a",
        ) as f:
            f.write(tbl)


if __name__ == "__main__":
    main()
