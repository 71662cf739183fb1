"""ANN quality/cost dial: recall@k of the LSH and IVF paths vs the brute
cosine ground truth, plus the candidate fraction each configuration
examines (the number that matters at 10^9 vectors — wall-clock at
2k/20k test vectors is stage-overhead-dominated, candidate fraction is
scale-invariant).

Ground truth: `similarity.brute_topk` (exact, one broadcast-join scan)
over queries vec_id < N_QUERIES. Each ANN config reports
  recall@k   = mean over queries of |ann top-k ∩ brute top-k| / k
  cand_frac  = distinct (query, candidate) pairs scored / (Q · (N−1))
  batch_s    = best-of-2 wall-clock for the whole query batch

Usage:
  python scripts/bench_ann_recall.py [sf_dir ...]   # default sf0.1 + /tmp sf1.0
Appends a dated section to BENCH/BASELINE.md when --write is passed.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from information_retrieval_spark.ops import similarity as S
from information_retrieval_spark.session import get_spark

N_QUERIES = 50
K = 10


def lsh_candidate_count(e, n_query, n_tables, n_bits, multi_probe):
    """Distinct (query, candidate) pairs the LSH config would exact-score
    (mirrors the cand sub-plan of `similarity.lsh_topk`)."""
    buckets = S.srp_buckets(e, n_tables, n_bits)
    eb = e.select("vec_id").join(buckets, "vec_id")
    q = eb.filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("query_id"),
        "tbl",
        F.col("bucket").alias("qbucket"),
    )
    probe_set = [F.col("qbucket")]
    if multi_probe:
        probe_set += [
            F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)
        ]
    probes = q.select(
        "query_id", "tbl", F.explode(F.array(*probe_set)).alias("bucket")
    )
    return (
        eb.join(F.broadcast(probes), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )


def ivf_candidate_count(spark, sf_dir, n_query, n_probe, k_cells=None):
    from pyspark.sql import Window

    from information_retrieval_spark.ops.ml import (
        kmeans_assign,
        kmeans_centroids,
    )

    comp, cent = kmeans_centroids(spark, sf_dir, k_clusters=k_cells)
    assign = kmeans_assign(comp, cent)
    qcomp = comp.filter(F.col("vec_id") < n_query)
    qdist = (
        qcomp.join(F.broadcast(cent), "dim")
        .groupBy(F.col("vec_id").alias("query_id"), "k")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc(F.round("d2", 9)), F.asc("k"))
    probes = (
        qdist.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", F.col("k").alias("cluster"))
    )
    return (
        assign.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .count()
    )


def recall_at_k(truth_rows, got_rows):
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    per_q = [
        len(truth[q] & got.get(q, set())) / max(1, len(truth[q])) for q in truth
    ]
    return sum(per_q) / len(per_q)


def timed_collect(mk_df):
    best, rows = float("inf"), None
    for _ in range(2):
        t0 = time.time()
        rows = mk_df().collect()
        best = min(best, time.time() - t0)
    return best, rows


def run_dir(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = e.count()
    denom = N_QUERIES * (n - 1)
    brute_s, truth = timed_collect(lambda: S.brute_topk(e, N_QUERIES, K))
    rows = [("brute (truth)", brute_s, 1.0, 1.0)]

    lsh_cfgs = [
        (1, S.SRP_BITS, False),
        (1, S.SRP_BITS, True),
        (2, S.SRP_BITS, True),
        (S.N_TABLES, S.SRP_BITS, True),
    ]
    for L, bits, probe in lsh_cfgs:
        t, got = timed_collect(lambda: S.lsh_topk(e, N_QUERIES, K, L, bits, probe))
        cf = lsh_candidate_count(e, N_QUERIES, L, bits, probe) / denom
        label = f"LSH L={L} b={bits}{' +probe' if probe else ''}"
        rows.append((label, t, recall_at_k(truth, got), cf))

    for p in (1, 2, 4):
        t, got = timed_collect(lambda: S.ivf_topk(spark, sf_dir, N_QUERIES, K, p))
        cf = ivf_candidate_count(spark, sf_dir, N_QUERIES, p) / denom
        rows.append((f"IVF probe={p}", t, recall_at_k(truth, got), cf))

    # production sizing: K ≈ √N cells — probe-1 candidate work ~√N/query
    # (the oracle entry keeps the tiny shared K; this is the scale dial)
    k_cells = max(8, int(round(n ** 0.5)))
    for p in (1, 2):
        t, got = timed_collect(
            lambda: S.ivf_topk(spark, sf_dir, N_QUERIES, K, p, k_cells=k_cells)
        )
        cf = ivf_candidate_count(spark, sf_dir, N_QUERIES, p, k_cells) / denom
        rows.append(
            (f"IVF K=√N={k_cells} probe={p}", t, recall_at_k(truth, got), cf)
        )

    e.unpersist()
    return n, rows


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/testdata/sf1.0"]
    dirs = [d for d in dirs if d != "--write" and os.path.exists(d)]
    write = "--write" in sys.argv
    spark = get_spark("ann_recall")
    sections = []
    for d in dirs:
        n, rows = run_dir(spark, d)
        lines = [
            f"\n#### {d} — {n} vectors, {N_QUERIES} queries, k={K}\n",
            "| config | batch s (best-of-2) | recall@10 | cand frac |",
            "|---|---|---|---|",
        ]
        for label, t, rec, cf in rows:
            lines.append(f"| {label} | {t:.2f} | {rec:.3f} | {cf:.4f} |")
        sec = "\n".join(lines)
        print(sec)
        sections.append(sec)
    if write:
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%MZ"
        )
        with open("BENCH/BASELINE.md", "a") as f:
            f.write(
                f"\n### ANN recall/cost dial ({stamp}, "
                f"`scripts/bench_ann_recall.py`)\n"
                + "\n".join(sections)
                + "\n"
            )


if __name__ == "__main__":
    main()
