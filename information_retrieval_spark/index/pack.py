"""Packed block-max index shards (north_star layout).

Turns the flat postings table (`index/build.py`) into compressed shard rows:

  (term, section, bucket, block_id,
   n, first_doc, last_doc,
   docs_bin, tfs_bin, dls_bin,          -- varint blocks (docs delta-gapped)
   max_tf, min_dl)

* ``bucket`` = pmod(xxhash64(doc_id), n_buckets) — carried from the build so
  a head term's postings split across buckets: no single pack task (or WAND
  task) ever holds a full head-term posting list. This is the explicit skew
  handling the groupBy(term) build needs (SURVEY.md §4.1).
* blocks of ``BLOCK`` postings sorted by doc_id; per-block (max_tf, min_dl)
  give a query-time BM25 upper bound: tf_norm(tf, dl) is monotone ↑ in tf
  and ↓ in dl, so tf_norm(max_tf, min_dl) bounds every posting in the block
  for ANY avgdl — the per-query idf/avgdl (quirks Q1/Q2) are applied at
  query time, which is why the block stores tf-side components only
  (SURVEY.md §7 hard-part b).
* packing runs in ``applyInPandas`` over (term, section, bucket) groups —
  numpy codec, no per-row Python; output written sorted by term so parquet
  row-group min/max stats prune query-term lookups.

Reference parity: the persisted logical model is the reference's flat
`(word, postings)` stream (`ir-phase-1.ipynb:c25:102-132`); the vb codec is
its variable-byte format with delta-gapped doc_ids (deviation Q9 noted in
codec.py).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from information_retrieval_spark.index.codec import encode_doc_gaps, varint_encode

BLOCK = 128

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("section", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("docs_bin", T.BinaryType(), False),
        T.StructField("tfs_bin", T.BinaryType(), False),
        T.StructField("dls_bin", T.BinaryType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
    ]
)


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, section, bucket) posting run → block rows."""
    pdf = pdf.sort_values("doc_id")
    docs = pdf["doc_id"].to_numpy(np.uint64)
    tfs = pdf["tf"].to_numpy(np.uint64)
    dls = pdf["dl"].to_numpy(np.uint64)
    term = pdf["term"].iloc[0]
    section = pdf["section"].iloc[0]
    bucket = int(pdf["bucket"].iloc[0])
    rows = []
    for b, s in enumerate(range(0, len(docs), BLOCK)):
        d, t, l = docs[s : s + BLOCK], tfs[s : s + BLOCK], dls[s : s + BLOCK]
        rows.append(
            (
                term, section, bucket, b, len(d),
                int(d[0]), int(d[-1]),
                encode_doc_gaps(d), varint_encode(t), varint_encode(l),
                int(t.max()), int(l.min()),
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])


def pack_index(spark: SparkSession, index_dir: str) -> str:
    """postings_flat + doclen → ``packed`` shard table; returns its path.

    Plan: postings ⨝ doclen (shuffle keyed doc_id,section — or broadcast at
    small SF via AQE) → applyInPandas per (term, section, bucket) →
    range-repartition + sortWithinPartitions(term) for row-group pruning.
    """
    postings = spark.read.parquet(os.path.join(index_dir, "postings_flat"))
    doclen = spark.read.parquet(os.path.join(index_dir, "doclen"))
    joined = postings.select("term", "section", "bucket", "doc_id", "tf").join(
        doclen, ["doc_id", "section"]
    )
    packed = joined.groupBy("term", "section", "bucket").applyInPandas(
        _pack_group, PACKED_SCHEMA
    )
    out = os.path.join(index_dir, "packed")
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    (
        packed.repartitionByRange(n_part, "term", "section", "bucket")
        .sortWithinPartitions("term", "section", "bucket", "block_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def packed_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-(term, section) df computed WITHOUT decoding: Σ block n."""
    packed = spark.read.parquet(os.path.join(index_dir, "packed"))
    return packed.groupBy("term", "section").agg(F.sum("n").alias("df_sec"))
