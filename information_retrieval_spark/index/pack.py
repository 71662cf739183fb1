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
* packing runs in ``mapInPandas`` over partitions hash-keyed and sorted by
  (term, section, bucket, doc_id) — one numpy group-boundary scan per Arrow
  batch with cross-batch carry (6× faster than per-group applyInPandas);
  output written sorted by term so parquet row-group min/max stats prune
  query-term lookups.

Reference parity: the persisted logical model is the reference's flat
`(word, postings)` stream (`ir-phase-1.ipynb:c25:102-132`); the vb codec is
its variable-byte format with delta-gapped doc_ids (deviation Q9 noted in
codec.py).
"""

from __future__ import annotations

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



def _pack_rows(pdf: pd.DataFrame, rows: list) -> None:
    """Sorted (term, section, bucket, doc_id) rows → block tuples appended
    to ``rows``. One numpy groupby over the whole frame — no per-group
    pandas objects (that overhead dominated the applyInPandas variant)."""
    terms = pdf["term"].to_numpy()
    secs = pdf["section"].to_numpy()
    bucks = pdf["bucket"].to_numpy()
    docs = pdf["doc_id"].to_numpy(np.uint64)
    tfs = pdf["tf"].to_numpy(np.uint64)
    dls = pdf["dl"].to_numpy(np.uint64)
    n = len(pdf)
    if n == 0:
        return
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (
        (terms[1:] != terms[:-1])
        | (secs[1:] != secs[:-1])
        | (bucks[1:] != bucks[:-1])
    )
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    for g0, g1 in zip(starts, ends):
        term, section, bucket = terms[g0], secs[g0], int(bucks[g0])
        for b, s in enumerate(range(g0, g1, BLOCK)):
            e = min(s + BLOCK, g1)
            d, t, l = docs[s:e], tfs[s:e], dls[s:e]
            rows.append(
                (
                    term, section, bucket, b, len(d),
                    int(d[0]), int(d[-1]),
                    encode_doc_gaps(d), varint_encode(t), varint_encode(l),
                    int(t.max()), int(l.min()),
                )
            )


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, section, bucket) posting run → block rows (applyInPandas
    entry point, kept for callers packing a single group)."""
    pdf = pdf.sort_values("doc_id")
    rows: list = []
    _pack_rows(pdf, rows)
    return pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])


def pack_postings(
    postings: DataFrame, doclen: DataFrame | None, out: str
) -> str:
    """Pack ONE coherent posting set (a full index, or one LSM segment's
    delta — index/maintenance.py) into a sorted block-max shard dir.
    Callers pass EXPLICIT inputs — there is deliberately no
    resolve-from-index-dir convenience, because packing through the
    catalog during an in-place rebuild would union stale delta dirs.

    Plan: when the postings rows carry the denormalized ``dls`` map
    (build.py s_postings embeds the doc's full {section: dl} vector on
    every row), dl is read straight off the row — NO join, so the only
    posting-sized shuffle in the whole pack is the group-key repartition
    below. ``doclen`` is the fallback for dls-less posting frames (one
    extra shuffle join). Then ONE shuffle: hash-repartition on the group
    key + sortWithinPartitions(key, doc_id) → ``mapInPandas`` packs whole
    partitions (cross-batch carry keeps a group's run contiguous). Written
    range-partitioned + sorted by term so parquet row-group min/max stats
    prune query-term lookups.
    """
    spark = postings.sparkSession
    if "dls" in postings.columns:
        # dls always contains the row's own section (the row is itself a
        # non-stop posting of that (doc, section)), so element_at is total
        joined = postings.select(
            "term", "section", "bucket", "doc_id", "tf",
            F.expr("dls[section]").cast("long").alias("dl"),
        )
    else:
        if doclen is None:
            raise ValueError(
                "pack_postings: postings lack a 'dls' column and no doclen"
                " frame was provided"
            )
        joined = postings.select(
            "term", "section", "bucket", "doc_id", "tf"
        ).join(doclen, ["doc_id", "section"])
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    cols = [f.name for f in PACKED_SCHEMA.fields]

    def pack_partition(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # the last group may continue in the next Arrow batch: hold it
            last = pdf.iloc[-1]
            tail = (
                (pdf["term"].to_numpy() == last["term"])
                & (pdf["section"].to_numpy() == last["section"])
                & (pdf["bucket"].to_numpy() == last["bucket"])
            )
            split = len(pdf) - int(tail.sum())
            carry = pdf.iloc[split:]
            rows: list = []
            _pack_rows(pdf.iloc[:split], rows)
            if rows:
                yield pd.DataFrame(rows, columns=cols)
        if carry is not None and len(carry):
            rows = []
            _pack_rows(carry, rows)
            yield pd.DataFrame(rows, columns=cols)

    packed = (
        joined.repartition(n_part, "term", "section", "bucket")
        .sortWithinPartitions("term", "section", "bucket", "doc_id")
        .mapInPandas(pack_partition, PACKED_SCHEMA)
    )
    (
        packed.repartitionByRange(n_part, "term", "section", "bucket")
        .sortWithinPartitions("term", "section", "bucket", "block_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def packed_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-(term, section) df computed WITHOUT decoding: Σ block n
    (across all LSM segments — doc sets are disjoint, so n's add)."""
    from information_retrieval_spark.index.catalog import read_packed

    packed = read_packed(spark, index_dir)
    return packed.groupBy("term", "section").agg(F.sum("n").alias("df_sec"))
