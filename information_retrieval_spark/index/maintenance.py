"""Dynamic index maintenance: add / remove documents without a full rebuild.

Reference analogue: `add_document` / `remove_document`
(`ir-phase-1.ipynb:c22-23`, trie insert/delete `trie/phase1.py:38-42`) —
re-expressed for an immutable-files world (SURVEY.md §2.10 Spark mapping):

* **add_documents(delta)** — tokenize ONLY the new docs with the same
  pipeline, append their postings/doclen partitions, and re-derive the
  merged term_df / stats tables incrementally (old aggregate + delta
  aggregate — no rescan of the existing corpus).
* **remove_documents(doc_ids)** — logical delete: append to a
  ``deleted_docs`` side table consulted at query time (delete-vector
  pattern; Iceberg's equality-delete equivalent). ``compact()`` rewrites
  postings physically and clears the vector.

Query-time integration: ``SearchEngine``/``WandEngine`` subtract deleted
docs via an anti-join (and the per-query candidate stats recompute from the
filtered set, so the BM25 quirks stay exact after deletes).

Scale notes: adds touch only delta-sized data plus aggregate-sized tables;
deletes are O(1) appends; compaction is the only full rewrite and is
explicit — the exact economics of log-structured index maintenance.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from information_retrieval_spark.index.build import tokenize_corpus


class IndexMaintenance:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.config = json.load(f)["config"]

    def _p(self, t: str) -> str:
        return os.path.join(self.index_dir, t)

    # ------------------------------------------------------------------ add

    def add_documents(self, delta: DataFrame) -> int:
        """Append postings/doclen for new docs; incrementally merge term_df
        and stats. New doc_ids must not collide with existing ones (caller
        contract, as in the reference's add_document)."""
        spark = self.spark
        sections = self.config["sections"]
        tokenizer = self.config["tokenizer"]
        n_buckets = self.config.get("n_buckets", 8)

        tokens = tokenize_corpus(delta, sections, tokenizer)
        stop = spark.read.parquet(self._p("stopwords")).select("term")
        ns = tokens.join(F.broadcast(stop), "term", "left_anti")

        tf = (
            ns.groupBy("term", "section", "doc_id")
            .agg(F.array_sort(F.collect_set("pos")).alias("positions"))
            .withColumn("tf", F.size("positions"))
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"),
            )
        )
        tf.write.mode("append").parquet(self._p("postings_flat"))

        dl = ns.groupBy("doc_id", "section").agg(F.count("*").alias("dl"))
        dl.write.mode("append").parquet(self._p("doclen"))

        # incremental term_df: old ∪ delta, summed (delta docs are new, so
        # df contributions add)
        delta_df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        old_df = spark.read.parquet(self._p("term_df"))
        merged = (
            old_df.unionByName(delta_df)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        tmp = self._p("term_df__new")
        merged.write.mode("overwrite").parquet(tmp)
        self._swap("term_df")

        # vocab: distinct union
        vocab = (
            spark.read.parquet(self._p("vocab"))
            .unionByName(tokens.select("term").distinct())
            .distinct()
        )
        vocab.write.mode("overwrite").parquet(self._p("vocab__new"))
        self._swap("vocab")

        # stats: n_docs += delta count
        import pandas as pd

        n_add = delta.count()
        stats_file = os.path.join(self._p("stats"), "stats.parquet")
        st = pd.read_parquet(stats_file)
        st["n_docs"] = st["n_docs"] + n_add
        st.to_parquet(stats_file)

        # repack from the appended flat postings: WAND's cursors require one
        # sorted, non-overlapping block run per (term, section, bucket), so
        # appended generations must merge. Repack cost ∝ index size (not
        # corpus size) and skips the expensive stage — re-tokenization.
        from information_retrieval_spark.index.pack import pack_index

        pack_index(spark, self.index_dir)
        return n_add

    def _swap(self, table: str) -> None:
        import shutil

        old, new = self._p(table), self._p(table + "__new")
        shutil.rmtree(old)
        os.replace(new, old)

    # --------------------------------------------------------------- remove

    def remove_documents(self, doc_ids: list[int]) -> None:
        """Logical delete via the ``deleted_docs`` delete-vector table."""
        df = self.spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id long"
        )
        df.write.mode("append").parquet(self._p("deleted_docs"))

    def deleted(self) -> DataFrame | None:
        p = self._p("deleted_docs")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def compact(self) -> None:
        """Physically drop deleted docs from postings/doclen/packed and
        rebuild the aggregate tables they feed; clears the delete vector."""
        d = self.deleted()
        if d is None:
            return
        spark = self.spark
        dd = F.broadcast(d.select("doc_id").distinct())
        for table in ("postings_flat", "doclen"):
            t = spark.read.parquet(self._p(table))
            t.join(dd, "doc_id", "left_anti").write.mode("overwrite").parquet(
                self._p(table + "__new")
            )
            self._swap(table)
        postings = spark.read.parquet(self._p("postings_flat"))
        tdf = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        tdf.write.mode("overwrite").parquet(self._p("term_df__new"))
        self._swap("term_df")

        import pandas as pd

        n_del = d.select("doc_id").distinct().count()
        stats_file = os.path.join(self._p("stats"), "stats.parquet")
        st = pd.read_parquet(stats_file)
        st["n_docs"] = st["n_docs"] - n_del
        st.to_parquet(stats_file)

        from information_retrieval_spark.index.pack import pack_index

        pack_index(spark, self.index_dir)

        import shutil

        shutil.rmtree(self._p("deleted_docs"))
