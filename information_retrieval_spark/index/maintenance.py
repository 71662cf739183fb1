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
        contract, as in the reference's add_document).

        Implemented as stage → commit (``stage_add`` + ``commit_add``) so a
        crash mid-apply never leaves the live tables merged twice: all
        derived outputs land in a staging directory first, and the commit
        step is redoable (streaming replays resume it, see
        ``streaming/ingest.py``)."""
        import shutil

        stage = self._p("__stage_add")
        if self.is_staged(stage):
            # a previous add crashed during commit: FINISH that frozen
            # stage first (its merged aggregates were computed against the
            # pre-crash tables — re-staging would double-apply). If the
            # caller is retrying the SAME delta (matching fingerprint),
            # the finished commit already applied it exactly once — done.
            info = self._stage_info(stage)
            self.commit_add(stage)
            shutil.rmtree(stage)
            if info.get("fp") == self._delta_fp(delta):
                return int(info["n_add"])
        elif os.path.isdir(stage):
            shutil.rmtree(stage)  # partial stage: no live effects yet
        n_add = self.stage_add(delta, stage)
        self.commit_add(stage)
        shutil.rmtree(stage)
        return n_add

    def _delta_fp(self, delta: DataFrame) -> str:
        """Order-insensitive content fingerprint of a delta frame."""
        cols = sorted(delta.columns)
        row = delta.select(
            F.expr(
                "concat(count(*), ':', coalesce(bit_xor(xxhash64("
                + ", ".join(cols)
                + ")), 0))"
            ).alias("fp")
        ).collect()[0]
        return row.fp

    @staticmethod
    def _stage_info(stage_dir: str) -> dict:
        with open(os.path.join(stage_dir, "_STAGED")) as f:
            return json.load(f)

    def stage_add(self, delta: DataFrame, stage_dir: str) -> int:
        """Compute EVERY output of an add — delta postings/doclen plus the
        fully merged term_df/vocab/stats — into ``stage_dir`` without
        touching a live table. Finishes by writing a ``_STAGED`` marker;
        a stage without the marker is partial and must be discarded."""
        spark = self.spark
        sections = self.config["sections"]
        tokenizer = self.config["tokenizer"]
        n_buckets = self.config.get("n_buckets", 8)
        os.makedirs(stage_dir, exist_ok=True)

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
        tf.write.mode("overwrite").parquet(
            os.path.join(stage_dir, "postings_delta")
        )
        tf = spark.read.parquet(os.path.join(stage_dir, "postings_delta"))

        dl = ns.groupBy("doc_id", "section").agg(F.count("*").alias("dl"))
        dl.write.mode("overwrite").parquet(os.path.join(stage_dir, "doclen_delta"))

        cat_col = self.config.get("category_col")
        if cat_col is not None:
            # long cast: must match the build-time doc_meta type (WAND's
            # xxhash64 bucketing is type-sensitive)
            delta.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(cat_col).alias("category"),
            ).write.mode("overwrite").parquet(
                os.path.join(stage_dir, "doc_meta_delta")
            )

        # incremental term_df: old ∪ delta, summed (delta docs are new, so
        # df contributions add)
        delta_df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        old_df = spark.read.parquet(self._p("term_df"))
        merged = (
            old_df.unionByName(delta_df)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        merged.write.mode("overwrite").parquet(os.path.join(stage_dir, "term_df"))

        # vocab: distinct union
        vocab = (
            spark.read.parquet(self._p("vocab"))
            .unionByName(tokens.select("term").distinct())
            .distinct()
        )
        vocab.write.mode("overwrite").parquet(os.path.join(stage_dir, "vocab"))

        # stats: n_docs += delta count
        import pandas as pd

        n_add = delta.count()
        st = pd.read_parquet(os.path.join(self._p("stats"), "stats.parquet"))
        st["n_docs"] = st["n_docs"] + n_add
        st.to_parquet(os.path.join(stage_dir, "stats.parquet"))

        with open(os.path.join(stage_dir, "_STAGED"), "w") as f:
            json.dump({"n_add": int(n_add), "fp": self._delta_fp(delta)}, f)
        return n_add

    @staticmethod
    def is_staged(stage_dir: str) -> bool:
        return os.path.exists(os.path.join(stage_dir, "_STAGED"))

    def commit_add(self, stage_dir: str) -> None:
        """Fold a completed stage into the live index. Every step is
        redoable: delta files move skip-if-already-moved (Spark part names
        are unique), table swaps skip when the staged source is gone
        (already swapped), and the repack is deterministic from the live
        postings — so an interrupted commit re-run from the SAME frozen
        stage converges to the same index. Single-writer assumption: a
        reader racing the swap can observe a table mid-replace; a
        production deployment puts a transactional table format under
        these swaps."""
        import shutil

        assert self.is_staged(stage_dir), "refusing to commit a partial stage"
        deltas = [
            ("postings_flat", "postings_delta"),
            ("doclen", "doclen_delta"),
        ]
        if os.path.isdir(os.path.join(stage_dir, "doc_meta_delta")):
            deltas.append(("doc_meta", "doc_meta_delta"))
        for tbl, sub in deltas:
            sdir = os.path.join(stage_dir, sub)
            for fn in sorted(os.listdir(sdir)):
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(sdir, fn)
                dst = os.path.join(self._p(tbl), fn)
                if os.path.exists(src):
                    os.replace(src, dst)
        for tbl in ("term_df", "vocab"):
            src = os.path.join(stage_dir, tbl)
            if os.path.isdir(src):
                live = self._p(tbl)
                if os.path.isdir(live):
                    shutil.rmtree(live)
                os.replace(src, live)
        sstats = os.path.join(stage_dir, "stats.parquet")
        if os.path.exists(sstats):
            os.replace(sstats, os.path.join(self._p("stats"), "stats.parquet"))

        # repack from the appended flat postings: WAND's cursors require one
        # sorted, non-overlapping block run per (term, section, bucket), so
        # appended generations must merge. Repack cost ∝ index size (not
        # corpus size) and skips the expensive stage — re-tokenization.
        from information_retrieval_spark.index.pack import pack_index

        pack_index(self.spark, self.index_dir)

    def _swap(self, table: str) -> None:
        """rmtree-then-rename swap. Not atomic: a crash between the two
        steps leaves the table absent with ``<table>__new`` complete —
        re-running the operation (compact is idempotent over the same
        delete vector, which is only cleared at the very end) recovers;
        ``ignore_errors`` makes that re-run possible."""
        import shutil

        old, new = self._p(table), self._p(table + "__new")
        shutil.rmtree(old, ignore_errors=True)
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
        # finish any swap a previous compact crashed in the middle of
        # (table rmtree'd, complete __new still pending its rename)
        for table in ("postings_flat", "doclen", "doc_meta", "term_df"):
            live, new = self._p(table), self._p(table + "__new")
            if not os.path.exists(live) and os.path.isdir(new):
                os.replace(new, live)
        dd = F.broadcast(d.select("doc_id").distinct())
        # the n_docs update is journaled as an ABSOLUTE target before any
        # table is mutated: a crash-recovery re-run finds the journal and
        # rewrites the same value, so the stats update is exactly-once no
        # matter where the previous run died (a relative decrement cannot
        # be made idempotent across the swap windows). Deleted docs that
        # never produced a doclen row (all-stop-word content) are a
        # documented blind spot of the live-doc measurement.
        import pandas as pd

        journal = self._p("__compact_journal.json")
        stats_file = os.path.join(self._p("stats"), "stats.parquet")
        if os.path.exists(journal):
            with open(journal) as f:
                n_docs_target = int(json.load(f)["n_docs_target"])
        else:
            n_del = (
                spark.read.parquet(self._p("doclen"))
                .select("doc_id")
                .distinct()
                .join(dd, "doc_id", "semi")
                .count()
            )
            st = pd.read_parquet(stats_file)
            n_docs_target = int(st["n_docs"].iloc[0]) - n_del
            tmp = journal + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"n_docs_target": n_docs_target}, f)
            os.replace(tmp, journal)
        tables = ["postings_flat", "doclen"]
        if os.path.isdir(self._p("doc_meta")):
            tables.append("doc_meta")
        for table in tables:
            t = spark.read.parquet(self._p(table))
            t.join(dd, "doc_id", "left_anti").write.mode("overwrite").parquet(
                self._p(table + "__new")
            )
            self._swap(table)
        postings = spark.read.parquet(self._p("postings_flat"))
        tdf = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        tdf.write.mode("overwrite").parquet(self._p("term_df__new"))
        self._swap("term_df")

        st = pd.read_parquet(stats_file)
        st["n_docs"] = n_docs_target
        st.to_parquet(stats_file)

        from information_retrieval_spark.index.pack import pack_index

        pack_index(spark, self.index_dir)

        import shutil

        shutil.rmtree(self._p("deleted_docs"))
        os.remove(journal)
