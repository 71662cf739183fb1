"""Dynamic index maintenance: add / remove / compact over snapshot commits.

Reference analogue: `add_document` / `remove_document`
(`ir-phase-1.ipynb:c22-23`, trie insert/delete `trie/phase1.py:38-42`) —
re-expressed for an immutable-files world (SURVEY.md §2.10 Spark mapping)
on top of the Iceberg-style snapshot catalog (index/catalog.py):

* **add_documents(delta)** — LSM-style: tokenize ONLY the new docs, pack
  their postings into a NEW compressed segment, and commit one snapshot
  that appends delta dirs for EVERY table (postings/doclen/doc_meta/
  packed/lineage, and merge-on-read term_df/vocab deltas —
  `catalog.read_term_df`/`read_vocab`); only the one-row stats table is
  rewritten. Cost ∝ delta, NOT index or vocabulary size — the round-1
  design repacked the whole index per add, which at 10^12 files is a
  full index rewrite per delta. WAND merges
  segment cursors at query time (query/wand.py `_SegmentedList`).
* **remove_documents(doc_ids)** — logical delete: commit a delta dir to
  the ``deleted_docs`` table (delete-vector pattern; Iceberg's
  equality-delete equivalent), consulted at query time.
* **compact()** — the ONE physical rewrite: drops deleted docs, merges all
  LSM segments back into a single packed segment, refreshes aggregates,
  clears the delete vector — all visible atomically via one snapshot.

Crash safety comes from the catalog, not from journals: every step of a
mutation only creates new files; visibility is a single atomic CURRENT
swap. A crash mid-operation leaves the previous snapshot fully intact and
queryable; orphaned data dirs are garbage, collected by
``Catalog.expire``. Staged adds carry a token so a crash-retry of the same
commit applies exactly once (``Catalog.committed_token``). Old snapshots
remain queryable (engines take ``version=``) until expired.

Single-writer assumption (as before); the catalog's O_EXCL snapshot file
fences a second concurrent writer into an explicit failure.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from information_retrieval_spark.index.build import (
    LINEAGE_SPECS,
    lineage_frame,
    tokenize_postings,
)
from information_retrieval_spark.index.catalog import (
    Catalog,
    CORE_TABLES,
    read_stats_pdf,
    read_table,
)

def unrecovered_stage_names(index_dir: str) -> list[str]:
    """Frozen stages under ``index_dir`` whose commit never landed.
    Metadata-only (no Spark session) so `IndexBuilder.build` can refuse an
    in-place rebuild over one — the rebuild would reset every table, and
    the stage's later recovery commit would append old-corpus delta dirs
    (and stale 'set' stats) into the rebuilt index."""
    if not Catalog.exists(index_dir):
        return []
    cat = Catalog(index_dir)
    out = []
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith("__stage"):
            continue
        marker = os.path.join(index_dir, d, "_STAGED")
        if not os.path.exists(marker):
            continue
        with open(marker) as f:
            info = json.load(f)
        if not cat.committed_token(
            info["token"], since=info.get("cat_version")
        ):
            out.append(d)
    return out


#: stage subdir → (live table, commit op). Order matters only for humans.
_STAGE_TABLES = [
    ("postings_delta", "postings_flat", "append"),
    ("doclen_delta", "doclen", "append"),
    ("doc_meta_delta", "doc_meta", "append"),
    ("packed_delta", "packed", "append"),
    ("lineage_delta", "lineage", "append"),
    ("term_df", "term_df", "append"),
    ("vocab", "vocab", "append"),
    ("stats", "stats", "set"),
]


class IndexMaintenance:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        auto_compact_segments: int | None = None,
        auto_compact_mode: str = "full",
    ):
        """``auto_compact_segments``: when set, an add whose commit leaves
        MORE than this many LSM segments triggers ``compact()`` — the
        Lucene-style amortization that bounds per-query segment fan-in
        (each segment adds one cursor per (term, section) to WAND) while
        keeping the common-case add delta-priced. None (default) leaves
        compaction fully explicit.

        ``auto_compact_mode``: ``"full"`` (default) merges ALL segments —
        a whole-index rewrite, fine at this scale, wrong economics at
        10^12 files where the base segment dwarfs every delta.
        ``"tiered"`` merges only the DELTA segments (1..N), never
        rewriting the base: auto-compaction cost stays ∝ accumulated
        delta bytes and the base's packed dirs are byte-identical across
        compactions (pytest-pinned). Deletes against merged segments are
        applied physically; deletes against the base stay in the delete
        vector until an explicit full ``compact()``."""
        if auto_compact_mode not in ("full", "tiered"):
            raise ValueError(
                f"auto_compact_mode must be 'full' or 'tiered',"
                f" got {auto_compact_mode!r}"
            )
        self.spark = spark
        self.index_dir = index_dir
        self.auto_compact_segments = auto_compact_segments
        self.auto_compact_mode = auto_compact_mode
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.config = json.load(f)["config"]
        self.cat = Catalog(index_dir)
        # legacy (pre-catalog) index: register its tables as v1 in place
        self.cat.ensure(CORE_TABLES)

    # ------------------------------------------------------------------ add

    def add_documents(self, delta: DataFrame, batch_id: int | None = None) -> int:
        """Append a delta corpus as a new LSM segment; one atomic snapshot.
        New doc_ids must not collide with existing ones (caller contract,
        as in the reference's add_document). ``batch_id`` tags the commit
        for streaming exactly-once (streaming/ingest.py).

        Re-adding a TOMBSTONED doc_id is refused loudly: the delete
        vector filters by doc_id globally, so the new segment's rows
        would be silently invisible — the one contract violation that
        produces a wrong index instead of an obviously broken one. Use
        ``update_documents`` (which purges the old rows first). The
        check costs one broadcast semi-join of the delta against the
        (small) delete vector; collisions with LIVE ids stay on the
        caller (checking those would scan the index per add).

        Crash recovery: a frozen stage (``_STAGED`` marker present) from a
        previous crashed call is committed FIRST — its merged aggregates
        were computed against the pre-crash snapshot, so re-staging would
        double-apply. If the caller is retrying the SAME delta (matching
        fingerprint), that recovered commit already applied it."""
        d = self.deleted()
        if d is not None:
            hit = (
                delta.select("doc_id")
                .join(F.broadcast(d.select("doc_id").distinct()),
                      "doc_id", "semi")
                .limit(5)
                .collect()
            )
            if hit:
                raise ValueError(
                    f"delta re-adds tombstoned doc_ids {[r.doc_id for r in hit]}"
                    " (the delete vector would silently hide the new rows);"
                    " use update_documents(), or compact() first to purge"
                    " the tombstones"
                )
        stage = os.path.join(self.index_dir, "__stage_add")
        if self.is_staged(stage):
            info = self._stage_info(stage)
            same = info.get("fp") == self._delta_fp(delta)
            # label the recovered commit with the caller's batch id ONLY
            # when it is the same delta being retried — committing a
            # DIFFERENT crashed add under this batch id would mark the
            # new batch applied while its data was never staged
            self.commit_add(stage, batch_id=batch_id if same else None)
            if same:
                # auto-compact BEFORE dropping the stage: the frozen stage
                # is what lets a retry after a failed compact recognize the
                # delta as already applied (fp dedup) instead of
                # re-staging it — and the recovered add must honor the
                # segment bound too, not just fresh adds
                self._maybe_auto_compact()
                shutil.rmtree(stage)
                return int(info["n_add"])
            shutil.rmtree(stage)
        elif os.path.isdir(stage):
            shutil.rmtree(stage)  # partial stage: no live effects yet
        n_add = self.stage_add(delta, stage)
        self.commit_add(stage, batch_id=batch_id)
        # amortized merge runs AFTER the add's snapshot landed but BEFORE
        # the stage is dropped: if compact() dies, the frozen stage (whose
        # token is already committed — commit_add no-ops on it) keeps the
        # crash-retry contract intact: the retry dedups on the fingerprint
        # and re-runs only the compact, never re-applying the delta
        self._maybe_auto_compact()
        shutil.rmtree(stage)
        return n_add

    def _maybe_auto_compact(self) -> None:
        if self.auto_compact_segments is None:
            return
        n = len(self.cat.table_dirs("packed"))
        if n <= self.auto_compact_segments:
            return
        if self.auto_compact_mode == "tiered":
            self.compact(segments=list(range(1, n)))
        else:
            self.compact()

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

    @staticmethod
    def is_staged(stage_dir: str) -> bool:
        return os.path.exists(os.path.join(stage_dir, "_STAGED"))

    def stage_add(self, delta: DataFrame, stage_dir: str) -> int:
        """Compute EVERY output of an add — the delta's postings, doclen
        and packed segment, plus the fully merged term_df/vocab/stats —
        into ``stage_dir`` without touching any live table. Finishes by
        writing a ``_STAGED`` marker (with the commit token); a stage
        without the marker is partial and must be discarded."""
        spark = self.spark
        sections = self.config["sections"]
        tokenizer = self.config["tokenizer"]
        n_buckets = self.config.get("n_buckets", 8)
        os.makedirs(stage_dir, exist_ok=True)

        def p(sub: str) -> str:
            return os.path.join(stage_dir, sub)

        # ONE tokenize pass (build.py's shape): tokens stream from the scan
        # into the tf_all aggregate, which is materialized once inside the
        # stage; every other output derives from its read-back — the old
        # shape re-ran the (most expensive) tokenizer for doclen and vocab
        tf_all = tokenize_postings(delta, sections, tokenizer, n_buckets=n_buckets)
        tf_all.write.mode("overwrite").parquet(p("__tf_all"))
        tf_all = spark.read.parquet(p("__tf_all"))

        stop = read_table(spark, self.index_dir, "stopwords").select("term")
        tf_all.join(F.broadcast(stop), "term", "left_anti").write.mode(
            "overwrite"
        ).parquet(p("__nonstop"))
        nonstop = spark.read.parquet(p("__nonstop"))
        # embed the per-doc {section: dl} map on every posting row — same
        # denormalization as the build's postings_flat (build.py
        # s_postings): delta docs are new, so the delta-local map is the
        # doc's complete section-length vector
        dlmap = (
            nonstop.groupBy("doc_id", "section")
            .agg(F.sum("tf").cast("long").alias("dl"))
            .groupBy("doc_id")
            .agg(
                F.map_from_entries(
                    F.array_sort(F.collect_list(F.struct("section", "dl")))
                ).alias("dls")
            )
        )
        nonstop.join(dlmap, "doc_id").write.mode("overwrite").parquet(
            p("postings_delta")
        )
        tf = spark.read.parquet(p("postings_delta"))

        # the independent small jobs overlap (same rationale as the
        # concurrent build stages: each is driver scheduling + one tiny
        # shuffle, and sequential execution is the add's Amdahl floor)
        from concurrent.futures import ThreadPoolExecutor

        from information_retrieval_spark.index.pack import pack_postings

        def s_doclen():
            # dl = Σ tf of non-stop terms (tokens are unique (term, pos)
            # pairs, so Σ distinct-offset tf == non-stop token count —
            # identical to the build's doclen derivation)
            tf.groupBy("doc_id", "section").agg(
                F.sum("tf").cast("long").alias("dl")
            ).write.mode("overwrite").parquet(p("doclen_delta"))

        def s_vocab():
            # pre-stop-removal distinct terms, from tf_all (not tokens:
            # that would re-tokenize)
            tf_all.select("term").distinct().write.mode(
                "overwrite"
            ).parquet(p("vocab"))

        def s_term_df():
            tf.groupBy("term").agg(
                F.countDistinct("doc_id").alias("df")
            ).write.mode("overwrite").parquet(p("term_df"))

        def s_doc_meta():
            cat_col = self.config.get("category_col")
            if cat_col is None:
                return
            # long cast: must match the build-time doc_meta type (WAND's
            # xxhash64 bucketing is type-sensitive); category-partitioned
            # like the build (catalog.read_doc_meta)
            delta.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(cat_col).alias("category"),
            ).write.mode("overwrite").partitionBy("category").parquet(
                p("doc_meta_delta")
            )

        def s_stats():
            n = delta.count()
            st = read_stats_pdf(self.index_dir).copy()
            st["n_docs"] = st["n_docs"] + n
            os.makedirs(p("stats"), exist_ok=True)
            st.to_parquet(os.path.join(p("stats"), "stats.parquet"))
            return n

        def s_pack():
            # the delta's OWN packed segment — pack cost ∝ delta size; the
            # live packed segments are untouched (LSM append, merged at
            # compact). dl comes off the embedded dls map (pack.py), so
            # pack is independent of s_doclen and overlaps it fully.
            pack_postings(tf, None, p("packed_delta"))

        with ThreadPoolExecutor(max_workers=6) as ex:
            futs = [
                ex.submit(fn)
                for fn in (s_pack, s_doclen, s_vocab, s_term_df, s_doc_meta)
            ]
            f_stats = ex.submit(s_stats)
            for f in futs:
                f.result()
            n_add = f_stats.result()
        dl = spark.read.parquet(p("doclen_delta"))

        # per-partition lineage of the delta's tables (append-only log)
        lineage_frame(
            {
                "postings_flat": tf,
                "doclen": dl,
                "packed": spark.read.parquet(p("packed_delta")),
            }
        ).write.mode("overwrite").parquet(p("lineage_delta"))

        with open(os.path.join(stage_dir, "_STAGED"), "w") as f:
            json.dump(
                {
                    "n_add": int(n_add),
                    "fp": self._delta_fp(delta),
                    "token": uuid.uuid4().hex[:12],
                    # which tables this stage produced: commit refuses to
                    # publish if one went missing (e.g. swept by GC while
                    # the stage was frozen) instead of silently committing
                    # a partial snapshot
                    "tables": [
                        sub
                        for sub, _, _ in _STAGE_TABLES
                        if os.path.isdir(os.path.join(stage_dir, sub))
                    ],
                    # catalog version the stage was built against: bounds
                    # the idempotence scan to commits after it
                    "cat_version": self.cat.current_version(),
                },
                f,
            )
        return n_add

    def commit_add(self, stage_dir: str, batch_id: int | None = None) -> None:
        """Publish a completed stage: move its subdirs to immutable data
        dirs (names derived from the stage token, so a crash-retry
        re-derives the same destinations and the moves no-op), then ONE
        snapshot commit makes everything visible atomically. A retry after
        the snapshot landed is detected by the token and skipped.

        A stage's merged aggregates (the one-row stats 'set' above all)
        were computed against the snapshot it was staged on — if a compact
        or in-place rebuild landed in between, publishing them would
        silently overwrite that operation's n_docs/table state (compact's
        delete-vector decrement is already cleared, so nothing ever
        repairs the skew). `compact()`/`IndexBuilder.build()` refuse to
        run over a frozen uncommitted stage, and this guard is the
        belt-and-braces for anything that bypassed them."""
        assert self.is_staged(stage_dir), "refusing to commit a partial stage"
        info = self._stage_info(stage_dir)
        token = info["token"]
        if self.cat.committed_token(token, since=info.get("cat_version")):
            return  # crash happened after the snapshot: already applied
        since = info.get("cat_version")
        if since is not None:
            intervening = {
                self.cat.load(v)["operation"]
                for v in self.cat.versions()
                if v > since
            } & {"compact", "rebuild"}
            if intervening:
                raise RuntimeError(
                    f"stage {stage_dir!r} was staged against catalog"
                    f" version {since} but {sorted(intervening)} snapshots"
                    " landed since — its staged stats/segments are stale;"
                    " discard the stage and re-run the add"
                )
        produced = set(info.get("tables", []))
        changes: dict = {}
        for sub, table, op in _STAGE_TABLES:
            src = os.path.join(stage_dir, sub)
            rel = self.cat.new_data_dir(table, token)
            dst = self.cat.abspath(rel)
            if os.path.isdir(src):
                os.replace(src, dst)
            elif not os.path.isdir(dst):
                if sub in produced:
                    raise RuntimeError(
                        f"staged table {sub!r} vanished before commit"
                        " (GC'd while frozen?) — refusing to publish a"
                        " partial snapshot"
                    )
                continue  # table not produced by this stage (e.g. doc_meta)
            changes[table] = (op, [rel])
        summary = {"stage_token": token, "n_add": info["n_add"]}
        if batch_id is not None:
            summary["stream_batch_id"] = int(batch_id)
        self.cat.commit(
            {t: (op, dirs) for t, (op, dirs) in changes.items()},
            "add",
            summary,
        )

    # --------------------------------------------------------------- remove

    def remove_documents(self, doc_ids: list[int]) -> None:
        """Logical delete: commit a delta dir to the ``deleted_docs``
        delete-vector table (one snapshot; crash before the commit leaves
        only an orphaned dir)."""
        rel = self.cat.new_data_dir("deleted_docs")
        self.spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id long"
        ).write.mode("overwrite").parquet(self.cat.abspath(rel))
        self.cat.commit(
            {"deleted_docs": ("append", [rel])},
            "remove",
            {"n_remove": len(doc_ids)},
        )

    def deleted(self) -> DataFrame | None:
        return read_table(self.spark, self.index_dir, "deleted_docs")

    # -------------------------------------------------------------- update

    def update_documents(self, delta: DataFrame) -> int:
        """Replace existing docs with new content under the SAME doc_ids
        (the operation a re-crawl needs; plain remove+add is refused by
        ``add_documents`` because the global delete vector would hide the
        re-added rows). Three snapshot commits, each atomic:

        1. tombstone the delta ids that are PRESENT in the index — the
           old content disappears from queries immediately;
        2. tiered-compact exactly the segments holding their old rows,
           physically purging them (cost ∝ those segments' bytes: at
           10^12 files, updating recently-added docs rewrites only
           recent delta segments; updating an ancient base doc costs
           that base segment's rewrite, the floor for any design whose
           tombstones are global doc_id predicates);
        3. ``add_documents(delta)`` as a new segment.

        An engine pinned to any version sees a consistent index. A crash
        between steps converges on retry: the tombstones already hide
        the old rows, and the retry either re-finds them (re-purges) or
        finds nothing and degrades to a plain add. Ids not present in
        the index skip the tombstone cycle. Returns docs added."""
        spark = self.spark
        ids = F.broadcast(delta.select("doc_id").distinct())
        dl_dirs = self.cat.table_dirs("doclen")
        tagged = None
        for i, dr in enumerate(dl_dirs):
            part = (
                spark.read.parquet(dr)
                .select("doc_id")
                .join(ids, "doc_id", "semi")
                .select("doc_id", F.lit(i).alias("seg"))
            )
            tagged = part if tagged is None else tagged.unionByName(part)
        # only the SEGMENT ids reach the driver (bounded by segment
        # count); the present-doc set stays distributed — an update of
        # 10^8 docs must not collect its id list
        n_present = 0
        if tagged is not None:
            tagged = tagged.cache()
            n_present = tagged.select("doc_id").distinct().count()
        if n_present:
            segs = sorted(
                r.seg for r in tagged.select("seg").distinct().collect()
            )
            rel = self.cat.new_data_dir("deleted_docs")
            tagged.select("doc_id").distinct().write.mode(
                "overwrite"
            ).parquet(self.cat.abspath(rel))
            self.cat.commit(
                {"deleted_docs": ("append", [rel])},
                "remove",
                {"n_remove": n_present, "for_update": True},
            )
            tagged.unpersist()
            self.compact(segments=segs)
        elif tagged is not None:
            tagged.unpersist()
        return self.add_documents(delta)

    # -------------------------------------------------------------- compact

    def compact(self, segments: list[int] | None = None) -> None:
        """Physically drop deleted docs AND merge LSM segments.

        ``segments=None`` (default): merge ALL segments into
        one: rewrite postings/doclen/doc_meta/packed, re-derive
        term_df/stats/lineage, clear the delete vector — all new dirs,
        published by a single snapshot commit. A crash anywhere leaves the
        previous snapshot intact; the re-run recomputes from it and
        converges (orphaned dirs are GC'd by ``expire``).

        ``segments=[i, j, ...]``: TIERED (partial) compaction — merge only
        the named segments (indices into the packed dir list, 0 = base)
        into one new segment, leaving every other segment's files
        untouched. Cost ∝ the merged segments' bytes, never the index:
        the 10^12-file economics, where a full rewrite per compaction is
        unpayable. Deletes hitting merged segments are applied physically
        and removed from the delete vector; deletes against unmerged
        segments stay logical. See ``_compact_segments``.

        Deleted docs that never produced a doclen row (all-stop-word
        content) are a documented blind spot of the live-doc count.

        Refuses to run while a frozen UNCOMMITTED stage exists: the
        stage's merged stats were computed against the pre-crash snapshot,
        and its later recovery commit would publish them over this
        compact's state (n_docs decrement silently lost — the delete
        vector is cleared here, so no future compact repairs it). Call
        `recover_stages()` (or retry the crashed add) first. A frozen
        stage whose token is already committed is fine — its stats are
        live and this compact supersedes them (that is exactly the
        auto-compact window inside `add_documents`)."""
        spark = self.spark
        pending = self._unrecovered_stages()
        if pending:
            raise RuntimeError(
                f"frozen uncommitted stage(s) {pending} exist — compacting"
                " now would be silently undone by their recovery commit;"
                " run recover_stages() (or retry the crashed add) first"
            )
        if segments is not None:
            return self._compact_segments(segments)
        d = self.deleted()
        n_segments = len(self.cat.table_dirs("packed"))
        if d is None and n_segments <= 1:
            return  # nothing to drop, nothing to merge
        token = uuid.uuid4().hex[:12]
        dd = F.broadcast(
            (
                d.select("doc_id").distinct()
                if d is not None
                else spark.createDataFrame([], "doc_id long")
            )
        )

        n_del = (
            read_table(spark, self.index_dir, "doclen")
            .select("doc_id")
            .distinct()
            .join(dd, "doc_id", "semi")
            .count()
        )
        st = read_stats_pdf(self.index_dir).copy()
        st["n_docs"] = int(st["n_docs"].iloc[0]) - n_del

        changes: dict = {}

        def fresh(table: str) -> str:
            rel = self.cat.new_data_dir(table, token)
            changes[table] = ("set", [rel])
            return self.cat.abspath(rel)

        for table in ("postings_flat", "doclen"):
            t = read_table(spark, self.index_dir, table)
            t.join(dd, "doc_id", "left_anti").write.mode("overwrite").parquet(
                fresh(table)
            )
        if self.cat.table_dirs("doc_meta"):
            from information_retrieval_spark.index.catalog import read_doc_meta

            read_doc_meta(spark, self.index_dir).join(
                dd, "doc_id", "left_anti"
            ).sortWithinPartitions("doc_id").write.mode(
                "overwrite"
            ).partitionBy("category").parquet(fresh("doc_meta"))
        new_postings = spark.read.parquet(
            self.cat.abspath(changes["postings_flat"][1][0])
        )
        new_doclen = spark.read.parquet(
            self.cat.abspath(changes["doclen"][1][0])
        )

        new_postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        ).write.mode("overwrite").parquet(fresh("term_df"))

        # vocab content is unchanged by deletes (spell dictionary keeps all
        # terms ever indexed, as the reference's bigram index does), but
        # accumulated delta dirs collapse back to one pre-distincted dir
        from information_retrieval_spark.index.catalog import read_vocab

        if len(self.cat.table_dirs("vocab")) > 1:
            read_vocab(spark, self.index_dir).write.mode(
                "overwrite"
            ).parquet(fresh("vocab"))

        stats_dir = fresh("stats")
        os.makedirs(stats_dir, exist_ok=True)
        st.to_parquet(os.path.join(stats_dir, "stats.parquet"))

        from information_retrieval_spark.index.pack import pack_postings

        packed_dir = fresh("packed")
        pack_postings(new_postings, new_doclen, packed_dir)

        lineage_frame(
            {
                "postings_flat": new_postings,
                "doclen": new_doclen,
                "packed": spark.read.parquet(packed_dir),
            }
        ).write.mode("overwrite").parquet(fresh("lineage"))

        changes["deleted_docs"] = ("drop", None)
        self.cat.commit(
            changes,
            "compact",
            {"stage_token": token, "n_removed": n_del,
             "segments_merged": n_segments},
        )

    # ---------------------------------------------------- tiered compaction

    # tables with one data dir PER SEGMENT, in catalog list order (the
    # base build commits one dir each; every add appends exactly one —
    # _STAGE_TABLES): partial compaction splices these lists in lockstep
    _SEGMENTED_TABLES = (
        "postings_flat", "doclen", "packed", "lineage", "term_df", "vocab",
    )

    def segment_sizes(self) -> list[int]:
        """On-disk bytes of each packed segment, in segment order —
        the input to size-tiered merge planning."""
        sizes = []
        for d in self.cat.table_dirs("packed"):
            total = 0
            for root, _dirs, files in os.walk(d):
                for f in files:
                    total += os.path.getsize(os.path.join(root, f))
            sizes.append(total)
        return sizes

    def plan_compaction(self, max_segments: int) -> list[int] | None:
        """Size-tiered merge plan: the CHEAPEST segment subset whose merge
        brings the count down to ``max_segments``. Merging k segments
        reduces the count by k-1 and costs ∝ their bytes, so the optimal
        set is simply the (n - max_segments + 1) SMALLEST segments —
        usually the recent deltas, but a shrunken base qualifies too
        (RocksDB-style size tiering, not age tiering). Returns None when
        the count is already within bound; feed the result to
        ``compact(segments=...)``."""
        if max_segments < 1:
            raise ValueError("max_segments must be >= 1")
        sizes = self.segment_sizes()
        k = len(sizes) - max_segments + 1
        if k < 2:
            return None
        by_size = sorted(range(len(sizes)), key=lambda i: (sizes[i], i))
        return sorted(by_size[:k])

    def _compact_segments(self, segments: list[int]) -> None:
        """Merge ONLY ``segments`` (packed-dir-list indices) into one new
        segment; every other segment's files are untouched — the catalog
        commit just splices the new dir in at the merged run's first
        position. Reads, shuffles, and writes are all bounded by the
        merged segments' bytes, so a size-tiered maintenance policy can
        keep query fan-in low (BENCH fan-in table) without ever paying a
        base-segment rewrite. RocksDB/Lucene tiered-merge economics on
        the snapshot catalog.

        Deletes: tombstones hitting merged segments' docs are applied
        physically and REMOVED from the delete vector (so a later full
        compact's n_docs decrement never double-counts them); tombstones
        against unmerged segments stay in the vector and keep filtering
        at query time. Same all-stop-word blind spot as full compact.
        Crash safety: identical to full compact — fresh dirs only, one
        atomic snapshot commit at the end."""
        spark = self.spark
        segs = sorted(set(int(s) for s in segments))
        if not segs:
            raise ValueError("segments must name at least one segment")
        dirs = {t: self.cat.table_dirs(t) for t in self._SEGMENTED_TABLES}
        has_meta = bool(self.cat.table_dirs("doc_meta"))
        if has_meta:
            dirs["doc_meta"] = self.cat.table_dirs("doc_meta")
        n_seg = len(dirs["packed"])
        bad_len = {t: len(d) for t, d in dirs.items() if len(d) != n_seg}
        if bad_len:
            raise RuntimeError(
                "partial compaction needs per-segment dir alignment, but"
                f" {bad_len} differ from packed's {n_seg} — this index's"
                " history broke the one-dir-per-segment invariant; run a"
                " full compact() instead"
            )
        if segs[0] < 0 or segs[-1] >= n_seg:
            raise ValueError(
                f"segment indices {segs} out of range for {n_seg} segments"
            )
        d = self.deleted()
        if len(segs) == 1 and d is None:
            return  # nothing to merge, nothing to drop
        token = uuid.uuid4().hex[:12]

        def union_dirs(table: str) -> DataFrame:
            parts = [spark.read.parquet(dirs[table][i]) for i in segs]
            out = parts[0]
            for pt in parts[1:]:
                out = out.unionByName(pt)
            return out

        changes: dict = {}
        new_rel: dict[str, str] = {}

        def fresh(table: str) -> str:
            rel = self.cat.new_data_dir(table, token)
            new_rel[table] = rel
            return self.cat.abspath(rel)

        dd_all = (
            d.select("doc_id").distinct()
            if d is not None
            else spark.createDataFrame([], "doc_id long")
        )
        merged_docs = union_dirs("doclen").select("doc_id").distinct()
        # tombstones split by whether their doc lives in a merged segment:
        # those are applied physically below; the rest stay logical
        n_del_sub = dd_all.join(merged_docs, "doc_id", "semi").count()
        dd = F.broadcast(dd_all)

        for table in ("postings_flat", "doclen"):
            union_dirs(table).join(dd, "doc_id", "left_anti").write.mode(
                "overwrite"
            ).parquet(fresh(table))
        new_postings = spark.read.parquet(
            self.cat.abspath(new_rel["postings_flat"])
        )
        new_doclen = spark.read.parquet(self.cat.abspath(new_rel["doclen"]))

        if has_meta:
            union_dirs("doc_meta").join(
                dd, "doc_id", "left_anti"
            ).sortWithinPartitions("doc_id").write.mode(
                "overwrite"
            ).partitionBy("category").parquet(fresh("doc_meta"))

        # merge-on-read aggregates: the merged segments' delta dirs are
        # replaced by ONE re-derived dir, so the cross-dir sum (term_df)
        # and distinct-union (vocab) stay exact
        new_postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        ).write.mode("overwrite").parquet(fresh("term_df"))
        union_dirs("vocab").distinct().write.mode("overwrite").parquet(
            fresh("vocab")
        )

        from information_retrieval_spark.index.pack import pack_postings

        packed_dir = fresh("packed")
        pack_postings(new_postings, new_doclen, packed_dir)

        lineage_frame(
            {
                "postings_flat": new_postings,
                "doclen": new_doclen,
                "packed": spark.read.parquet(packed_dir),
            }
        ).write.mode("overwrite").parquet(fresh("lineage"))

        st = read_stats_pdf(self.index_dir).copy()
        st["n_docs"] = int(st["n_docs"].iloc[0]) - n_del_sub
        stats_dir = fresh("stats")
        os.makedirs(stats_dir, exist_ok=True)
        st.to_parquet(os.path.join(stats_dir, "stats.parquet"))
        changes["stats"] = ("set", [new_rel["stats"]])

        # splice: keep unmerged dirs in order, new dir at the merged run's
        # first position (RELATIVE paths — the snapshot stores relatives)
        keep = set(segs)
        for table in list(self._SEGMENTED_TABLES) + (
            ["doc_meta"] if has_meta else []
        ):
            snap_dirs = list(
                self.cat.load(self.cat.current_version())["tables"][table]
            )
            spliced = []
            for i, rel in enumerate(snap_dirs):
                if i == segs[0]:
                    spliced.append(new_rel[table])
                if i not in keep:
                    spliced.append(rel)
            changes[table] = ("set", spliced)

        if d is not None:
            remaining = dd_all.join(merged_docs, "doc_id", "left_anti")
            if remaining.limit(1).count():
                remaining.write.mode("overwrite").parquet(
                    fresh("deleted_docs")
                )
                changes["deleted_docs"] = ("set", [new_rel["deleted_docs"]])
            else:
                changes["deleted_docs"] = ("drop", None)

        self.cat.commit(
            changes,
            "compact",
            {
                "stage_token": token,
                "n_removed": n_del_sub,
                "segments_merged": segs,
                "partial": True,
                "n_segments_before": n_seg,
                "n_segments_after": n_seg - len(segs) + 1,
            },
        )

    # ------------------------------------------------------------------- GC

    def expire_snapshots(self, keep_last: int = 2) -> list[str]:
        """Drop old snapshots and delete the data dirs no kept snapshot
        references; then sweep dirs referenced by NO snapshot (debris of
        crashed operations) — UNLESS a frozen stage exists, whose
        already-moved-but-uncommitted dirs look like orphans and must
        survive for its recovery commit. Time travel reaches only kept
        snapshots afterwards. Call between mutations (single-writer
        schedule)."""
        dead = self.cat.expire(keep_last)
        if not self._frozen_stages():
            dead = dead + self.cat.sweep_orphans()
        return dead

    def _frozen_stages(self) -> list[str]:
        return [
            d
            for d in os.listdir(self.index_dir)
            if d.startswith("__stage")
            and self.is_staged(os.path.join(self.index_dir, d))
        ]

    def _unrecovered_stages(self) -> list[str]:
        """Frozen stages whose commit has NOT landed — the crash window
        between staging and the snapshot swap. (A frozen stage whose token
        already appears in the chain is merely awaiting cleanup.)"""
        return unrecovered_stage_names(self.index_dir)

    def recover_stages(self) -> list[str]:
        """Finish the commit of every frozen stage, then drop it. Stream
        batch stages (``__stage_batch_<id>``) re-derive their batch id
        from the directory name so the recovered commit still lands in
        the exactly-once ledger. Returns the recovered stage names."""
        recovered = []
        for d in self._frozen_stages():
            stage = os.path.join(self.index_dir, d)
            batch_id = None
            if d.startswith("__stage_batch_"):
                suffix = d[len("__stage_batch_"):]
                if suffix.isdigit():
                    batch_id = int(suffix)
            self.commit_add(stage, batch_id=batch_id)
            shutil.rmtree(stage)
            recovered.append(d)
        return recovered
