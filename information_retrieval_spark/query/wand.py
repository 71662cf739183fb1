"""Block-max WAND top-k over the packed compressed index (north_star
query path).

Physical shape (SURVEY.md §3.1 redesign): the tiny query-term list prunes
the packed shard scan (parquet row-group min/max on the term-sorted layout),
a light stats pre-pass decodes doc_ids only to materialize the per-query
candidate statistics the reference's BM25 quirks require (Q1 N = |candidate
set|, Q2 candidate-set avgdl), and the scoring pass runs classic WAND with
block-granular skipping inside ``applyInPandas`` per doc-hash bucket —
per-shard top-k, then one global window for the final k (SURVEY.md §7 M5).

Correctness stance: WAND is an EXACT top-k algorithm — results are
rank-identical to the exhaustive scorer (`query/engine.py`), which tests
assert; skipping only prunes work. Because a doc's bucket is a pure
function of doc_id, every posting of a doc lands in one bucket: bucket-local
scoring is complete, and per-bucket top-k ∪ global re-rank is exact.

Skipping levels:
* pivot selection uses per-(term,section) global upper bounds
  (max over blocks of ub(max_tf, min_dl)) — classic WAND;
* advancing a cursor to the pivot skips whole blocks on (last_doc < pivot)
  WITHOUT decoding them — the block-max/delta-gap layout's payoff;
* per-query idf and avgdl enter the bounds at query time (the blocks store
  tf-side components only — SURVEY.md §7 hard-part b).
"""

from __future__ import annotations

import heapq
import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from information_retrieval_spark.index.codec import decode_doc_gaps, varint_decode
from information_retrieval_spark.query.engine import K1, B, QuerySpec
from information_retrieval_spark.tokenize import code_terms, simple_tokens

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("section", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("seg_seq", T.LongType(), False),
    ]
)

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _tf_norm(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


class _List:
    """Cursor over one (term, section) posting run within a bucket.

    ``dead`` (optional uint64 array) carries the doc_ids that seq-scoped
    tombstones hide in THIS segment while the doc stays live in a newer
    one (an updated doc awaiting compaction): those postings are filtered
    out at decode time, invisibly to the WAND machinery above. Block
    metadata (first/last doc, max bounds) stays the packed original —
    conservative, so exactness is preserved — which means ``cur_doc`` on
    an undecoded block is OPTIMISTIC (it may name a filtered doc);
    callers that are about to trust it call ``materialize()`` first.
    Fully-hidden docs (dead in every segment of the bucket) never reach
    this path — they ride `_wand_query`'s zero-decode ``deleted`` set."""

    __slots__ = ("blocks", "bi", "off", "docs", "tfs", "dls", "weight",
                 "avgdl", "ub", "dead")

    def __init__(self, blocks: list, weight: float, avgdl: float,
                 dead: np.ndarray | None = None):
        # blocks: list of (first_doc, last_doc, docs_bin, tfs_bin, dls_bin,
        #                  max_tf, min_dl) sorted by block_id
        self.blocks = blocks
        self.bi = 0
        self.off = 0
        self.docs = None  # decoded lazily
        self.tfs = None
        self.dls = None
        self.weight = weight  # mult * idf * section_weight
        self.avgdl = avgdl
        self.dead = dead if dead is not None and len(dead) else None
        self.ub = weight * max(
            _tf_norm(b[5], b[6], avgdl) for b in blocks
        )

    def exhausted(self) -> bool:
        return self.bi >= len(self.blocks)

    def cur_doc(self) -> int:
        if self.docs is None:
            return self.blocks[self.bi][0]  # first_doc — no decode;
            # optimistic under dead-filtering (see class docstring)
        return int(self.docs[self.off])

    def materialize(self) -> None:
        """Decode the current position so ``cur_doc`` is a real, live
        posting (or the cursor is exhausted). No-op when already decoded;
        in the common no-dead case this is the same decode that
        contribution()/advance() would do anyway."""
        if self.docs is None and not self.exhausted():
            self._decode()

    def _decode(self) -> None:
        """Decode the current block, dropping dead postings; blocks that
        filter to empty are skipped entirely (cursor may exhaust)."""
        while self.bi < len(self.blocks):
            b = self.blocks[self.bi]
            docs = decode_doc_gaps(b[2])
            tfs = varint_decode(b[3])
            dls = varint_decode(b[4])
            if self.dead is not None:
                mask = ~np.isin(docs, self.dead)
                if not mask.all():
                    docs, tfs, dls = docs[mask], tfs[mask], dls[mask]
            if len(docs):
                self.docs, self.tfs, self.dls = docs, tfs, dls
                return
            self.bi += 1
            self.off = 0
        self.docs = self.tfs = self.dls = None

    def contribution(self) -> float:
        if self.docs is None:
            self._decode()
        tf = float(self.tfs[self.off])
        dl = float(self.dls[self.off])
        return self.weight * _tf_norm(tf, dl, self.avgdl)

    def cur_tf_dl(self) -> tuple[float, float]:
        if self.docs is None:
            self._decode()
        return float(self.tfs[self.off]), float(self.dls[self.off])

    def advance(self) -> None:
        """Next posting."""
        if self.docs is None:
            self._decode()
            if self.docs is None:
                return  # dead-filtering exhausted the remaining blocks
        self.off += 1
        if self.off >= len(self.docs):
            self.bi += 1
            self.off = 0
            self.docs = self.tfs = self.dls = None

    def seek(self, target: int) -> None:
        """Advance to first doc ≥ target, skipping blocks undecoded."""
        while not self.exhausted() and self.blocks[self.bi][1] < target:
            self.bi += 1
            self.off = 0
            self.docs = self.tfs = self.dls = None
        if self.exhausted():
            return
        if self.docs is None:
            if self.blocks[self.bi][0] >= target:
                return  # first_doc already ≥ target; stay undecoded
            self._decode()
            if self.docs is None:
                return  # dead-filtering exhausted the remaining blocks
        j = int(np.searchsorted(self.docs[self.off :], target)) + self.off
        if j >= len(self.docs):
            self.bi += 1
            self.off = 0
            self.docs = self.tfs = self.dls = None
            self.seek(target)
        else:
            self.off = j


class _SegmentedList:
    """Cursor over the CONCATENATION of one (term, section)'s posting runs
    across LSM segments (index/maintenance.py: each incremental add commits
    a new packed segment instead of repacking). Segment doc-id sets are
    DISJOINT at the LIVE level: fresh adds use fresh doc_ids, and an
    updated doc's old-segment postings are dead (seq-scoped tombstones)
    and filtered out inside each run's `_List` — so at any point exactly
    one run holds the minimum doc — contribution/advance delegate to it,
    and the upper bound is the max of the per-segment bounds (tight,
    unlike a sum: no doc can combine tf across segments)."""

    __slots__ = ("runs", "weight", "avgdl", "ub", "blocks")

    def __init__(self, runs: list[_List], weight: float, avgdl: float):
        self.runs = runs
        self.weight = weight
        self.avgdl = avgdl
        # flattened view for _MergedList's Σ max_tf / min min_dl bound
        self.blocks = [b for r in runs for b in r.blocks]
        self.ub = max(r.ub for r in runs)

    def exhausted(self) -> bool:
        return all(r.exhausted() for r in self.runs)

    def _min_run(self) -> _List:
        best = None
        for r in self.runs:
            if not r.exhausted() and (
                best is None or r.cur_doc() < best.cur_doc()
            ):
                best = r
        return best

    def cur_doc(self) -> int:
        return self._min_run().cur_doc()

    def contribution(self) -> float:
        return self._min_run().contribution()

    def cur_tf_dl(self) -> tuple[float, float]:
        return self._min_run().cur_tf_dl()

    def advance(self) -> None:
        self._min_run().advance()

    def seek(self, target: int) -> None:
        for r in self.runs:
            if not r.exhausted():
                r.seek(target)

    def materialize(self) -> None:
        """Decode-verify the minimum position: dead-filtering may reveal
        a run's optimistic first_doc was hidden, shifting the min —
        loop until the min run(s) are decoded and stable."""
        while True:
            doc = None
            for r in self.runs:
                if not r.exhausted():
                    c = r.cur_doc()
                    if doc is None or c < doc:
                        doc = c
            if doc is None:
                return
            moved = False
            for r in self.runs:
                if not r.exhausted() and r.cur_doc() == doc:
                    r.materialize()
                    if r.exhausted() or r.cur_doc() != doc:
                        moved = True
            if not moved:
                return


class _MergedList:
    """Cursor over the UNION of several posting runs — the prefix-expansion
    semantics (`trie/phase1.py:17-36` via `engine.py::_matched`): a query
    term in prefix mode matches every vocabulary term it prefixes, and the
    per-doc tf is the SUM over the expansion. tf_norm is applied to the
    merged tf (not per-run), exactly like the exhaustive engine's
    ``groupBy(...).sum(tf)`` before scoring.

    ub uses tf_norm(Σ run-max tf, min run-min dl): tf_norm is monotone ↑ in
    tf and ↓ in dl, so this bounds any doc's merged contribution.
    """

    __slots__ = ("runs", "weight", "avgdl", "ub")

    def __init__(self, runs: list[_List], weight: float, avgdl: float):
        self.runs = runs
        self.weight = weight
        self.avgdl = avgdl
        max_tf_sum = sum(max(b[5] for b in r.blocks) for r in runs)
        min_dl = min(min(b[6] for b in r.blocks) for r in runs)
        self.ub = weight * _tf_norm(max_tf_sum, min_dl, avgdl)

    def exhausted(self) -> bool:
        return all(r.exhausted() for r in self.runs)

    def cur_doc(self) -> int:
        return min(r.cur_doc() for r in self.runs if not r.exhausted())

    def contribution(self) -> float:
        d = self.cur_doc()
        tf = 0.0
        dl = 0.0
        for r in self.runs:
            if not r.exhausted() and r.cur_doc() == d:
                t, l = r.cur_tf_dl()
                tf += t
                dl = l  # dl is per (doc, section): identical across runs
        return self.weight * _tf_norm(tf, dl, self.avgdl)

    def advance(self) -> None:
        d = self.cur_doc()
        for r in self.runs:
            if not r.exhausted() and r.cur_doc() == d:
                r.advance()

    def seek(self, target: int) -> None:
        for r in self.runs:
            if not r.exhausted():
                r.seek(target)

    def materialize(self) -> None:
        """Same min-stabilizing loop as `_SegmentedList.materialize` (the
        runs here are `_List`/`_SegmentedList`, both materializable)."""
        while True:
            doc = None
            for r in self.runs:
                if not r.exhausted():
                    c = r.cur_doc()
                    if doc is None or c < doc:
                        doc = c
            if doc is None:
                return
            moved = False
            for r in self.runs:
                if not r.exhausted() and r.cur_doc() == doc:
                    r.materialize()
                    if r.exhausted() or r.cur_doc() != doc:
                        moved = True
            if not moved:
                return


def _wand_query(
    lists: list, k: int, deleted: frozenset = frozenset(), allowed=None
) -> list[tuple[int, float]]:
    """Exact top-k (doc_id, score) under the FINAL output ordering
    (-round(score, 9), doc_id); ``deleted`` docs are advanced past without
    entering the heap. ``allowed`` (optional doc_id → bool) implements the
    category filter: failing docs are treated exactly like deleted ones.

    The heap is keyed by (round(score, 9), -doc_id) — the exact downstream
    ordering — so eviction can never discard a doc that out-ranks a kept
    one at a rounding-boundary near-tie (raw-score eviction had a
    1e-12..5e-10 collision band). The pivot threshold θ is therefore the
    ROUNDED k-th score; pruning keeps anything within 1e-9 of it, which
    covers the 5e-10 rounding half-step with margin."""
    heap: list[tuple[float, int, float]] = []  # (round9, -doc_id, raw)
    lists = [L for L in lists if not L.exhausted()]
    while True:
        lists = [L for L in lists if not L.exhausted()]
        if not lists:
            break
        lists.sort(key=lambda L: L.cur_doc())
        theta = heap[0][0] if len(heap) >= k else float("-inf")
        acc = 0.0
        pivot_idx = None
        for i, L in enumerate(lists):
            acc += L.ub
            # a doc with Σub just below θ can still round equal to the
            # k-th score and win its doc_id tie — don't skip it
            if acc >= theta - 1e-9:
                pivot_idx = i
                break
        if pivot_idx is None:
            break  # Σ ub ≪ θ: no remaining doc can enter the top-k
        pivot = lists[pivot_idx].cur_doc()
        if lists[0].cur_doc() == pivot:
            # decode-verify every claimant: under seq-scoped tombstones an
            # undecoded block's first_doc can be a hidden posting of an
            # updated doc — materialize() filters it and moves the cursor
            # forward. Cheap: claimants decode for contribution()/advance()
            # anyway; cursors only move forward, so the loop terminates.
            any_at_pivot = False
            for L in lists:
                if not L.exhausted() and L.cur_doc() == pivot:
                    L.materialize()
                    if not L.exhausted() and L.cur_doc() == pivot:
                        any_at_pivot = True
            if not any_at_pivot:
                continue  # the pivot doc was fully dead here; re-pick
            live = pivot not in deleted and (allowed is None or allowed(pivot))
            score = 0.0
            if live:
                for L in lists:
                    if not L.exhausted() and L.cur_doc() == pivot:
                        score += L.contribution()
            for L in lists:
                if not L.exhausted() and L.cur_doc() == pivot:
                    L.advance()
            if live:
                item = (round(score, 9), -pivot, score)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item[:2] > heap[0][:2]:
                    heapq.heapreplace(heap, item)
        else:
            # advance the laggard(s) to the pivot, skipping blocks
            lists[0].seek(pivot)
    return [(-nd, raw) for _, nd, raw in heap]


class WandEngine:
    """BM25 top-k via block-max WAND over ``<index_dir>/packed``.

    Concurrency: a ``SparkSession`` is thread-safe, an engine's CACHE
    handoff is not — ``search()`` swaps the previous batch's persisted
    shard out without a lock, so two threads sharing one engine would
    evict each other's shard mid-batch (correct but recompute-taxed).
    For concurrent serving hold ONE ENGINE PER WORKER THREAD over the
    same index_dir and ``close()`` each when done (per-engine executor
    storage is the doclen map + one query-term shard, both small);
    measured throughput for that model: BENCH/BASELINE.md "Concurrent
    query throughput" (`scripts/bench_qps.py`)."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        distributed_spell: bool = False,
        version: int | None = None,
        max_prefix_expand: int = 20_000,
    ):
        """``distributed_spell=True``: query-token correction via the
        Spark bigram-table join (`spell.correct_words_spark`) instead of
        the driver-side vocabulary dict — vocab never leaves the cluster.

        ``max_prefix_expand`` bounds how many dictionary terms a prefix
        batch may expand to: WAND collects the expansion to the driver
        (it becomes the packed scan's literal ``In`` pushdown and the
        per-query cursor set), which is safe for sane prefixes but would
        be a driver OOM for a 1-char prefix over a billion-term
        dictionary. Over-budget batches raise with guidance instead —
        ``SearchEngine``'s prefix expansion stays fully distributed and
        has no such bound.

        ``version`` pins a catalog snapshot (time travel; None = current).
        The packed table arrives with its LSM ``segment`` column
        (catalog.read_packed): incremental adds commit new segments instead
        of repacking, and the per-bucket scorer merges segment cursors."""
        from information_retrieval_spark.index.catalog import (
            read_doc_meta,
            read_packed,
            read_table,
            read_term_df,
        )

        self.spark = spark
        self.index_dir = index_dir
        self.version = version
        self.distributed_spell = distributed_spell
        self.packed = read_packed(spark, index_dir, version)
        # live-filtered: an updated doc awaiting compaction has doclen
        # rows in both its old and new segments — _dl_map's per-doc
        # section map would hit duplicate keys on the stale ones
        from information_retrieval_spark.index.catalog import read_live_table

        self.doclen = read_live_table(spark, index_dir, "doclen", version)
        self.term_df = read_term_df(spark, index_dir, version)
        stop = read_table(spark, index_dir, "stopwords", version)
        self.stop_terms = {r.term for r in stop.collect()}
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.config = json.load(f)["config"]
        self.sections = list(self.config["sections"].keys())
        self.tokenizer = self.config["tokenizer"]
        # delete-vector (index/maintenance.py): (doc_id, upto) seq-scoped
        # tombstones — a row hides the doc only in segments with
        # _SEQ <= upto, so an updated/re-added doc's new rows stay live.
        # Never collected: the scoring pass receives each bucket's
        # tombstones cogrouped with its shard (see search), so membership
        # stays partition-aligned at any delete-vector size.
        from information_retrieval_spark.index.catalog import read_deletes

        self.deleted_df = read_deletes(spark, index_dir, version)
        self.doc_meta = read_doc_meta(spark, index_dir, version)
        self.n_buckets = int(self.config.get("n_buckets", 8))
        self.max_prefix_expand = max_prefix_expand
        self._dl_map_df = None
        self._last_shard = None
        self._bigram_dict = None
        self._vocab_over_cap = False

    def close(self) -> None:
        """Release this engine's persisted executor state (the doclen map
        and the last batch's term shard). A WandEngine keeps both cached
        across ``search()`` calls so a query stream amortizes them; a
        long-lived process that cycles through many engines (one per
        index/snapshot — e.g. a size sweep, a multi-tenant server) must
        close each one or the abandoned cache blocks accumulate in
        executor storage memory until eviction churn taxes every later
        job (measured: a 3-size sweep that skipped close() showed 2.7×
        on the LAST index's warm query batch vs the same batch isolated;
        BENCH/BASELINE.md corpus-size section). Idempotent; the engine
        remains usable after close() — the next search() re-caches."""
        if self._dl_map_df is not None:
            self._dl_map_df.unpersist()
            self._dl_map_df = None
        if self._last_shard is not None:
            self._last_shard.unpersist()
            self._last_shard = None

    def __enter__(self) -> "WandEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------- helpers

    def _dl_map(self):
        """Per-doc section→dl map, folded once and cached across queries —
        the distributed analogue of the reference's in-RAM doclen dict. It
        collapses the Q2 sections crossJoin + per-section shuffle into one
        join + one aggregate (missing section still contributes dl = 0)."""
        if self._dl_map_df is None:
            self._dl_map_df = (
                self.doclen.groupBy("doc_id")
                .agg(
                    F.map_from_arrays(
                        F.collect_list("section"), F.collect_list("dl")
                    ).alias("dlmap")
                )
                .persist()
            )
        return self._dl_map_df

    def _tokenize(self, text: str) -> list[str]:
        toks = code_terms(text) if self.tokenizer == "code" else simple_tokens(text)
        return [t for t in toks if t not in self.stop_terms]

    def _weights(self, q: QuerySpec) -> dict[str, float]:
        if q.section_weights:
            return q.section_weights
        if set(self.sections) == {"title", "abstract"}:
            return {"abstract": 0.2, "title": 0.8}
        return {self.sections[0]: 1.0}

    # ---------------------------------------------------------------- main

    def _correct(self, text: str) -> str:
        """Spell-correct the query (quirk Q7): driver-side bigram dict when
        the vocabulary fits under MAX_SPELL_VOCAB_COLLECT, else the fully
        distributed bigram-join path — never an unbounded vocab collect."""
        from information_retrieval_spark.query.spell import (
            apply_corrections,
            bigram_dict_if_small,
            correct_text,
            spell_map_for_texts,
        )

        if self._bigram_dict is None and not self._vocab_over_cap:
            self._bigram_dict = bigram_dict_if_small(
                self.spark, self.index_dir, self.version
            )
            self._vocab_over_cap = self._bigram_dict is None
        if self._bigram_dict is not None:
            return correct_text(self._bigram_dict, text)
        fixes = spell_map_for_texts(
            self.spark, self.index_dir, [text], self.version
        )
        return apply_corrections(text, lambda t: fixes.get(t, t))

    def _expand_prefix(self, qterms: set[str]) -> dict[str, list[str]]:
        """qterm → matching postings terms (prefix semantics,
        `trie/phase1.py:17-36`): every indexed term the qterm prefixes,
        GATED on the exact term existing (`has_exact` in engine._matched).
        One pushed-filter scan of the term dictionary. Under logical
        deletes the gate is re-checked against the LIVE matched stream in
        ``search`` (term_df is only refreshed at compact, so a fully
        deleted exact term must still suppress its expansion)."""
        from functools import reduce
        from operator import or_

        if not qterms:
            return {}
        cond = reduce(or_, [F.col("term").startswith(t) for t in qterms])
        cap = self.max_prefix_expand
        terms = [
            r.term
            for r in self.term_df.filter(cond).limit(cap + 1).collect()
        ]
        if len(terms) > cap:
            raise ValueError(
                f"prefix expansion exceeds max_prefix_expand={cap} "
                f"dictionary terms for qterms {sorted(qterms)[:5]}...; "
                "narrow the prefixes, raise max_prefix_expand, or use "
                "SearchEngine (its prefix expansion is fully distributed)"
            )
        out: dict[str, list[str]] = {}
        have = set(terms)
        for q in qterms:
            if q in have:
                out[q] = [t for t in terms if t.startswith(q)]
        return out

    def search(self, queries: list[QuerySpec]) -> DataFrame:
        """(query_id, rank, doc_id, score) — rank-identical to the
        exhaustive engine for both match modes (okapi25)."""
        # The packed blocks carry BM25-shaped bounds (max_tf, min_dl);
        # tf-idf cosine would need per-block norm metadata the index
        # doesn't store. Refuse loudly rather than silently scoring a
        # ltn/ltc spec with BM25 (SearchEngine serves those methods).
        bad = sorted({q.method for q in queries} - {"okapi25"})
        if bad:
            raise ValueError(
                f"WandEngine scores okapi25 only (got {bad}); "
                "use SearchEngine for ltn-lnn / ltc-lnc"
            )
        modes = {q.match_mode for q in queries}
        assert len(modes) == 1, "mixed match modes: split the batch"
        mode = modes.pop()
        fixes = None
        if self.distributed_spell and any(q.spell for q in queries):
            from information_retrieval_spark.query.spell import (
                spell_map_for_texts,
            )

            fixes = spell_map_for_texts(
                self.spark, self.index_dir,
                [q.text for q in queries if q.spell],
                self.version,
            )
        qtoks: dict[int, dict[str, int]] = {}
        for q in queries:
            if q.spell and fixes is not None:
                from information_retrieval_spark.query.spell import (
                    apply_corrections,
                )

                text = apply_corrections(q.text, lambda t: fixes.get(t, t))
            elif q.spell:
                text = self._correct(q.text)
            else:
                text = q.text
            toks = self._tokenize(text)
            mult: dict[str, int] = {}
            for t in toks:
                mult[t] = mult.get(t, 0) + 1
            qtoks[q.query_id] = mult
        uniq_qterms = {t for m in qtoks.values() for t in m}
        if mode == "prefix":
            expansions = self._expand_prefix(uniq_qterms)
        else:
            expansions = {t: [t] for t in uniq_qterms}
        all_terms = sorted({t for ts in expansions.values() for t in ts})
        if not all_terms:
            return self.spark.createDataFrame(
                [], "query_id long, rank int, doc_id long, score double"
            )

        shard = self.packed.filter(F.col("term").isin(all_terms)).cache()

        # --- stats pre-pass: decode doc_ids only (Q1 n_cand, Q2 avgdl) ----
        # one output frame per Arrow BATCH (np.repeat of the block keys by
        # block length), not one per block — per-block DataFrame
        # construction was the pre-pass's Python floor at batch sizes of
        # thousands of blocks
        def decode_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                arrs = [
                    decode_doc_gaps(b).astype(np.int64)
                    for b in pdf["docs_bin"]
                ]
                lens = np.fromiter(
                    (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
                )
                yield pd.DataFrame(
                    {
                        "term": np.repeat(pdf["term"].to_numpy(), lens),
                        "section": np.repeat(pdf["section"].to_numpy(), lens),
                        "doc_id": (
                            np.concatenate(arrs)
                            if arrs
                            else np.empty(0, dtype=np.int64)
                        ),
                        "seg_seq": np.repeat(
                            pdf["seg_seq"].to_numpy(), lens
                        ),
                    }
                )

        matched = shard.select(
            "term", "section", "docs_bin", "seg_seq"
        ).mapInPandas(decode_docs, _DOCS_SCHEMA)
        # (query_id, qterm, term) triples map expanded terms back to qterms
        qt_rows = [
            (qid, qterm, term)
            for qid, m in qtoks.items()
            for qterm in m
            for term in expansions.get(qterm, [])
        ]
        if not qt_rows:
            return self.spark.createDataFrame(
                [], "query_id long, rank int, doc_id long, score double"
            )
        qt = self.spark.createDataFrame(
            qt_rows, "query_id long, qterm string, term string"
        )
        mq = matched.join(F.broadcast(qt), "term")
        # seq-scoped tombstone filter (same anti-join shape as
        # catalog.filter_deleted): the pre-pass stats recompute over live
        # rows only, and an updated doc counts once (its old-segment rows
        # are hidden, its new-segment rows live)
        from information_retrieval_spark.index.catalog import filter_deleted

        live_mq = filter_deleted(mq, self.deleted_df)
        # category filter (QuerySpec.filter_category): restrict filtered
        # queries' matched streams to their category's docs BEFORE the gate
        # and candidate stats — same placement as engine._matched
        cat_map = {
            q.query_id: q.filter_category
            for q in queries
            if q.filter_category is not None
        }
        if cat_map:
            if self.doc_meta is None:
                raise ValueError(
                    "filter_category requires an index built with"
                    " IndexBuilder(category_col=...)"
                )
            cat_df = self.spark.createDataFrame(
                list(cat_map.items()), "query_id long, want_cat string"
            )
            from information_retrieval_spark.index.catalog import (
                prune_doc_meta,
            )

            dm = prune_doc_meta(self.doc_meta, list(cat_map.values()))
            live_mq = (
                live_mq.join(F.broadcast(cat_df), "query_id", "left")
                .join(dm, "doc_id", "left")
                .filter(
                    F.col("want_cat").isNull()
                    | (F.col("category") == F.col("want_cat"))
                )
                .drop("want_cat", "category")
            )
        # boolean term constraints (QuerySpec.filter_terms/exclude_terms,
        # Lucene filter context): presence read from postings_flat with a
        # pushed In(filter terms) scan; the per-query allow/deny doc sets
        # restrict the stats stream here and ride the bucket-aligned meta
        # channel into the WAND pass below — same two placements as the
        # category filter
        mu_rows, ex_rows = [], []
        for q in queries:
            ft = list(dict.fromkeys(q.filter_terms or ()))
            mu_rows.extend((q.query_id, t, len(ft)) for t in ft)
            ex_rows.extend(
                (q.query_id, t) for t in dict.fromkeys(q.exclude_terms or ())
            )
        has_must = {qid for qid, _, _ in mu_rows}
        ex_df = mu_df = None
        if mu_rows or ex_rows:
            from information_retrieval_spark.index.catalog import (
                read_live_postings,
            )

            pf = read_live_postings(
                self.spark, self.index_dir, self.version
            )
            if pf is None:
                raise ValueError(
                    "filter_terms/exclude_terms require a postings_flat"
                    f" table in index {self.index_dir!r}"
                )
            fterms = sorted(
                {t for _, t, _ in mu_rows} | {t for _, t in ex_rows}
            )
            fp = pf.select("term", "doc_id").filter(
                F.col("term").isin(fterms)
            )
            # no fp-wide distinct: (term, doc_id) repeats only across
            # sections, and BOTH consumers dedup inherently (the exclude
            # branch distincts its own projection; the must branch counts
            # DISTINCT mterm) — a pre-distinct here was one extra shuffle
            # of the filter-term postings for nothing
            if ex_rows:
                ex_spec = self.spark.createDataFrame(
                    ex_rows, "query_id long, xterm string"
                )
                ex_df = (
                    fp.join(F.broadcast(ex_spec), fp.term == ex_spec.xterm)
                    .select("query_id", "doc_id")
                    .distinct()
                )
                live_mq = live_mq.join(
                    ex_df, ["query_id", "doc_id"], "left_anti"
                )
            if mu_rows:
                mu_spec = self.spark.createDataFrame(
                    mu_rows, "query_id long, mterm string, n_must int"
                )
                mu_df = (
                    fp.join(F.broadcast(mu_spec), fp.term == mu_spec.mterm)
                    .groupBy("query_id", "doc_id", "n_must")
                    .agg(F.countDistinct("mterm").alias("got"))
                    .filter(F.col("got") == F.col("n_must"))
                    .select("query_id", "doc_id")
                )
                hm_df = self.spark.createDataFrame(
                    [(qid, 1) for qid in sorted(has_must)],
                    "query_id long, __hm int",
                )
                live_mq = (
                    live_mq.join(
                        mu_df.withColumn("__mok", F.lit(1)),
                        ["query_id", "doc_id"],
                        "left",
                    )
                    .join(F.broadcast(hm_df), "query_id", "left")
                    .filter(
                        F.col("__hm").isNull() | F.col("__mok").isNotNull()
                    )
                    .drop("__mok", "__hm")
                )
        has_tfil = bool(mu_rows or ex_rows)
        has_deletes = self.deleted_df is not None
        if mode == "prefix" and (has_deletes or cat_map or has_tfil):
            # re-check the has_exact gate against LIVE postings, exactly as
            # engine._matched does and BEFORE candidate stats: a fully
            # deleted exact term must suppress its whole expansion,
            # including its docs' contribution to Q1 n_cand / Q2 avgdl.
            # (Without deletes, _expand_prefix's term_df gate is equivalent.)
            wge = Window.partitionBy("query_id", "qterm")
            live_mq = (
                live_mq.withColumn(
                    "has_exact",
                    F.max((F.col("term") == F.col("qterm")).cast("int")).over(
                        wge
                    ),
                )
                .filter(F.col("has_exact") == 1)
                .drop("has_exact")
            )
        cand = live_mq.select("query_id", "doc_id").distinct()
        dl_map = self._dl_map()
        sec_avgs = [
            F.avg(
                F.coalesce(F.element_at("dlmap", F.lit(s)), F.lit(0))
            ).alias(f"avgdl_{i}")
            for i, s in enumerate(self.sections)
        ]
        stats_agg = (
            cand.join(dl_map, "doc_id", "left")
            .groupBy("query_id")
            .agg(F.count("*").alias("n_cand"), *sec_avgs)
        )
        # df sub-plan: per-(query, qterm) over the LIVE (gated) expanded
        # stream when prefix expansion or deletes make term_df stale
        # (`engine.py` dfq semantics); otherwise the global term_df table
        # (tiny pushed-filter scan). A qterm with no live group simply never
        # appears → df_of returns None → the term is skipped.
        per_query_df = (
            mode == "prefix" or has_deletes or bool(cat_map) or has_tfil
        )
        if per_query_df:
            df_agg = live_mq.groupBy("query_id", "qterm").agg(
                F.countDistinct("doc_id").alias("df")
            )
        else:
            df_agg = self.term_df.filter(F.col("term").isin(all_terms)).select(
                F.lit(None).cast("long").alias("query_id"),
                F.col("term").alias("qterm"),
                F.col("df").cast("long").alias("df"),
            )
        # ONE driver job for the whole pre-pass: the stats and df aggregates
        # are tagged and unioned so the batch pays a single round of job
        # scheduling (the sequential-collects latency floor flagged in
        # round 1), both reading the same cached shard
        avg_cols = [f"avgdl_{i}" for i in range(len(self.sections))]
        pre = stats_agg.select(
            F.lit("stats").alias("kind"),
            "query_id",
            F.lit(None).cast("string").alias("qterm"),
            F.lit(None).cast("long").alias("df"),
            F.col("n_cand").cast("long").alias("n_cand"),
            *[F.col(c).cast("double").alias(c) for c in avg_cols],
        ).unionByName(
            df_agg.select(
                F.lit("df").alias("kind"),
                "query_id",
                "qterm",
                "df",
                F.lit(None).cast("long").alias("n_cand"),
                *[F.lit(None).cast("double").alias(c) for c in avg_cols],
            )
        )
        avgdl: dict = {}
        n_cand: dict = {}
        dfs: dict = {}
        table: dict = {}
        for r in pre.collect():
            if r.kind == "stats":
                n_cand[r.query_id] = r.n_cand
                for i, s in enumerate(self.sections):
                    avgdl[(r.query_id, s)] = r[f"avgdl_{i}"]
            elif r.query_id is None:
                table[r.qterm] = r.df
            else:
                dfs[(r.query_id, r.qterm)] = r.df

        def df_of(qid: int, t: str):
            return dfs.get((qid, t)) if per_query_df else table.get(t)

        # --- per-query scoring-term meta (weight = mult · idf · w_s) ------
        qmeta: dict[int, dict] = {}
        for q in queries:
            terms = {}
            nq = n_cand.get(q.query_id, 0)
            for t, mult in qtoks[q.query_id].items():
                if t not in expansions:
                    continue
                df = df_of(q.query_id, t)
                if df is None or nq == 0:
                    continue
                idf = float(np.log((nq - df + 0.5) / (df + 0.5) + 1.0))
                for s, w in self._weights(q).items():
                    a = avgdl.get((q.query_id, s))
                    if a is None or a == 0:
                        continue
                    terms[(t, s)] = {
                        "weight": mult * idf * w,
                        "avgdl": a,
                        "expand": expansions[t],
                    }
            qmeta[q.query_id] = {"terms": terms, "k": q.k}

        # --- WAND pass per bucket -----------------------------------------
        # (applyInPandas dispatches on function arity — a 2-arg callable is
        # called as (key, pdf) — so the plain path gets a 1-arg wrapper)
        def wand_bucket_impl(
            pdf: pd.DataFrame,
            cat_of: dict | None,
            deleted_upto: dict,
            ex_docs: dict | None = None,
            mu_docs: dict | None = None,
        ) -> pd.DataFrame:
            # (term, section) → {segment → block run}: each LSM segment is
            # its own sorted, non-overlapping run; multi-segment groups get
            # a _SegmentedList cursor over the per-segment _Lists
            by_ts: dict[tuple[str, str], dict[int, list]] = {}
            seq_of_seg: dict[int, int] = {}
            pdf = pdf.sort_values(["term", "section", "segment", "block_id"])
            for r in pdf.itertuples(index=False):
                seq_of_seg[int(r.segment)] = int(r.seg_seq)
                by_ts.setdefault((r.term, r.section), {}).setdefault(
                    int(r.segment), []
                ).append(
                    (r.first_doc, r.last_doc, r.docs_bin, r.tfs_bin,
                     r.dls_bin, r.max_tf, r.min_dl)
                )

            # tombstones split two ways (deleted_upto: doc → max upto):
            # * upto >= every segment seq in this bucket → the doc is dead
            #   in ALL its postings here: zero-decode skip at pivot level
            #   (the classic delete path, `deleted` in _wand_query);
            # * upto below the newest seq (an updated doc whose re-added
            #   rows live in a newer segment) → per-segment dead arrays,
            #   filtered out inside `_List._decode`. Mutually exclusive by
            #   construction — advance() past a pivot-level-deleted doc
            #   must still SEE its posting, or it would skip a live one.
            max_seq = max(seq_of_seg.values(), default=0)
            dead_all = frozenset(
                d for d, u in deleted_upto.items() if u >= max_seq
            )
            partial = [
                (d, u) for d, u in deleted_upto.items() if u < max_seq
            ]
            dead_of_seq: dict[int, np.ndarray | None] = {}
            for s in set(seq_of_seg.values()):
                if partial:
                    ids = [d for d, u in partial if u >= s]
                    dead_of_seq[s] = (
                        np.array(ids, dtype=np.int64).view(np.uint64)
                        if ids
                        else None
                    )
                else:
                    dead_of_seq[s] = None

            def cursor(key: tuple[str, str], weight: float, avgdl: float):
                segs = [
                    _List(blocks, weight, avgdl,
                          dead=dead_of_seq[seq_of_seg[seg]])
                    for seg, blocks in sorted(by_ts[key].items())
                ]
                return segs[0] if len(segs) == 1 else _SegmentedList(
                    segs, weight, avgdl
                )
            out_q, out_d, out_s = [], [], []
            for qid, meta in qmeta.items():
                want = cat_map.get(qid)
                exs = (ex_docs or {}).get(qid)
                # None = no must constraint; an empty set rejects every doc
                # in this bucket (the must terms match nothing here)
                mus = (
                    (mu_docs or {}).get(qid, frozenset())
                    if qid in has_must
                    else None
                )
                if want is None and not exs and mus is None:
                    allowed = None
                else:
                    def allowed(d, w=want, e=exs, mu=mus):
                        if w is not None and cat_of.get(d) != w:
                            return False
                        if e and d in e:
                            return False
                        if mu is not None and d not in mu:
                            return False
                        return True
                lists = []
                for (qterm, s), m in meta["terms"].items():
                    runs = [
                        cursor((t, s), m["weight"], m["avgdl"])
                        for t in m["expand"]
                        if (t, s) in by_ts
                    ]
                    if not runs:
                        continue
                    if len(runs) == 1:
                        lists.append(runs[0])
                    else:
                        lists.append(
                            _MergedList(runs, m["weight"], m["avgdl"])
                        )
                if not lists:
                    continue
                k = meta["k"] if meta["k"] > 0 else 1 << 30
                for doc, score in _wand_query(lists, k, dead_all, allowed):
                    out_q.append(qid)
                    out_d.append(doc)
                    out_s.append(score)
            return pd.DataFrame(
                {"query_id": out_q, "doc_id": out_d, "score": out_s}
            )

        # per-doc side information (category membership, delete vector) is
        # shipped PARTITION-ALIGNED with the shards: one union frame
        # (doc_id, kind, val) bucketed by the same doc-hash as the pack
        # layout and cogrouped with the shard — nothing corpus-sized ever
        # passes through the driver
        metas = []
        if cat_map:
            from information_retrieval_spark.index.catalog import (
                prune_doc_meta,
            )

            metas.append(
                prune_doc_meta(self.doc_meta, list(cat_map.values())).select(
                    "doc_id",
                    F.lit("cat").alias("kind"),
                    F.col("category").alias("val"),
                )
            )
        if has_deletes:
            # upto rides the val channel so the bucket scorer can scope
            # each tombstone to the segments it actually hides
            metas.append(
                self.deleted_df.select(
                    "doc_id",
                    F.lit("del").alias("kind"),
                    F.col("upto").cast("string").alias("val"),
                )
            )
        if ex_df is not None:
            metas.append(
                ex_df.select(
                    "doc_id",
                    F.lit("exq").alias("kind"),
                    F.col("query_id").cast("string").alias("val"),
                )
            )
        if mu_df is not None:
            metas.append(
                mu_df.select(
                    "doc_id",
                    F.lit("muq").alias("kind"),
                    F.col("query_id").cast("string").alias("val"),
                )
            )
        if metas:
            meta_b = metas[0]
            for m in metas[1:]:
                meta_b = meta_b.unionByName(m)
            meta_b = meta_b.withColumn(
                "bucket",
                F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int"),
            )

            def wand_cogroup(
                left: pd.DataFrame, right: pd.DataFrame
            ) -> pd.DataFrame:
                kinds = right["kind"].to_numpy()
                docs = right["doc_id"].to_numpy()
                vals = right["val"].to_numpy()
                is_del = kinds == "del"
                deleted_upto = {
                    int(d): int(v)
                    for d, v in zip(
                        docs[is_del].tolist(), vals[is_del].tolist()
                    )
                }
                is_cat = kinds == "cat"
                cat_of = dict(
                    zip(docs[is_cat].tolist(), vals[is_cat].tolist())
                )
                ex_docs: dict[int, set] = {}
                for d, v in zip(
                    docs[kinds == "exq"].tolist(), vals[kinds == "exq"].tolist()
                ):
                    ex_docs.setdefault(int(v), set()).add(d)
                mu_docs: dict[int, set] = {}
                for d, v in zip(
                    docs[kinds == "muq"].tolist(), vals[kinds == "muq"].tolist()
                ):
                    mu_docs.setdefault(int(v), set()).add(d)
                return wand_bucket_impl(
                    left, cat_of, deleted_upto, ex_docs, mu_docs
                )

            per_bucket = (
                shard.groupby("bucket")
                .cogroup(meta_b.groupby("bucket"))
                .applyInPandas(wand_cogroup, _TOPK_SCHEMA)
            )
        else:
            def wand_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
                return wand_bucket_impl(pdf, None, {})

            per_bucket = shard.groupBy("bucket").applyInPandas(
                wand_bucket, _TOPK_SCHEMA
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round("score", 9)), F.asc("doc_id")
        )
        ks = self.spark.createDataFrame(
            [(q.query_id, q.k) for q in queries], "query_id long, k int"
        )
        out = (
            per_bucket.withColumn("rank", F.row_number().over(w))
            .join(F.broadcast(ks), "query_id")
            .filter((F.col("rank") <= F.col("k")) | (F.col("k") < 0))
            .select("query_id", "rank", "doc_id", "score")
        )
        # return lazily: the caller's action consumes the still-cached shard
        # (saves one materialization job per batch); the previous batch's
        # shard cache is dropped on the NEXT search call
        if self._last_shard is not None:
            self._last_shard.unpersist()
        self._last_shard = shard
        return out
