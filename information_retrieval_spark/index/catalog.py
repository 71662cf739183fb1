"""Snapshot catalog: an Iceberg-style metadata layer over the index tables.

The round-1 maintenance design mutated tables with rmtree-then-rename swaps
and documented its non-atomic windows ("a production deployment puts a
transactional table format under these swaps"). This module IS that layer,
re-expressed minimally for a filesystem: the same snapshot/manifest/commit
design Iceberg uses (snapshot = immutable metadata listing the data files of
every table; commit = atomic pointer swap; readers pin a snapshot), without
the external runtime the sandbox cannot install.

Layout under ``<index_dir>``::

    catalog/v{N}.json   immutable snapshot metadata (never rewritten)
    catalog/CURRENT     text file holding N; writers swap it atomically
    data/<table>-<tok>/ immutable data directories committed by mutations

Snapshot metadata::

    {"version": N, "parent": N-1, "operation": "build|add|remove|compact",
     "summary": {...},               # stage token, stream batch id, ...
     "tables": {"postings_flat": ["postings_flat", "data/postings_flat-a1"],
                "packed": ["packed", "data/packed-a1"], ...}}

A table's value is an ORDERED list of directories (paths relative to the
index root). Appending a directory is how incremental adds commit — for
``packed`` the list order is the LSM segment order (index/maintenance.py);
for row tables it is a plain multi-directory scan. ``spark.read.parquet``
takes the whole list, so a snapshot read is one scan with full predicate
pushdown regardless of how many commits produced it.

Guarantees (single concurrent writer, any number of readers):

* **Atomicity** — a commit is one ``os.replace`` of CURRENT; every earlier
  step only creates new files. A crash anywhere before the swap leaves the
  previous snapshot fully intact and every query path untouched.
* **Isolation** — readers that resolved their table lists keep reading the
  directories of their snapshot; commits never modify or delete a directory
  a live snapshot references (GC is explicit, `expire`).
* **Time travel** — every resolver takes ``version=``; old snapshots stay
  queryable until expired.
* **Writer fencing** — the snapshot file is created with O_EXCL; two racing
  writers cannot both commit the same version (the loser gets EEXIST and
  must retry on the new current).

Legacy interop: an index built before this layer (plain ``<index_dir>/<t>``
directories, no ``catalog/``) resolves through the legacy fallback in
`table_dirs`; the first mutation bootstraps v1 referencing those directories
in place (`Catalog.ensure`).

Reference analogue: the reference persists its whole index as one pickle
blob swapped wholesale (`ui/backend/mir/util/pickle_cache.py:8-33`) — the
atomic-replace idea at driver scale; this is its multi-table, multi-file,
cluster-scale form.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

CATALOG_SUBDIR = "catalog"
DATA_SUBDIR = "data"
CURRENT = "CURRENT"

#: strict snapshot-file name — stray files in catalog/ (editor backups,
#: "v1.json.orig" artifacts) must be IGNORED, not parsed: a ValueError out
#: of versions() would brick every read path (load/history/table_dirs)
_SNAPSHOT_RE = re.compile(r"^v(\d+)\.json$")


class Catalog:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.cat_dir = os.path.join(index_dir, CATALOG_SUBDIR)

    # ----------------------------------------------------------- inspection

    @staticmethod
    def exists(index_dir: str) -> bool:
        return os.path.exists(
            os.path.join(index_dir, CATALOG_SUBDIR, CURRENT)
        )

    def current_version(self) -> int | None:
        p = os.path.join(self.cat_dir, CURRENT)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def load(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no catalog under {self.index_dir}")
        with open(os.path.join(self.cat_dir, f"v{v}.json")) as f:
            return json.load(f)

    def versions(self) -> list[int]:
        """Committed versions only: a v{N}.json ABOVE CURRENT is the
        orphan of a commit that crashed before the pointer swap — it was
        never visible and must not count as history (the next commit
        reclaims its file, `commit`)."""
        cur = self.current_version()
        if cur is None or not os.path.isdir(self.cat_dir):
            return []
        out = []
        for fn in os.listdir(self.cat_dir):
            m = _SNAPSHOT_RE.match(fn)
            if m:
                v = int(m.group(1))
                if v <= cur:
                    out.append(v)
        return sorted(out)

    def table_dirs(self, table: str, version: int | None = None) -> list[str]:
        """Absolute data directories of ``table`` in a snapshot ([] if the
        snapshot has no such table)."""
        snap = self.load(version)
        return [
            os.path.join(self.index_dir, d)
            for d in snap["tables"].get(table, [])
        ]

    def history(self) -> list[dict]:
        """Snapshot chain, oldest first (operation/summary per version)."""
        return [self.load(v) for v in self.versions()]

    # ------------------------------------------------------------- writing

    def new_data_dir(self, table: str, token: str | None = None) -> str:
        """Reserve a fresh RELATIVE data-directory name for ``table``.
        Deterministic when ``token`` is given — crash-retried commits must
        re-derive the same destination names from their stage token."""
        tok = token if token is not None else uuid.uuid4().hex[:12]
        os.makedirs(os.path.join(self.index_dir, DATA_SUBDIR), exist_ok=True)
        return os.path.join(DATA_SUBDIR, f"{table}-{tok}")

    def abspath(self, rel: str) -> str:
        return os.path.join(self.index_dir, rel)

    def commit(
        self,
        changes: dict[str, tuple[str, list[str] | None]],
        operation: str,
        summary: dict | None = None,
    ) -> int:
        """Apply ``changes`` to the current snapshot's table lists and swap
        CURRENT. ``changes`` maps table → ("set", [reldirs]) |
        ("append", [reldirs]) | ("drop", None). Returns the new version."""
        cur = self.current_version()
        tables: dict[str, list[str]] = (
            {} if cur is None else dict(self.load(cur)["tables"])
        )
        for table, (op, dirs) in changes.items():
            if op == "set":
                tables[table] = list(dirs or [])
            elif op == "append":
                tables[table] = tables.get(table, []) + list(dirs or [])
            elif op == "drop":
                tables.pop(table, None)
            else:
                raise ValueError(f"unknown table op {op!r}")
        new_v = 1 if cur is None else cur + 1
        summary = dict(summary or {})
        # running stream high-water mark: carried forward through EVERY
        # commit so it survives compaction and snapshot expiry — the
        # streaming exactly-once check reads it from the current snapshot
        # alone (O(1), no history walk)
        prev_max = (
            self.load(cur)["summary"].get("max_stream_batch")
            if cur is not None
            else None
        )
        this_b = summary.get("stream_batch_id")
        hw = max(
            (x for x in (prev_max, this_b) if x is not None), default=None
        )
        if hw is not None:
            summary["max_stream_batch"] = int(hw)
        snap = {
            "version": new_v,
            "parent": cur,
            "operation": operation,
            "summary": summary,
            "tables": tables,
        }
        os.makedirs(self.cat_dir, exist_ok=True)
        # O_EXCL fences concurrent writers: the second committer of the same
        # parent fails here instead of silently clobbering. An existing file
        # at new_v with CURRENT still below it is NOT a concurrent winner —
        # it is the orphan of a commit that crashed before the pointer swap
        # (versions() never exposes it); reclaim it and continue.
        path = os.path.join(self.cat_dir, f"v{new_v}.json")
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            cur_now = self.current_version()
            if cur_now is not None and cur_now >= new_v:
                raise  # a concurrent writer committed first: genuine fence
            os.remove(path)  # crashed-commit orphan (single live writer)
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        with os.fdopen(fd, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
        tmp = os.path.join(self.cat_dir, CURRENT + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, os.path.join(self.cat_dir, CURRENT))
        return new_v

    def committed_token(self, token: str, since: int | None = None) -> bool:
        """True if a snapshot carries ``stage_token == token`` — the
        idempotence check for crash-retried staged commits. ``since``
        bounds the scan to versions AFTER it (the stage records the
        catalog version it was staged against, so a fresh commit checks
        zero-or-one snapshots instead of the whole history)."""
        vs = self.versions()
        if since is not None:
            vs = [v for v in vs if v > since]
        return any(
            self.load(v).get("summary", {}).get("stage_token") == token
            for v in reversed(vs)
        )

    def last_stream_batch(self) -> int | None:
        """The stream high-water mark: ``max_stream_batch`` is carried
        forward through every commit (see `commit`), so ONE read of the
        current snapshot answers — it survives compaction and expire()."""
        cur = self.current_version()
        if cur is None:
            return None
        b = self.load(cur)["summary"].get("max_stream_batch")
        return int(b) if b is not None else None

    def ensure(self, legacy_tables: list[str]) -> None:
        """Bootstrap v1 from a legacy plain-directory index: reference the
        existing table directories in place (no data movement)."""
        if self.current_version() is not None:
            return
        tables = {
            t: [t]
            for t in legacy_tables
            if os.path.isdir(os.path.join(self.index_dir, t))
        }
        self.commit(
            {t: ("set", dirs) for t, dirs in tables.items()},
            "bootstrap",
        )

    # ------------------------------------------------------------------ GC

    def expire(self, keep_last: int = 2) -> list[str]:
        """Drop all but the last ``keep_last`` snapshots and delete data
        directories no kept snapshot references. Legacy in-place table dirs
        (not under ``data/``) are also eligible once unreferenced — e.g.
        the original ``packed`` after a compact rewrote it. Returns the
        deleted paths.

        Retention contract for long-running readers: an engine resolves
        its snapshot's dirs at construction, so ``keep_last`` must exceed
        the oldest live reader's age in snapshots. A reader that outlives
        retention fails LOUDLY at its next query (missing parquet inputs
        — pinned by `tests/test_maintenance.py::
        test_live_reader_on_expired_snapshot_fails_loudly`), the same
        contract Iceberg documents for expire_snapshots vs in-flight
        scans."""
        vs = self.versions()
        if len(vs) <= keep_last:
            return []
        drop, keep = vs[:-keep_last], vs[-keep_last:]
        kept_dirs = set()
        for v in keep:
            for dirs in self.load(v)["tables"].values():
                kept_dirs.update(dirs)
        dead: list[str] = []
        for v in drop:
            for dirs in self.load(v)["tables"].values():
                for d in dirs:
                    if d not in kept_dirs and d not in dead:
                        dead.append(d)
        for d in dead:
            shutil.rmtree(os.path.join(self.index_dir, d), ignore_errors=True)
        for v in drop:
            os.remove(os.path.join(self.cat_dir, f"v{v}.json"))
        return dead

    def sweep_orphans(self) -> list[str]:
        """Delete ``data/`` dirs referenced by NO snapshot — the debris of
        crashed operations (their dirs were moved/written but the commit
        never happened). Only safe when no mutation is in flight
        (single-writer assumption makes that the caller's schedule)."""
        # orphan snapshot files above CURRENT (crashed commits) go too
        cur = self.current_version()
        if cur is not None and os.path.isdir(self.cat_dir):
            for fn in list(os.listdir(self.cat_dir)):
                m = _SNAPSHOT_RE.match(fn)
                if m and int(m.group(1)) > cur:
                    os.remove(os.path.join(self.cat_dir, fn))
        data_root = os.path.join(self.index_dir, DATA_SUBDIR)
        if not os.path.isdir(data_root):
            return []
        referenced = set()
        for v in self.versions():
            for dirs in self.load(v)["tables"].values():
                referenced.update(dirs)
        dead = []
        for fn in sorted(os.listdir(data_root)):
            rel = os.path.join(DATA_SUBDIR, fn)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, fn), ignore_errors=True)
                dead.append(rel)
        return dead


# ------------------------------------------------------------ segment seqs

#: ``upto`` written for legacy delete-vector rows that predate seq-scoped
#: tombstones (doc_id-only schema): hide the doc in EVERY segment, the old
#: global semantics. Far above any catalog version a real index reaches.
GLOBAL_UPTO = 1 << 62

#: sidecar file carrying a data dir's segment sequence number. Underscore
#: prefix keeps Spark's parquet reader from touching it (same convention as
#: _SUCCESS). Dirs without one (legacy indexes, the builder's in-place
#: tables) default to seq 0 — older than every committed tombstone, so a
#: global delete still hides them.
_SEQ_FILE = "_SEQ"


def write_segment_seq(data_dir: str, seq: int) -> None:
    """Stamp ``data_dir`` with its segment sequence (the catalog version
    its commit will land as). Written while the dir is still private to
    the writing operation — the dir stays immutable after publication."""
    with open(os.path.join(data_dir, _SEQ_FILE), "w") as f:
        f.write(str(int(seq)))


def segment_seq(data_dir: str) -> int:
    p = os.path.join(data_dir, _SEQ_FILE)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


# ---------------------------------------------------------------- resolvers

#: every table the engines read; builder snapshots exactly these
CORE_TABLES = [
    "stats",
    "stopwords",
    "postings_flat",
    "doclen",
    "term_df",
    "vocab",
    "doc_meta",
    "packed",
    "lineage",
    "deleted_docs",
]


def table_dirs(
    index_dir: str, table: str, version: int | None = None
) -> list[str]:
    """Resolve a table to its data directories: through the snapshot
    catalog when one exists, else the legacy ``<index_dir>/<table>``
    directory. [] when the table is absent either way."""
    if Catalog.exists(index_dir):
        return Catalog(index_dir).table_dirs(table, version)
    legacy = os.path.join(index_dir, table)
    return [legacy] if os.path.isdir(legacy) else []


def read_table(
    spark: SparkSession,
    index_dir: str,
    table: str,
    version: int | None = None,
) -> DataFrame | None:
    """One scan over all of a table's committed directories (None when the
    table is absent). Multi-directory reads keep predicate pushdown and
    partition pruning — the file list is metadata, not a plan barrier."""
    dirs = table_dirs(index_dir, table, version)
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def read_seq_table(
    spark: SparkSession,
    index_dir: str,
    table: str,
    version: int | None = None,
) -> DataFrame | None:
    """Like `read_table`, plus a ``seg_seq`` column carrying each row's
    segment sequence (the `_SEQ` sidecar of the data dir it came from;
    0 for legacy dirs). Dirs are scanned separately and unioned — filters
    still push into every per-dir scan — so seq-scoped tombstones
    (`filter_deleted`) can hide a doc's OLD rows while its re-added rows
    in newer segments stay visible."""
    dirs = table_dirs(index_dir, table, version)
    if not dirs:
        return None
    parts = [
        spark.read.parquet(d).withColumn(
            "seg_seq", F.lit(segment_seq(d)).cast("long")
        )
        for d in dirs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_deletes(
    spark: SparkSession,
    index_dir: str,
    version: int | None = None,
) -> DataFrame | None:
    """The delete vector as ``(doc_id, upto)``: the tombstone hides the
    doc's rows in every segment with ``seg_seq <= upto`` (sequence-scoped,
    Iceberg sequence-number semantics). Legacy doc_id-only rows read as
    ``upto = GLOBAL_UPTO`` (hide everywhere — the old global semantics).
    Duplicate tombstones for one doc collapse to the max upto (a tiny
    aggregate over the vector — never corpus-sized)."""
    dirs = table_dirs(index_dir, "deleted_docs", version)
    if not dirs:
        return None
    # explicit schema: legacy dirs lack the upto column; the parquet
    # reader fills it with null, which coalesces to the global sentinel
    dd = spark.read.schema("doc_id long, upto long").parquet(*dirs)
    return dd.groupBy("doc_id").agg(
        F.max(F.coalesce("upto", F.lit(GLOBAL_UPTO))).alias("upto")
    )


def filter_deleted(df: DataFrame, deletes: DataFrame | None) -> DataFrame:
    """Drop rows hidden by seq-scoped tombstones: a row is dead iff some
    tombstone for its doc_id has ``upto >= seg_seq``. ``df`` must carry
    the ``seg_seq`` column (`read_seq_table`); it is dropped on return.

    Plan shape: ONE broadcast hash anti-join — doc_id is the equi key,
    ``upto >= seg_seq`` rides as the join's extra condition, so this stays
    a BroadcastHashJoin (no nested loop) at any corpus size; the delete
    vector side is mutation-sized, never corpus-sized."""
    if deletes is None:
        return df.drop("seg_seq")
    d = deletes.select(
        F.col("doc_id").alias("__dd_doc"), F.col("upto").alias("__dd_upto")
    )
    return (
        df.join(
            F.broadcast(d),
            (df["doc_id"] == d["__dd_doc"])
            & (d["__dd_upto"] >= df["seg_seq"]),
            "left_anti",
        )
        .drop("seg_seq")
    )


def read_live_table(
    spark: SparkSession,
    index_dir: str,
    table: str,
    version: int | None = None,
) -> DataFrame | None:
    """A doc-row table restricted to LIVE rows: seq-scoped tombstones
    applied when a delete vector exists, otherwise the plain (cheaper)
    multi-dir scan. An updated doc awaiting compaction has rows in both
    its old and new segments — every per-doc consumer (doclen maps,
    scoring joins) must read through this or it double-counts them."""
    dd = read_deletes(spark, index_dir, version)
    if dd is None:
        return read_table(spark, index_dir, table, version)
    t = read_seq_table(spark, index_dir, table, version)
    return None if t is None else filter_deleted(t, dd)


def read_live_postings(
    spark: SparkSession, index_dir: str, version: int | None = None
) -> DataFrame | None:
    """postings_flat restricted to LIVE rows — the shared read for every
    query path that consumes flat postings (exhaustive engine, boolean,
    phrase/proximity, WAND's filter-term presence scan)."""
    return read_live_table(spark, index_dir, "postings_flat", version)


def read_packed(
    spark: SparkSession, index_dir: str, version: int | None = None
) -> DataFrame | None:
    """The packed block-max table with its LSM ``segment`` column: directory
    list order IS segment order (0 = the oldest/base segment). Each segment
    keeps its own sorted, non-overlapping block runs; WAND merges segment
    cursors per (term, section) at query time (query/wand.py). ``seg_seq``
    carries each segment's sequence number for seq-scoped tombstones (note
    position order ≠ seq order after a tiered compact's splice — the merged
    segment is newer than unmerged tail segments)."""
    dirs = table_dirs(index_dir, "packed", version)
    if not dirs:
        return None
    parts = [
        spark.read.parquet(d)
        .withColumn("segment", F.lit(i).cast("int"))
        .withColumn("seg_seq", F.lit(segment_seq(d)).cast("long"))
        for i, d in enumerate(dirs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_term_df(
    spark: SparkSession,
    index_dir: str,
    version: int | None = None,
) -> DataFrame | None:
    """term_df with MERGE-ON-READ semantics: incremental adds commit
    delta (term, df) dirs (delta docs are new, so df contributions ADD);
    multi-dir snapshots re-aggregate on read. Query-term filters push
    down to every directory scan BEFORE the aggregation, so a lookup
    still reads only the matching row groups; compact() collapses back
    to one pre-aggregated dir. This keeps an add's write cost at delta
    grain — rewriting the merged table per add would be a full
    vocabulary-sized rewrite (at 10^12 code files the term dictionary is
    itself huge)."""
    dirs = table_dirs(index_dir, "term_df", version)
    if not dirs:
        return None
    df = spark.read.parquet(*dirs)
    if len(dirs) > 1:
        df = df.groupBy("term").agg(F.sum("df").alias("df"))
    return df


def read_vocab(
    spark: SparkSession,
    index_dir: str,
    version: int | None = None,
) -> DataFrame | None:
    """vocab with merge-on-read distinct across delta dirs (same economics
    as `read_term_df`; duplicate terms across deltas must collapse —
    the bigram spell join scores per vocab ROW)."""
    dirs = table_dirs(index_dir, "vocab", version)
    if not dirs:
        return None
    v = spark.read.parquet(*dirs)
    return v.distinct() if len(dirs) > 1 else v


def read_doc_meta(
    spark: SparkSession,
    index_dir: str,
    version: int | None = None,
    with_seq: bool = False,
) -> DataFrame | None:
    """doc_meta (doc_id, category), category-HIVE-PARTITIONED on disk so
    a category-restricted search prunes whole partition directories
    (PartitionFilters, no data files of other categories touched). Dirs
    are scanned separately and unioned — Spark's multi-root partition
    discovery needs a shared basePath that committed data dirs don't
    have — which preserves per-scan pruning. Tolerates legacy
    unpartitioned dirs (same columns either way)."""
    dirs = table_dirs(index_dir, "doc_meta", version)
    if not dirs:
        return None
    # explicit schema: partition-column TYPE INFERENCE would otherwise
    # read a numeric-looking category ("007", "2024") back as int —
    # losing the leading zero and breaking both the per-dir union and the
    # engines' string comparisons; a user schema pins it to string
    parts = []
    for d in dirs:
        p = (
            spark.read.schema("doc_id long, category string")
            .parquet(d)
            .select("doc_id", "category")
        )
        if with_seq:
            p = p.withColumn(
                "seg_seq", F.lit(segment_seq(d)).cast("long")
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def prune_doc_meta(doc_meta: DataFrame, wanted: list[str]) -> DataFrame:
    """Restrict doc_meta to a batch's wanted categories — shared by both
    engines so the pruning (and its semantics) stay in lockstep. The
    filter lands as a PartitionFilter on the hive-partitioned layout, so
    other categories' files are never read. Semantics-preserving under
    the engines' later LEFT join + want_cat comparison: a doc outside
    ``wanted`` joins category=null and fails the comparison exactly as
    its real category would."""
    return doc_meta.filter(F.col("category").isin(sorted(set(wanted))))


def read_stats_pdf(index_dir: str, version: int | None = None):
    """The one-row stats table as a pandas frame (driver-side scalar)."""
    import pandas as pd

    dirs = table_dirs(index_dir, "stats", version)
    if not dirs:
        raise FileNotFoundError(f"no stats table under {index_dir}")
    frames = [pd.read_parquet(d) for d in dirs]
    return frames[0] if len(frames) == 1 else pd.concat(frames)
