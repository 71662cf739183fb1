"""Snapshot-catalog primitives (index/catalog.py): commit semantics,
writer fencing, legacy fallback, GC. Integration with real index tables is
covered by tests/test_maintenance.py / test_streaming.py."""

import os

import pytest

from information_retrieval_spark.index.catalog import Catalog, table_dirs


def _mkdirs(root, *rels):
    for r in rels:
        os.makedirs(os.path.join(root, r), exist_ok=True)


def test_commit_set_append_drop(tmp_path):
    root = str(tmp_path)
    _mkdirs(root, "t1", "data/t1-a", "data/t2-a")
    cat = Catalog(root)
    v1 = cat.commit({"t1": ("set", ["t1"])}, "build")
    assert v1 == 1
    v2 = cat.commit({"t1": ("append", ["data/t1-a"]),
                     "t2": ("set", ["data/t2-a"])}, "add")
    assert cat.current_version() == v2 == 2
    assert cat.table_dirs("t1") == [
        os.path.join(root, "t1"), os.path.join(root, "data/t1-a")
    ]
    # old snapshot unchanged (time travel)
    assert cat.table_dirs("t1", version=1) == [os.path.join(root, "t1")]
    assert cat.table_dirs("t2", version=1) == []
    v3 = cat.commit({"t2": ("drop", None)}, "compact")
    assert cat.table_dirs("t2", version=v3) == []
    assert [s["operation"] for s in cat.history()] == [
        "build", "add", "compact"
    ]


def test_concurrent_writer_fenced(tmp_path, monkeypatch):
    """Two writers racing on the same parent: the loser's O_EXCL create
    collides with a snapshot the winner ALREADY MADE CURRENT, and the
    commit raises instead of clobbering. (A colliding file NOT yet
    current is the opposite case — a crashed commit's orphan — and is
    reclaimed; see test_orphan_snapshot_reclaimed_not_counted.)"""
    root = str(tmp_path)
    cat = Catalog(root)
    cat.commit({"t": ("set", [])}, "build")
    cat.commit({"t": ("append", ["x"])}, "add")  # the winner lands v2

    # the loser read CURRENT=1 before the winner committed: feed it the
    # stale value once, then let it see reality inside the except handler
    real = Catalog.current_version
    seen = []

    def stale_once(self):
        if not seen:
            seen.append(1)
            return 1
        return real(self)

    monkeypatch.setattr(Catalog, "current_version", stale_once)
    with pytest.raises(FileExistsError):
        Catalog(root).commit({"t": ("append", ["y"])}, "add")


def test_committed_token_idempotence(tmp_path):
    cat = Catalog(str(tmp_path))
    cat.commit({"t": ("set", [])}, "add", {"stage_token": "abc"})
    assert cat.committed_token("abc")
    assert not cat.committed_token("def")


def test_legacy_fallback_and_ensure(tmp_path):
    root = str(tmp_path)
    _mkdirs(root, "postings_flat", "doclen")
    # no catalog: resolver falls back to plain dirs
    assert table_dirs(root, "postings_flat") == [
        os.path.join(root, "postings_flat")
    ]
    assert table_dirs(root, "missing") == []
    cat = Catalog(root)
    cat.ensure(["postings_flat", "doclen", "missing"])
    assert cat.current_version() == 1
    assert table_dirs(root, "doclen") == [os.path.join(root, "doclen")]
    assert table_dirs(root, "missing") == []
    cat.ensure(["postings_flat"])  # idempotent
    assert cat.current_version() == 1


def test_expire_keeps_referenced_dirs(tmp_path):
    root = str(tmp_path)
    _mkdirs(root, "shared", "data/old-a", "data/new-a")
    cat = Catalog(root)
    cat.commit({"t": ("set", ["shared", "data/old-a"])}, "build")
    cat.commit({"t": ("set", ["shared", "data/new-a"])}, "compact")
    dead = cat.expire(keep_last=1)
    assert dead == ["data/old-a"]
    assert not os.path.exists(os.path.join(root, "data/old-a"))
    assert os.path.exists(os.path.join(root, "shared"))  # still referenced
    assert cat.versions() == [2]
    with pytest.raises(FileNotFoundError):
        cat.load(1)


def test_sweep_orphans(tmp_path):
    root = str(tmp_path)
    _mkdirs(root, "data/t-live", "data/t-orphan")
    cat = Catalog(root)
    cat.commit({"t": ("set", ["data/t-live"])}, "build")
    dead = cat.sweep_orphans()
    assert dead == ["data/t-orphan"]
    assert os.path.exists(os.path.join(root, "data/t-live"))
    assert not os.path.exists(os.path.join(root, "data/t-orphan"))


def test_orphan_snapshot_reclaimed_not_counted(tmp_path):
    """A v{N}.json ABOVE CURRENT (a commit that crashed before the
    pointer swap) is invisible to history/committed_token and is
    reclaimed by the next commit instead of blocking it forever."""
    import json

    root = str(tmp_path)
    cat = Catalog(root)
    cat.commit({"t": ("set", [])}, "build")
    # orphan: v2.json written, CURRENT never swapped
    with open(os.path.join(root, "catalog", "v2.json"), "w") as f:
        json.dump({"version": 2, "summary": {"stage_token": "ghost"},
                   "tables": {}}, f)
    assert cat.versions() == [1]
    assert not cat.committed_token("ghost")  # never visible ⇒ not committed
    v = cat.commit({"t": ("append", ["x"])}, "add", {"stage_token": "real"})
    assert v == 2 and cat.current_version() == 2
    assert cat.committed_token("real")
    assert not cat.committed_token("ghost")  # reclaimed, not resurrected


def test_stream_high_water_mark_survives_expire(tmp_path):
    """max_stream_batch is carried through every commit, so the
    exactly-once check survives compaction + snapshot expiry."""
    root = str(tmp_path)
    _mkdirs(root, "data/a", "data/b")
    cat = Catalog(root)
    cat.commit({"t": ("set", ["data/a"])}, "build")
    cat.commit({"t": ("append", [])}, "add", {"stream_batch_id": 7})
    cat.commit({"t": ("set", ["data/b"])}, "compact")  # no batch id
    assert cat.last_stream_batch() == 7
    cat.expire(keep_last=1)  # drops the snapshot that carried batch 7
    assert cat.last_stream_batch() == 7


def test_stray_catalog_files_ignored(tmp_path):
    """Non-snapshot files in catalog/ (editor backups, .orig artifacts)
    must be skipped by the strict v{N}.json match — not parsed into a
    ValueError that bricks every read path."""
    root = str(tmp_path)
    _mkdirs(root, "data/t1-a", "data/t1-b")
    cat = Catalog(root)
    cat.commit({"t1": ("set", ["data/t1-a"])}, "build")
    cat.commit({"t1": ("append", ["data/t1-b"])}, "add")
    for stray in ("v1.json.orig", "vHEAD.json", "v2.json~", "notes.txt"):
        with open(os.path.join(root, "catalog", stray), "w") as f:
            f.write("junk")
    assert [s["version"] for s in cat.history()] == [1, 2]
    assert len(cat.table_dirs("t1")) == 2
    cat.sweep_orphans()  # must not choke on (or delete) the stray files
    for stray in ("v1.json.orig", "vHEAD.json", "v2.json~", "notes.txt"):
        assert os.path.exists(os.path.join(root, "catalog", stray))
    assert cat.current_version() == 2
