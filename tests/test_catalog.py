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


def test_concurrent_writer_fenced(tmp_path):
    """Two writers committing on the same parent: the second gets EEXIST
    from the O_EXCL snapshot-file create instead of clobbering."""
    root = str(tmp_path)
    cat_a, cat_b = Catalog(root), Catalog(root)
    cat_a.commit({"t": ("set", [])}, "build")
    # simulate b racing a: b computes its commit while a lands v2
    fd = os.open(
        os.path.join(root, "catalog", "v2.json"),
        os.O_WRONLY | os.O_CREAT | os.O_EXCL,
    )
    os.close(fd)
    with pytest.raises(FileExistsError):
        cat_b.commit({"t": ("append", ["x"])}, "add")


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
