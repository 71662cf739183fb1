"""fsck (index/fsck.py): the report-only integrity checker must pass a
healthy maintained index, and flag each corruption class it claims to
detect — missing referenced dirs, segment-seq regressions, future-scoped
tombstones, orphan debris, frozen stages."""

import json
import os
import shutil

import pytest

from information_retrieval_spark.fixtures import corpus_rows
from information_retrieval_spark.index.build import IndexBuilder
from information_retrieval_spark.index.catalog import Catalog
from information_retrieval_spark.index.fsck import fsck
from information_retrieval_spark.index.maintenance import IndexMaintenance

SECTIONS = {"title": "path", "abstract": "content"}


def _df(spark, rows):
    return spark.createDataFrame(
        [(r.doc_id, r.repo, r.path, r.commit, r.lang, r.content) for r in rows],
        "doc_id long, repo string, path string, commit string, lang string,"
        " content string",
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    """A maintained index with history: build + add + remove (tombstones
    live in the current snapshot, unpurged)."""
    rows = corpus_rows(120)
    d = str(tmp_path_factory.mktemp("fsck"))
    IndexBuilder(spark, d, SECTIONS, tokenizer="code", stop_k=10).build(
        _df(spark, rows[:100])
    )
    maint = IndexMaintenance(spark, d)
    maint.add_documents(_df(spark, rows[100:120]))
    maint.remove_documents([r.doc_id for r in rows[:3]])
    return d


def test_healthy_index_passes(idx):
    rep = fsck(idx)
    assert rep["ok"], rep["errors"]
    assert rep["errors"] == []
    assert rep["warnings"] == []
    assert rep["current_version"] == max(rep["versions"])
    assert rep["orphans"]["data_dirs"] == []
    assert rep["orphans"]["reclaimable_bytes"] == 0
    assert rep["frozen_stages"] == []
    # the 3 removals are seq-scoped tombstones in the current vector
    assert rep["tombstones"]["rows"] == 3
    assert rep["tombstones"]["seq_scoped"] == 3
    assert rep["tombstones"]["legacy_global"] == 0
    assert rep["tombstones"]["max_upto"] <= rep["current_version"]


def test_missing_referenced_dir_is_an_error(idx, tmp_path):
    d = str(tmp_path / "broken")
    shutil.copytree(idx, d)
    victim = Catalog(d).table_dirs("doclen")[0]
    shutil.rmtree(victim)
    rep = fsck(d)
    assert not rep["ok"]
    assert any("missing data dir" in e and "doclen" in e
               for e in rep["errors"])


def test_seq_regression_is_an_error(idx, tmp_path):
    d = str(tmp_path / "seqregress")
    shutil.copytree(idx, d)
    dirs = Catalog(d).table_dirs("packed")
    assert len(dirs) >= 2  # base + the add's delta segment
    # stamp the LAST (newest) segment with a seq BELOW its predecessor's
    with open(os.path.join(dirs[-1], "_SEQ"), "w") as f:
        f.write("0")
    # a second dir regressing to 0 == the base's default seq 0 is NOT a
    # regression (nondecreasing) — force a real one via the base
    with open(os.path.join(dirs[0], "_SEQ"), "w") as f:
        f.write("1")
    rep = fsck(d)
    assert not rep["ok"]
    assert any("seq regresses" in e for e in rep["errors"])


def test_future_scoped_tombstone_is_an_error(idx, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "future")
    shutil.copytree(idx, d)
    cat = Catalog(d)
    dd = cat.table_dirs("deleted_docs")[0]
    pq.write_table(
        pa.table({"doc_id": pa.array([999], pa.int64()),
                  "upto": pa.array([cat.current_version() + 50], pa.int64())}),
        os.path.join(dd, "part-injected.parquet"),
    )
    rep = fsck(d)
    assert not rep["ok"]
    assert any("beyond current version" in e for e in rep["errors"])


def test_orphans_and_stages_are_warnings(idx, tmp_path):
    d = str(tmp_path / "orphans")
    shutil.copytree(idx, d)
    # orphan data dir with real bytes
    orph = os.path.join(d, "data", "postings_flat-deadbeef")
    os.makedirs(orph)
    with open(os.path.join(orph, "junk.parquet"), "wb") as f:
        f.write(b"x" * 1234)
    # orphan snapshot above CURRENT (crashed commit)
    cur = Catalog(d).current_version()
    with open(os.path.join(d, "catalog", f"v{cur + 1}.json"), "w") as f:
        json.dump({"version": cur + 1, "tables": {}}, f)
    # partial stage (no _STAGED marker)
    os.makedirs(os.path.join(d, "__stage_crashed"))
    rep = fsck(d)
    assert rep["ok"]  # warnings, not errors — queries still correct
    assert rep["orphans"]["data_dirs"] == [
        os.path.join("data", "postings_flat-deadbeef")
    ]
    assert rep["orphans"]["reclaimable_bytes"] == 1234
    assert rep["orphans"]["snapshot_files"] == [f"v{cur + 1}.json"]
    assert any("partial stage" in w for w in rep["warnings"])
    # sweep_orphans is the repair verb fsck points at: after it, clean
    Catalog(d).sweep_orphans()
    os.rmdir(os.path.join(d, "__stage_crashed"))
    rep2 = fsck(d)
    assert rep2["orphans"]["data_dirs"] == []
    assert rep2["orphans"]["snapshot_files"] == []


def test_legacy_index_and_nonsense_paths(tmp_path):
    rep = fsck(str(tmp_path / "nowhere"))
    assert not rep["ok"]
    empty = tmp_path / "empty"
    empty.mkdir()
    rep = fsck(str(empty))
    assert not rep["ok"]


def test_deep_fsck_healthy_and_after_compact(spark, idx, tmp_path):
    """Deep mode: physical row counts + content-hash XORs equal the
    lineage log's totals on a maintained index (build + add + remove),
    and still do after a purging compact rewrote the tables and SET a
    fresh lineage log."""
    from information_retrieval_spark.index.fsck import fsck_deep

    d = str(tmp_path / "deep")
    shutil.copytree(idx, d)
    rep = fsck_deep(spark, d)
    assert rep["ok"], rep["errors"]
    assert set(rep["deep"]) == {"postings_flat", "doclen", "packed"}
    assert all(v["match"] for v in rep["deep"].values())
    IndexMaintenance(spark, d).compact()
    rep2 = fsck_deep(spark, d)
    assert rep2["ok"], rep2["errors"]
    # the purge physically dropped the tombstoned docs' rows
    assert (rep2["deep"]["doclen"]["rows_physical"]
            < rep["deep"]["doclen"]["rows_physical"])


def test_deep_fsck_flags_duplicated_part_file(spark, idx, tmp_path):
    """A duplicated parquet part file passes every shallow check (all
    referenced dirs exist) but inflates rows and flips the XOR — only
    the deep pass catches it."""
    from information_retrieval_spark.index.fsck import fsck, fsck_deep

    d = str(tmp_path / "dupe")
    shutil.copytree(idx, d)
    pf = Catalog(d).table_dirs("postings_flat")[0]
    part = next(f for f in os.listdir(pf) if f.endswith(".parquet"))
    shutil.copy(os.path.join(pf, part),
                os.path.join(pf, "part-duplicated.parquet"))
    assert fsck(d)["ok"]  # shallow cannot see it
    rep = fsck_deep(spark, d)
    assert not rep["ok"]
    assert not rep["deep"]["postings_flat"]["match"]
    assert any("deep: postings_flat" in e for e in rep["errors"])


def test_corrupt_current_snapshot_reports_not_crashes(idx, tmp_path):
    """A truncated CURRENT snapshot file is exactly the crash debris
    fsck exists to report — it must return the report (error recorded,
    orphan classification skipped as undecidable), not raise out of the
    delete-vector or orphan passes."""
    d = str(tmp_path / "corrupt")
    shutil.copytree(idx, d)
    cur = Catalog(d).current_version()
    with open(os.path.join(d, "catalog", f"v{cur}.json"), "w") as f:
        f.write('{"version": truncated')
    rep = fsck(d)
    assert not rep["ok"]
    assert any(f"snapshot v{cur} unreadable" in e for e in rep["errors"])
    assert rep["orphans"]["data_dirs"] == []  # undecidable, not misreported
    assert any("orphan detection skipped" in w for w in rep["warnings"])


def test_deep_fsck_skips_missing_dirs_instead_of_raising(
    spark, idx, tmp_path
):
    """Deep mode on an index whose referenced dir is gone (the shallow
    error case) must stay usable: the broken table is marked skipped,
    the intact tables still compare, and no PATH_NOT_FOUND escapes."""
    from information_retrieval_spark.index.fsck import fsck_deep

    d = str(tmp_path / "deepmissing")
    shutil.copytree(idx, d)
    shutil.rmtree(Catalog(d).table_dirs("doclen")[0])
    rep = fsck_deep(spark, d)
    assert not rep["ok"]  # the shallow missing-dir error
    assert rep["deep"]["doclen"] == {"skipped": "missing data dir(s)"}
    assert rep["deep"]["postings_flat"]["match"]
    assert rep["deep"]["packed"]["match"]
