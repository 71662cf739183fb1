"""Index-build invariants: determinism, resume, lineage, sha256 invariant."""

import json
import os
import shutil

from information_retrieval_spark.index.build import (
    IndexBuilder,
    index_content_hash,
    sha256_invariant,
)

SECTIONS = {"title": "path", "abstract": "content"}


def test_rebuild_determinism(spark, corpus_df, index_dir, tmp_path):
    d2 = str(tmp_path / "idx2")
    IndexBuilder(spark, d2, SECTIONS, tokenizer="code").build(corpus_df)
    assert index_content_hash(spark, index_dir) == index_content_hash(spark, d2)


def test_resume_skips_completed_stages(spark, corpus_df, index_dir, tmp_path):
    d2 = str(tmp_path / "idx_resume")
    shutil.copytree(index_dir, d2)
    # drop one stage from the manifest → resume must redo ONLY that stage
    with open(os.path.join(d2, "manifest.json")) as f:
        man = json.load(f)
    before = {k: v for k, v in man["stages"].items()}
    del man["stages"]["lineage"]
    del man["stages"]["ALL"]
    with open(os.path.join(d2, "manifest.json"), "w") as f:
        json.dump(man, f)
    IndexBuilder(spark, d2, SECTIONS, tokenizer="code").build(
        corpus_df, resume=True
    )
    with open(os.path.join(d2, "manifest.json")) as f:
        man2 = json.load(f)
    # untouched stages keep their original wall-clock entries (not re-run)
    for st in ("stats", "stop", "doclen", "postings", "term_df", "vocab"):
        assert man2["stages"][st] == before[st]
    assert "lineage" in man2["stages"]
    assert index_content_hash(spark, index_dir) == index_content_hash(spark, d2)


def test_lineage_partitions_cover_core_tables(spark, index_dir):
    from pyspark.sql import functions as F

    lin = spark.read.parquet(os.path.join(index_dir, "lineage"))
    for table in ("postings_flat", "doclen", "packed"):
        t = spark.read.parquet(os.path.join(index_dir, table))
        total = (
            lin.filter(F.col("table") == table).groupBy().sum("rows").collect()[0][0]
        )
        assert total == t.count(), table


def test_sha256_invariant_matches_python(spark, corpus_df, fixture_corpus):
    import hashlib

    got = {
        r.doc_id: r.content_sha256
        for r in sha256_invariant(corpus_df).select("doc_id", "content_sha256").collect()
    }
    for row in fixture_corpus[:20]:
        assert got[row.doc_id] == hashlib.sha256(row.content.encode()).hexdigest()


def test_stopwords_are_top_k_by_frequency(spark, index_dir, oracle):
    stop = spark.read.parquet(os.path.join(index_dir, "stopwords"))
    assert {r.term for r in stop.collect()} == oracle.stop_tokens
