"""spark-submit entry point for the index build (north_rule deployment path).

Cluster:
  spark-submit --py-files dist/information_retrieval_spark.zip \\
      scripts/build_index.py --corpus s3://bucket/corpus --index-dir s3://bucket/idx \\
      --sections title=path,abstract=content --tokenizer code --resume

Sandbox (local mode is chosen automatically when no master is configured):
  python scripts/build_index.py --corpus /tmp/corpus.parquet --index-dir /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet path of the corpus table")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument(
        "--sections",
        default="title=path,abstract=content",
        help="comma list of section=source_column",
    )
    ap.add_argument("--tokenizer", default="code", choices=["code", "simple"])
    ap.add_argument("--stop-k", type=int, default=20)
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--resume", action="store_true",
                    help="skip manifest-committed stages (checkpoint restart)")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument(
        "--category-col",
        default=None,
        help="corpus column persisted as doc_meta for query-time category"
        " filtering (e.g. lang)",
    )
    args = ap.parse_args()

    from information_retrieval_spark.index.build import IndexBuilder
    from information_retrieval_spark.session import get_spark

    spark = get_spark("index_build")
    sections = dict(kv.split("=", 1) for kv in args.sections.split(","))
    corpus = spark.read.parquet(args.corpus)
    manifest = IndexBuilder(
        spark,
        args.index_dir,
        sections,
        tokenizer=args.tokenizer,
        stop_k=args.stop_k,
        doc_id_col=args.doc_id_col,
        n_buckets=args.n_buckets,
        category_col=args.category_col,
    ).build(corpus, resume=args.resume)
    print(json.dumps({k: v.get("wall_s") for k, v in manifest["stages"].items()}))


if __name__ == "__main__":
    main()
