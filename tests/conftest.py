import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from information_retrieval_spark.session import get_spark

    s = get_spark("ir_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_corpus():
    """Tiny deterministic code corpus (FIXTURES.md §1, scale 'tiny')."""
    from information_retrieval_spark.fixtures import corpus_rows

    return corpus_rows(150)


@pytest.fixture(scope="session")
def corpus_df(spark, fixture_corpus):
    return spark.createDataFrame(
        [
            (r.doc_id, r.repo, r.path, r.commit, r.lang, r.content)
            for r in fixture_corpus
        ],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )


@pytest.fixture(scope="session")
def index_dir(spark, corpus_df, tmp_path_factory):
    from information_retrieval_spark.index.build import IndexBuilder

    d = str(tmp_path_factory.mktemp("index"))
    IndexBuilder(
        spark, d, {"title": "path", "abstract": "content"}, tokenizer="code"
    ).build(corpus_df)
    return d


@pytest.fixture(scope="session")
def oracle(fixture_corpus):
    from tests.oracle import Oracle

    return Oracle(
        {r.doc_id: {"title": r.path, "abstract": r.content} for r in fixture_corpus},
        sections=("title", "abstract"),
        tokenizer="code",
        stop_k=20,
    )
