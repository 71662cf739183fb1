"""Tokenizer units + cross-system parity (Spark split == DuckDB == Python)."""

import duckdb
import pytest

from information_retrieval_spark.tokenize import (
    SIMPLE_SPLIT_PATTERN,
    code_tokens,
    code_terms,
    simple_tokens,
)


def test_simple_basic():
    assert simple_tokens("Hello, World! 42") == ["hello", "world", "42"]
    assert simple_tokens("") == []
    assert simple_tokens("...") == []
    assert simple_tokens("a--b__c") == ["a", "b", "c"]


def test_code_snake_camel_offsets():
    toks = code_tokens("def get_value(): return HTTPServer2")
    assert ("def", 0) in toks
    assert ("get", 4) in toks
    assert ("value", 8) in toks
    assert ("return", 17) in toks
    # acronym split: HTTPServer2 → http, server2
    assert ("http", 24) in toks
    assert ("server2", 28) in toks


def test_code_terms_deterministic():
    assert code_terms("fooBar foo_bar FOOBar") == [
        "foo", "bar", "foo", "bar", "foo", "bar",
    ]


@pytest.mark.parametrize(
    "text",
    [
        "the quick-brown fox; 3.14 times!",
        "  leading and trailing  ",
        "UPPER lower 123abc",
        "",
        "---",
    ],
)
def test_simple_matches_duckdb(text):
    rows = duckdb.sql(
        "SELECT t FROM (SELECT unnest(string_split_regex(lower($$%s$$), '%s')) AS t) WHERE t <> ''"
        % (text, SIMPLE_SPLIT_PATTERN)
    ).fetchall()
    assert [r[0] for r in rows] == simple_tokens(text)


def test_simple_matches_spark(spark):
    from pyspark.sql import functions as F

    texts = ["the quick-brown fox; 3.14!", "A_b C", "", "x"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = (
        df.select("text", F.split(F.lower("text"), SIMPLE_SPLIT_PATTERN).alias("toks"))
        .collect()
    )
    for row in got:
        assert [t for t in row.toks if t] == simple_tokens(row.text)
