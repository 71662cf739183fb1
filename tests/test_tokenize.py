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


def test_flat_regex_equivalent_to_code_tokens():
    """FLAT_CODE_RE single-pass == the 3-level code_tokens cascade (terms
    AND offsets) — the vectorized build path depends on this identity."""
    import random
    import string

    from information_retrieval_spark.tokenize import FLAT_CODE_RE

    def flat(text):
        return [
            (m.group(0).lower(), m.start()) for m in FLAT_CODE_RE.finditer(text)
        ]

    cases = [
        "", "X3b", "3abc", "abc3", "a_3b", "HTTP2Server", "HTTPx", "_X",
        "_3", "fooBarBaz", "__init__", "aA", "Aa", "9", "x9y", "MD5Sum",
        "paRSer3X_9yZ", "é漢abc", "a\x00b", "def get_value(): return X",
    ]
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "_ .:(){}+-=<>'\né漢"
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(3000)
    ]
    for c in cases:
        assert flat(c) == code_tokens(c), repr(c)


def test_code_tokens_bulk_matches_per_row():
    """The batched mega-string scan must reproduce per-row code_tokens
    exactly: terms, row attribution, and in-row char offsets."""
    from information_retrieval_spark.tokenize import code_tokens_bulk

    texts = [
        "def get_value(): return HTTPServer2",
        "",
        "foo_bar X3b",
        "é漢 snake_caseCamel 42",
        "text with a \x00 byte inside",
    ]
    terms, rows, offs = code_tokens_bulk(texts)
    got = {}
    for t, r, o in zip(terms, rows.tolist(), offs.tolist()):
        got.setdefault(r, []).append((t, o))
    for i, text in enumerate(texts):
        assert got.get(i, []) == code_tokens(text), i
