"""Spell-correction units (reference semantics, `bigram_index/phase1.py`)."""

from information_retrieval_spark.query.spell import (
    build_bigram_dict,
    correct_text,
    correct_word,
    levenshtein,
    word_bigrams,
)


def test_word_bigrams_boundary():
    assert word_bigrams("ab") == ["¶a", "ab", "b¶"]


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("ab", "ba") == 2  # no transposition op (nltk default)


def test_correct_word_picks_min_edit_distance():
    d = build_bigram_dict(["tokenizer", "tokens", "parser"])
    assert correct_word(d, "tokeniezr") == "tokenizer"
    assert correct_word(d, "tokenizer") == "tokenizer"  # exact self-match
    assert correct_word(d, "xyzzyq") == "xyzzyq"  # no bigram hits → unchanged


def test_correct_text_replaces_all_occurrences():
    # "then" must be in the dict: the reference corrects ANY word with a
    # single shared bigram to its min-edit-distance candidate (no threshold)
    d = build_bigram_dict(["scan", "merge", "then"])
    # quirk Q7: str.replace-all on the raw text
    assert correct_text(d, "sacn then sacn") == "scan then scan"


def test_bigram_multiplicity_counts():
    d = build_bigram_dict(["aaa"])  # ¶a,aa,aa,a¶ → 'aa' multiplicity 2
    assert d["aa"]["aaa"] == 2
