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


def test_distributed_correction_matches_driver(spark, index_dir):
    """correct_words_spark (bigram-table join, vocab never collected) must
    pick the SAME correction as the driver-dict path for every token —
    including exact-vocab words, misspellings, and no-candidate gibberish."""
    from information_retrieval_spark.query.spell import (
        build_bigram_dict,
        correct_word,
        correct_words_spark,
    )

    vocab_df = spark.read.parquet(f"{index_dir}/vocab")
    vocab = [r.term for r in vocab_df.collect()]
    d = build_bigram_dict(vocab)
    words = ["tokeniezr", "steram", "buffre", "tokenizer", "zzqqxx",
             "parsre", "matrxi", "a"]
    got = correct_words_spark(vocab_df, words)
    for w in words:
        assert got.get(w, w) == correct_word(d, w), w


def test_engine_distributed_spell_rank_identity(spark, index_dir):
    """Both engines with distributed_spell=True answer misspelled queries
    identically to the driver-dict default."""
    from information_retrieval_spark.query.engine import QuerySpec, SearchEngine
    from information_retrieval_spark.query.wand import WandEngine

    specs = [
        QuerySpec(1, "tokeniezr steram", "okapi25", 10, match_mode="exact"),
        QuerySpec(2, "buffre matrxi parsre", "okapi25", 10, match_mode="exact"),
    ]

    def res(engine):
        return sorted(
            (r.query_id, r.rank, r.doc_id, round(r.score, 9))
            for r in engine.search(specs).collect()
        )

    want = res(SearchEngine(spark, index_dir))
    assert want, "misspelled queries should still match after correction"
    assert res(SearchEngine(spark, index_dir, distributed_spell=True)) == want
    assert res(WandEngine(spark, index_dir, distributed_spell=True)) == want


def test_spell_over_cap_falls_back_to_distributed(spark, index_dir, monkeypatch):
    """When the vocabulary exceeds MAX_SPELL_VOCAB_COLLECT, BOTH engines
    must answer spelled queries identically WITHOUT collecting the vocab —
    the driver-dict path auto-routes to the distributed bigram join."""
    from information_retrieval_spark.query import spell as spell_mod
    from information_retrieval_spark.query.engine import QuerySpec, SearchEngine
    from information_retrieval_spark.query.wand import WandEngine

    specs = [
        QuerySpec(1, "tokeniezr steram", "okapi25", 10, match_mode="exact"),
    ]

    def res(engine):
        return sorted(
            (r.query_id, r.rank, r.doc_id, round(r.score, 9))
            for r in engine.search(specs).collect()
        )

    want = res(SearchEngine(spark, index_dir))
    assert want

    monkeypatch.setattr(spell_mod, "MAX_SPELL_VOCAB_COLLECT", 1)
    se = SearchEngine(spark, index_dir)
    we = WandEngine(spark, index_dir)
    assert res(se) == want
    assert res(we) == want
    # the driver dict was never built: the cap forced the distributed path
    assert se._bigram_dict is None and se._vocab_over_cap
    assert we._bigram_dict is None and we._vocab_over_cap
