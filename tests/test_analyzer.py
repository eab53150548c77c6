"""Analysis chain: lowercase simple-mapping, stop-filter positions, lengths."""

from lucene_solr_ray.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    lowercase,
)


def test_default_stop_set_empty():
    # StandardAnalyzer() default == empty stop set (StandardAnalyzer.java:49)
    a = StandardAnalyzer()
    assert a.analyze("the quick The THE") == ["the", "quick", "the", "the"]


def test_lowercase_simple_mapping():
    assert lowercase("FooBar") == "foobar"
    # final sigma: Java Character.toLowerCase gives σ, not ς
    assert lowercase("ΟΔΟΣ") == "οδοσ"
    # U+0130: simple mapping is plain "i" (no combining dot)
    assert lowercase("İSTANBUL") == "istanbul"


def test_stop_filter_position_accumulation():
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    terms, positions, length = a.analyze_with_positions(
        "the quick brown fox and the lazy dog"
    )
    assert terms == ["quick", "brown", "fox", "lazy", "dog"]
    # gaps where stopwords were dropped (FilteringTokenFilter.java:48-57)
    assert positions == [1, 2, 3, 6, 7]
    assert length == 5


def test_field_length_counts_survivors():
    a = StandardAnalyzer(stop_words={"x"})
    _, _, length = a.analyze_with_positions("x y x z")
    assert length == 2


def test_multi_valued_gap():
    a = StandardAnalyzer(position_increment_gap=100)
    terms, positions, length = a.analyze_multi(["a b", "c d"])
    assert terms == ["a", "b", "c", "d"]
    assert positions == [0, 1, 102, 103]
    assert length == 4


def test_term_freqs():
    a = StandardAnalyzer()
    assert a.term_freqs("a b a B") == {"a": 2, "b": 2}


def test_english_stop_words_classic_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
