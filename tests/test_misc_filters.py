"""Miscellaneous-filter tests vs the reference javadoc examples."""

from __future__ import annotations

import pytest

from lucene_solr_ray.analysis.misc import (CATENATE_ALL, CATENATE_NUMBERS,
                                           CATENATE_WORDS,
                                           DEFAULT_WDF_FLAGS,
                                           PRESERVE_ORIGINAL,
                                           ApostropheFilter,
                                           CapitalizationFilter,
                                           CodepointCountFilter,
                                           CommonGramsFilter,
                                           DecimalDigitFilter,
                                           FingerprintFilter,
                                           HyphenatedWordsFilter,
                                           KeepWordFilter,
                                           KeywordRepeatFilter,
                                           LimitTokenCountFilter,
                                           NormalizationFilter,
                                           RemoveDuplicatesTokenFilter,
                                           WordDelimiterGraphFilter)


def terms(stream):
    return [t for t, _ in stream]


def test_wdf_javadoc_examples():
    f = WordDelimiterGraphFilter()
    # "PowerShot" => "Power" "Shot" (case-change split)
    assert terms(f.apply([("PowerShot", 0)])) == ["Power", "Shot"]
    # "500-42" => "500" "42"
    assert terms(f.apply([("500-42", 0)])) == ["500", "42"]
    # "O'Neil's" => "O" "Neil" (possessive stemmed)
    assert terms(f.apply([("O'Neil's", 0)])) == ["O", "Neil"]
    # letter/number transition
    assert terms(f.apply([("j2se", 0)])) == ["j", "2", "se"]


def test_wdf_catenate_and_preserve():
    f = WordDelimiterGraphFilter(DEFAULT_WDF_FLAGS | CATENATE_WORDS)
    out = f.apply([("wi-fi", 0)])
    assert terms(out) == ["wi", "fi", "wifi"]
    # catenation stacks at the first part's position
    assert out[0][1] == out[2][1]

    f = WordDelimiterGraphFilter(DEFAULT_WDF_FLAGS | CATENATE_ALL)
    assert "wifi4000" in terms(f.apply([("wi-fi-4000", 0)]))

    f = WordDelimiterGraphFilter(DEFAULT_WDF_FLAGS | CATENATE_NUMBERS)
    assert terms(f.apply([("500-42", 0)])) == ["500", "42", "50042"]

    f = WordDelimiterGraphFilter(DEFAULT_WDF_FLAGS | PRESERVE_ORIGINAL)
    out = terms(f.apply([("500-42", 0)]))
    assert out == ["500-42", "500", "42"]


def test_wdf_protected_and_passthrough():
    f = WordDelimiterGraphFilter(protected={"wi-fi"})
    assert terms(f.apply([("wi-fi", 0), ("PowerShot", 1)])) == [
        "wi-fi", "Power", "Shot"]
    # plain tokens untouched, positions renumber sequentially; a split
    # in the middle shifts the tail
    out = f.apply([("hello", 0), ("a-b", 1), ("world", 2)])
    assert terms(out) == ["hello", "a", "b", "world"]
    assert [p for _, p in out] == [0, 1, 2, 3]


def test_decimal_digit():
    f = DecimalDigitFilter()
    assert terms(f.apply([("١٢٣", 0), ("٤٥", 1), ("abc", 2)])) == [
        "123", "45", "abc"]
    # Devanagari digits too
    assert terms(f.apply([("१२३", 0)])) == ["123"]


def test_capitalization_apostrophe_codepoint():
    assert terms(CapitalizationFilter().apply(
        [("hello", 0), ("WORLD", 1)])) == ["Hello", "World"]
    assert terms(ApostropheFilter().apply(
        [("Türkiye'deki", 0), ("plain", 1)])) == ["Türkiye", "plain"]
    assert terms(CodepointCountFilter(3, 5).apply(
        [("ab", 0), ("abc", 1), ("abcdef", 2)])) == ["abc"]


def test_keep_limit_dupes_repeat():
    assert terms(KeepWordFilter({"a", "c"}).apply(
        [("a", 0), ("b", 1), ("c", 2)])) == ["a", "c"]
    assert terms(LimitTokenCountFilter(2).apply(
        [("a", 0), ("b", 1), ("c", 2)])) == ["a", "b"]
    assert RemoveDuplicatesTokenFilter().apply(
        [("a", 0), ("a", 0), ("a", 1)]) == [("a", 0), ("a", 1)]
    assert KeywordRepeatFilter().apply([("runs", 0)]) == [
        ("runs", 0), ("runs", 0)]


def test_keyword_repeat_chain_with_stemmer():
    """The reference's canonical chain: KeywordRepeat → stemmer →
    RemoveDuplicates indexes original + stem, collapsing identical
    pairs."""
    from lucene_solr_ray.analysis.filters import PorterStemFilter

    chain = [KeywordRepeatFilter(),
             PorterStemFilter(protected=set()),
             RemoveDuplicatesTokenFilter()]
    stream = [("running", 0)]
    # repeat → both copies stem identically → dedup leaves one
    for f in chain:
        stream = f.apply(stream)
    assert stream == [("run", 0)]


def test_hyphenated_words():
    f = HyphenatedWordsFilter()
    assert f.apply([("hyphen-", 0), ("ated", 1), ("word", 2)]) == [
        ("hyphenated", 0), ("word", 1)]
    assert terms(f.apply([("multi-", 0), ("part-", 1), ("word", 2)])) == [
        "multipartword"]


def test_common_grams():
    f = CommonGramsFilter({"the", "of"})
    out = f.apply([("the", 0), ("quick", 1), ("fox", 2), ("of", 3),
                   ("doom", 4)])
    # grams stack at the FIRST unigram's position (posIncr 0 after it),
    # matching the reference gramToken() (CommonGramsFilter.java:173)
    assert out == [("the", 0), ("the_quick", 0), ("quick", 1), ("fox", 2),
                   ("fox_of", 2), ("of", 3), ("of_doom", 3), ("doom", 4)]


def test_fingerprint():
    f = FingerprintFilter()
    assert f.apply([("b", 0), ("a", 1), ("b", 2)]) == [("a b", 0)]
    assert f.apply([]) == []
    assert FingerprintFilter(max_output_token_size=2).apply(
        [("abc", 0), ("def", 1)]) == []


def test_normalization_filter():
    f = NormalizationFilter("nfkc_cf")
    # ﬁ ligature decomposes, case folds
    assert terms(f.apply([("ﬁLE", 0)])) == ["file"]
    # combining sequence composes
    assert terms(f.apply([("é", 0)])) == ["é"]
    f2 = NormalizationFilter("nfc")
    assert terms(f2.apply([("É", 0)])) == ["É"]
    with pytest.raises(ValueError):
        NormalizationFilter("bogus")


def test_offset_safe_registration():
    from lucene_solr_ray.analysis.filters import CustomAnalyzer
    from lucene_solr_ray.analysis.lang import GermanLightStemFilter

    a = CustomAnalyzer([DecimalDigitFilter(), GermanLightStemFilter()])
    # must not raise: all chain members are offset-safe
    t, pos, starts, ends, n = a.analyze_with_offsets("häuser ١٢٣")
    assert t == ["haus", "123"]
    assert starts == [0, 7]


def test_classic_turkish_minimal_stem():
    from lucene_solr_ray.analysis.misc import (
        ClassicFilter,
        EnglishMinimalStemFilter,
        TurkishLowerCaseFilter,
    )

    cf = ClassicFilter()
    assert cf.apply([("Bill's", 0), ("I.B.M.", 1), ("U.S.A", 2),
                     ("dot.com", 3)]) == \
        [("Bill", 0), ("IBM", 1), ("USA", 2), ("dot.com", 3)]
    tf = TurkishLowerCaseFilter()
    out = tf.apply([("İstanbul", 0), ("DIYARBAKIR", 1),
                    ("İstanbul", 2)])
    assert out == [("istanbul", 0), ("dıyarbakır", 1),
                   ("istanbul", 2)]
    st = EnglishMinimalStemFilter.stem
    # EnglishMinimalStemmer.java exact rule
    assert st("cats") == "cat"
    assert st("ponies") == "ponie"
    assert st("glass") == "glass"
    assert st("focus") == "focus"
    assert st("ties") == "tie"
    assert st("is") == "is"
    assert st("abs") == "abs"


def test_delimited_term_frequency_and_limit_filters():
    """DelimitedTermFrequencyTokenFilter.java:35 + LimitTokenPosition /
    LimitTokenOffset factories (round 5)."""
    from lucene_solr_ray.analysis.filters import CustomAnalyzer
    from lucene_solr_ray.analysis.misc import (
        DelimitedTermFrequencyTokenFilter,
        LimitTokenOffsetFilter,
        LimitTokenPositionFilter,
    )
    from lucene_solr_ray.analysis.tokenizers import WhitespaceTokenizer

    a = CustomAnalyzer(tokenizer=WhitespaceTokenizer(),
                       filters=[DelimitedTermFrequencyTokenFilter()])
    # freq copies stack at ONE position; field length counts them
    terms, positions, n = a.analyze_with_positions("apple|3 banana")
    assert terms == ["apple", "apple", "apple", "banana"]
    assert positions == [0, 0, 0, 1] and n == 4
    # non-numeric suffix / plain terms pass through
    assert a.analyze("a|b c") == ["a|b", "c"]

    b = CustomAnalyzer(filters=[LimitTokenPositionFilter(2)])
    assert b.analyze("one two three four") == ["one", "two"]

    c = CustomAnalyzer(filters=[LimitTokenOffsetFilter(4)])
    # tokens starting at offset <= 4 survive ("two" starts at 4)
    assert c.analyze("one two three") == ["one", "two"]


def test_pattern_capture_group_filter():
    from lucene_solr_ray.analysis.misc import PatternCaptureGroupTokenFilter

    f = PatternCaptureGroupTokenFilter([r"([a-z]+)(\d+)"])
    assert f.apply([("abc123", 0), ("plain", 1)]) == [
        ("abc123", 0), ("abc", 0), ("123", 0), ("plain", 1)]
    g = PatternCaptureGroupTokenFilter([r"([a-z]+)"],
                                       preserve_original=False)
    assert g.apply([("ab12cd", 0)]) == [("ab", 0), ("cd", 0)]


def test_dictionary_compound_word_filter():
    """compound/DictionaryCompoundWordTokenFilter.java:75 — the
    donaudampfschiff fixture shape from the reference tests."""
    from lucene_solr_ray.analysis.misc import (
        DictionaryCompoundWordTokenFilter,
    )

    dic = ["dampf", "schiff", "fahrt", "donau"]
    f = DictionaryCompoundWordTokenFilter(dic)
    out = f.apply([("donaudampfschifffahrt", 0)])
    assert out == [("donaudampfschifffahrt", 0), ("donau", 0),
                   ("dampf", 0), ("schiff", 0), ("fahrt", 0)]
    # short tokens don't decompose; originals always survive
    assert f.apply([("bau", 1)]) == [("bau", 1)]
    # a dictionary word at min_word_size self-matches (the reference
    # emits the duplicate subword too; RemoveDuplicates cleans it)
    assert f.apply([("dampf", 1)]) == [("dampf", 1), ("dampf", 1)]
    # only_longest_match keeps one subword per start offset
    g = DictionaryCompoundWordTokenFilter(
        ["schiff", "schi"], min_word_size=5, only_longest_match=True)
    assert g.apply([("schiffe", 0)]) == [("schiffe", 0), ("schiff", 0)]
