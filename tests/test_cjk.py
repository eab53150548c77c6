"""CJK analysis (``analysis/cjk.py``) vs the reference's
``TestCJKBigramFilter`` / ``TestCJKAnalyzer`` / ``TestCJKWidthFilter``
vectors (``lucene/analysis/common/src/test/.../cjk/``)."""

import pytest

from lucene_solr_ray.analysis.cjk import (
    CJKAnalyzer,
    CJKBigramFilter,
    CJKWidthFilter,
)
from lucene_solr_ray.analysis.tokenizer import tokenize


def _stream(text):
    return [(t, i) for i, t in enumerate(tokenize(text))]


def test_bigram_all_scripts_japanese():
    # TestCJKBigramFilter.testAllScripts
    out = [t for t, _ in CJKBigramFilter().apply(_stream("多くの学生が試験に落ちた"))]
    assert out == ["多く", "くの", "の学", "学生", "生が",
                   "が試", "試験", "験に", "に落", "落ち", "ちた"]


def test_bigram_han_only():
    # TestCJKBigramFilter.testHanOnly: disabled scripts pass through as
    # unigrams and act as bigram boundaries
    f = CJKBigramFilter(hiragana=False, katakana=False, hangul=False)
    out = [t for t, _ in f.apply(_stream("多くの学生が試験に落ちた"))]
    assert out == ["多", "く", "の", "学生", "が", "試験",
                   "に", "落", "ち", "た"]


def test_bigram_unigram_stacking():
    # double-indexing mode: ABC -> A AB B BC C with bigrams stacked at
    # the position of their first char
    out = CJKBigramFilter(output_unigrams=True).apply(_stream("多くの"))
    assert out == [("多", 0), ("多く", 0), ("く", 1), ("くの", 1), ("の", 2)]


def test_bigram_katakana_run_internal():
    out = [t for t, _ in CJKBigramFilter().apply([("テキスト", 0)])]
    assert out == ["テキ", "キス", "スト"]


def test_bigram_lone_char_unigram():
    # a lone CJK char flanked by non-CJK stays a unigram (<SINGLE>)
    out = [t for t, _ in CJKBigramFilter().apply(_stream("abc 中 def"))]
    assert out == ["abc", "中", "def"]


def test_analyzer_korean_no_cross_space():
    # TestCJKAnalyzer: offsets gate joins — bigram within each word only
    assert CJKAnalyzer().analyze("안녕하세요 한글입니다") == [
        "안녕", "녕하", "하세", "세요", "한글", "글입", "입니", "니다"]


def test_analyzer_contiguous_han_katakana_joins():
    # offset-contiguous tokens of different CJK scripts join
    assert CJKAnalyzer().analyze("全テキスト") == ["全テ", "テキ", "キス", "スト"]


def test_analyzer_spaced_han_does_not_join():
    assert CJKAnalyzer().analyze("学 生") == ["学", "生"]


def test_analyzer_english_stopwords_and_lowercase():
    assert CJKAnalyzer().analyze("the Quick 中文 test") == [
        "quick", "中文", "test"]


def test_width_fullwidth_ascii():
    # TestCJKWidthFilter: fullwidth ASCII variants fold to halfwidth
    out = CJKWidthFilter().apply([("Ｔｅｓｔ", 0), ("１２３４", 1)])
    assert out == [("Test", 0), ("1234", 1)]


def test_width_halfwidth_katakana_and_voicing():
    # halfwidth katakana to fullwidth, composing dakuten: ﾊ + ﾞ -> バ
    out = CJKWidthFilter().apply([("ｶﾀｶﾅ", 0), ("ﾊﾞﾅﾅ", 1), ("ﾊﾟﾝ", 2)])
    assert out == [("カタカナ", 0), ("バナナ", 1), ("パン", 2)]


def test_heuristic_path_without_offsets():
    # standalone apply (no spans): multi-char runs bigram internally,
    # never across tokens; consecutive single chars join
    f = CJKBigramFilter()
    out = [t for t, _ in f.apply(_stream("한국어 텍스트"))]
    assert out == ["한국", "국어", "텍스", "스트"]
    out = [t for t, _ in f.apply(_stream("中文分析"))]
    assert out == ["中文", "文分", "分析"]


def test_term_freqs_end_to_end():
    tf = CJKAnalyzer().term_freqs("日本語の日本語")
    # 日本 occurs twice (positions 0 and 4 of the bigram stream)
    assert tf["日本"] == 2 and tf["本語"] == 2 and tf["語の"] == 1
