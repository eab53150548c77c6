"""Declarative analyzer assembly (Solr fieldType config →
CustomAnalyzer; factory names per the reference *Factory classes)."""

import pytest

from lucene_solr_ray.analysis.config import custom_analyzer_from_config


def test_basic_chain():
    a = custom_analyzer_from_config({
        "tokenizer": {"class": "solr.WhitespaceTokenizerFactory"},
        "filters": [
            {"class": "solr.LowerCaseFilterFactory"},
            {"class": "solr.StopFilterFactory",
             "words": ["the", "a"]},
        ],
    })
    assert a.analyze("The Quick-Brown FOX") == ["quick-brown", "fox"]


def test_file_loading_and_formats(tmp_path):
    (tmp_path / "stop.txt").write_text("# c\nthe\nof\n")
    (tmp_path / "syn.txt").write_text("couch, sofa\nsmall => tiny\n")
    (tmp_path / "map.txt").write_text('"\\u00df" => "ss"\n')

    def loader(name):
        return (tmp_path / name).read_text()

    a = custom_analyzer_from_config({
        "charFilters": [
            {"class": "solr.MappingCharFilterFactory",
             "mapping": "map.txt"},
        ],
        "tokenizer": {"class": "solr.StandardTokenizerFactory"},
        "filters": [
            {"class": "solr.LowerCaseFilterFactory"},
            {"class": "solr.StopFilterFactory", "words": "stop.txt"},
            {"class": "solr.SynonymGraphFilterFactory",
             "synonyms": "syn.txt", "keepOriginal": "false"},
            {"class": "solr.SnowballPorterFilterFactory",
             "language": "English"},
        ],
    }, loader=loader)
    # groß → gross (charfilter), stopwords drop, synonyms expand, stem
    assert a.analyze("the groß sofa of small things") == [
        "gross", "couch", "sofa", "tini", "thing"]


def test_tokenizer_variants_and_errors():
    ph = custom_analyzer_from_config({
        "tokenizer": {"class": "solr.PathHierarchyTokenizerFactory",
                      "delimiter": "/"},
    })
    assert ph.analyze("/a/b") == ["/a", "/a/b"]
    ng = custom_analyzer_from_config({
        "tokenizer": {"class": "solr.NGramTokenizerFactory",
                      "minGramSize": "2", "maxGramSize": "2"},
    })
    assert ng.analyze("abc") == ["ab", "bc"]
    with pytest.raises(KeyError):
        custom_analyzer_from_config(
            {"tokenizer": {"class": "solr.NoSuchTokenizerFactory"}})
    with pytest.raises(KeyError):
        custom_analyzer_from_config(
            {"filters": [{"class": "solr.NoSuchFilterFactory"}]})


def test_default_tokenizer_is_standard():
    a = custom_analyzer_from_config({
        "filters": [{"class": "solr.LowerCaseFilterFactory"}],
    })
    # standard UAX#29: punctuation splits, "don't" keeps the apostrophe
    assert a.analyze("Don't stop-me") == ["don't", "stop", "me"]
