"""CustomAnalyzer filter chain — factory semantics vs the reference's
analysis-common counterparts."""

import pytest

from lucene_solr_ray.analysis.filters import (
    ASCIIFoldingFilter,
    CustomAnalyzer,
    EdgeNGramFilter,
    LengthFilter,
    LowerCaseFilter,
    NGramFilter,
    PatternReplaceFilter,
    PorterStemFilter,
    ReverseStringFilter,
    ShingleFilter,
    StemmerOverrideFilter,
    StopFilter,
    SynonymFilter,
    TrimFilter,
    TruncateFilter,
)


def chain(*filters):
    return CustomAnalyzer(filters=list(filters))


def test_lowercase_stop_positions():
    a = chain(LowerCaseFilter(), StopFilter({"the"}))
    terms, pos, flen = a.analyze_with_positions("The Quick the Fox")
    assert terms == ["quick", "fox"]
    assert pos == [1, 3]  # stopword gaps preserved
    assert flen == 2


def test_synonym_expansion_same_position():
    a = chain(LowerCaseFilter(), SynonymFilter({"fast": ["quick", "speedy"]}))
    terms, pos, _ = a.analyze_with_positions("fast car")
    assert terms == ["fast", "quick", "speedy", "car"]
    assert pos == [0, 0, 0, 1]  # synonyms stack at the original position


def test_shingles():
    a = chain(LowerCaseFilter(), ShingleFilter(2, 3))
    terms = a.analyze("a b c d")
    assert "a b" in terms and "b c d" in terms and "a" in terms
    b = chain(LowerCaseFilter(), ShingleFilter(2, 2, output_unigrams=False))
    assert b.analyze("a b c") == ["a b", "b c"]


def test_ngrams_and_edge():
    a = chain(LowerCaseFilter(), NGramFilter(2, 2))
    assert a.analyze("abc") == ["ab", "bc"]
    e = chain(LowerCaseFilter(), EdgeNGramFilter(1, 3))
    assert e.analyze("abcd") == ["a", "ab", "abc"]


def test_folding_trim_length_truncate_reverse_pattern():
    assert chain(ASCIIFoldingFilter()).analyze("Café résumé") \
        == ["Cafe", "resume"]
    assert chain(LengthFilter(2, 3)).analyze("a ab abc abcd") == ["ab", "abc"]
    assert chain(TruncateFilter(3)).analyze("abcdef ab") == ["abc", "ab"]
    assert chain(ReverseStringFilter()).analyze("abc") == ["cba"]
    assert chain(PatternReplaceFilter(r"\d+", "")).analyze("ab1 23 c4d") \
        == ["ab", "cd"]
    assert chain(TrimFilter()).analyze("ab") == ["ab"]


def test_stemmer_override_then_porter():
    a = chain(
        LowerCaseFilter(),
        StemmerOverrideFilter({"running": "sprint"}),
        PorterStemFilter(protected={"meetings"}),
    )
    # override wins, protection holds, everything else stems
    assert a.analyze("Running meetings jumps") == ["sprint", "meetings", "jump"]


def test_custom_analyzer_in_index(ray_session, tmp_path):
    """A synonym+shingle chain indexed end-to-end: synonym-only queries
    match, shingle terms exist in the dictionary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.reader import SegmentReader
    from lucene_solr_ray.search.searcher import Index

    a = chain(
        LowerCaseFilter(),
        SynonymFilter({"fast": ["quick"]}),
        ShingleFilter(2, 2),
    )
    texts = ["fast merge path", "slow scan route"]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(texts)}), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id", analyzer=a)
    idx = Index(out)
    hits = idx.search({0: "quick"}, k=10, analyzer=a).to_pandas()
    assert list(hits.doc_id) == [0]
    import os

    r = SegmentReader(os.path.join(out, "seg_000000"))
    assert "fast merge" in r.terms  # shingle in the dictionary


def test_normalize_uses_char_filters_only():
    a = chain(LowerCaseFilter(), ASCIIFoldingFilter(), PorterStemFilter())
    assert a.normalize("Cafés") == "cafes"  # folded+lowered, NOT stemmed


def test_custom_analyzer_offsets_through_safe_filters():
    a = chain(LowerCaseFilter(), StopFilter({"the"}), PorterStemFilter())
    text = "The Running Dogs"
    terms, pos, starts, ends, flen = a.analyze_with_offsets(text)
    assert terms == ["run", "dog"]
    assert pos == [1, 2]
    # offsets point at the ORIGINAL surface forms
    assert [text[s:e] for s, e in zip(starts, ends)] == ["Running", "Dogs"]
    assert flen == 2


def test_custom_analyzer_offsets_reject_graph_filters():
    a = chain(LowerCaseFilter(), ShingleFilter(2, 2))
    with pytest.raises(NotImplementedError, match="ShingleFilter"):
        a.analyze_with_offsets("a b c")


def test_parse_solr_synonyms():
    """SolrSynonymParser.java:49 — the synonyms.txt format; paired with
    keep_original=False for exact reference emission."""
    from lucene_solr_ray.analysis.filters import (
        CustomAnalyzer,
        LowerCaseFilter,
        SynonymGraphFilter,
        parse_solr_synonyms,
    )

    txt = (
        "# comment\n"
        "couch, sofa, divan\n"
        "small => tiny, teeny\n"
        "new york, big apple => nyc\n"
        "foo\\,bar => baz\n"
    )
    rules = parse_solr_synonyms(txt)
    assert rules["couch"] == ["couch", "sofa", "divan"]  # incl. self
    assert rules["small"] == ["tiny", "teeny"]
    assert rules["new york"] == ["nyc"] and rules["big apple"] == ["nyc"]
    assert rules["foo,bar"] == ["baz"]
    a = CustomAnalyzer(filters=[
        LowerCaseFilter(),
        SynonymGraphFilter(rules, keep_original=False),
    ])
    # equivalence keeps the original via its self-mapping; explicit
    # mapping consumes it; multi-word LHS collapses to the replacement
    assert a.analyze("the sofa is small") == [
        "the", "couch", "sofa", "divan", "is", "tiny", "teeny"]
    assert a.analyze("big apple tours") == ["nyc", "tours"]
    # expand=False: everything maps to the first entry
    nrules = parse_solr_synonyms("couch, sofa, divan", expand=False)
    assert nrules == {"couch": ["couch"], "sofa": ["couch"],
                      "divan": ["couch"]}


def test_parse_wordnet_synonyms_and_elevate_xml():
    from lucene_solr_ray.analysis.filters import (
        parse_elevate_xml,
        parse_wordnet_synonyms,
    )

    wn = (
        "s(100001740,1,'entity',n,1,11).\n"
        "s(100001740,2,'thing',n,1,0).\n"
        "s(100002137,1,'it''s',n,1,0).\n"      # quote escape, singleton
        "s(100002452,1,'object',n,1,0).\n"
        "s(100002452,2,'item',n,1,0).\n"
    )
    rules = parse_wordnet_synonyms(wn)
    assert rules["entity"] == ["entity", "thing"]
    assert rules["item"] == ["object", "item"]
    assert "it's" not in rules  # singleton synsets produce no rule

    elev = parse_elevate_xml(
        "<elevate>"
        '<query text="aaa"><doc id="7"/></query>'
        '<query text="bbb"><doc id="5"/><doc id="6" exclude="true"/>'
        "</query></elevate>"
    )
    assert elev == {"aaa": {"elevate": [7], "exclude": []},
                    "bbb": {"elevate": [5], "exclude": [6]}}


def test_parse_wordlist_and_mapping_rules():
    from lucene_solr_ray.analysis.charfilter import MappingCharFilter
    from lucene_solr_ray.analysis.filters import (
        parse_mapping_rules,
        parse_wordlist,
    )

    assert parse_wordlist("# c\nthe\n a \n\nof\n") == {"the", "a", "of"}
    assert parse_wordlist("the a | article\nof | prep\n",
                          snowball=True) == {"the", "a", "of"}
    rules = parse_mapping_rules(
        '"á" => "a"\n'
        '"\\"" => "\'"\n'
        '"\\u00df" => "ss"\n'
        "# comment\n"
        '"c\\td" => "cd"\n'
    )
    assert rules == [("á", "a"), ('"', "'"), ("ß", "ss"), ("c\td", "cd")]
    cf = MappingCharFilter(rules)
    out, omap = cf.apply('groß "á"')
    assert out == "gross 'a'"
