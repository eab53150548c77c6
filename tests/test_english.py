"""EnglishAnalyzer conformance — Porter (1980) fixtures + possessive/stop
chain semantics (reference ``analysis/en/EnglishAnalyzer.java:41``,
``EnglishPossessiveFilter.java:40``, ``PorterStemmer.java``)."""

from lucene_solr_ray.analysis.en import (
    EnglishAnalyzer,
    porter_stem,
    strip_possessive,
)

# (word, stem) pairs derived from the rule examples in M.F. Porter,
# "An algorithm for suffix stripping" (1980), run through the FULL
# algorithm (later steps may strip further than the single-rule example:
# differentli -> [step2] different -> [step4] differ)
PORTER_FIXTURES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_fixtures():
    bad = {
        w: (porter_stem(w), want)
        for w, want in PORTER_FIXTURES.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_porter_short_words_unchanged():
    for w in ("a", "is", "be", "on", "by"):
        assert porter_stem(w) == w


def test_possessive_filter():
    assert strip_possessive("John's") == "John"
    assert strip_possessive("Fred’s") == "Fred"
    assert strip_possessive("its") == "its"  # no apostrophe
    assert strip_possessive("'s") == ""


def test_english_analyzer_chain():
    a = EnglishAnalyzer()
    # possessive before lowercase, stop after lowercase, stem last
    assert a.analyze("The Manager's meetings") == ["manag", "meet"]
    # stopwords leave position gaps
    terms, pos, flen = a.analyze_with_positions("the cats and the dogs")
    assert terms == ["cat", "dog"]
    assert pos == [1, 4]
    assert flen == 2
    # stem exclusions
    a2 = EnglishAnalyzer(stem_exclusions={"meetings"})
    assert a2.analyze("meetings") == ["meetings"]
    # normalize (multi-term queries) lowercases but does NOT stem
    assert a.normalize("Meetings") == "meetings"


def test_english_analyzer_spec_roundtrip():
    from lucene_solr_ray.analysis.analyzer import analyzer_from_spec

    a = EnglishAnalyzer()
    b = analyzer_from_spec(a.spec())
    assert isinstance(b, EnglishAnalyzer)
    assert b.analyze("running quickly") == a.analyze("running quickly")


def test_english_index_search(ray_session, tmp_path):
    """Index with EnglishAnalyzer: morphological variants collapse to one
    term, queries analyze the same way, per-query recall follows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index

    texts = [
        "the manager was running the meetings",
        "managers run a meeting",
        "nothing related here at all",
    ]
    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)}), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id",
                analyzer=EnglishAnalyzer())
    idx = Index(out)
    # the manifest records the analyzer; make_parser reuses it
    hits = idx.search({0: "meeting", 1: "managers", 2: "ran OR runs"},
                      k=10).to_pandas()
    assert sorted(hits[hits.qid == 0].doc_id) == [0, 1]
    assert sorted(hits[hits.qid == 1].doc_id) == [0, 1]
    # "runs" stems to "run": doc1 matches; "running" stems to "run" too
    assert 1 in set(hits[hits.qid == 2].doc_id)
