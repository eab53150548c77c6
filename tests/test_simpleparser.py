"""SimpleQueryParser (reference ``queryparser/simple/
SimpleQueryParser.java:63``; vectors follow TestSimpleQueryParser's
shapes)."""

from lucene_solr_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_solr_ray.search.simpleparser import (
    PREFIX_OPERATOR,
    simple_parse,
)


def _bq(*pairs):
    return BooleanQuery(tuple(BooleanClause(q, o) for q, o in pairs))


def _not(q):
    return _bq((q, Occur.MUST_NOT), (MatchAllDocsQuery(), Occur.SHOULD))


def test_terms_and_operators():
    t = lambda s: TermQuery(s)
    assert simple_parse("foobar") == t("foobar")
    assert simple_parse("foo bar") == _bq(
        (t("foo"), Occur.SHOULD), (t("bar"), Occur.SHOULD))
    assert simple_parse("foo +bar") == _bq(
        (t("foo"), Occur.MUST), (t("bar"), Occur.MUST))
    assert simple_parse("foo | bar + baz") == _bq(
        (_bq((t("foo"), Occur.SHOULD), (t("bar"), Occur.SHOULD)),
         Occur.MUST),
        (t("baz"), Occur.MUST))
    # NOT wraps with a MatchAllDocs rescue clause; double NOT cancels
    assert simple_parse("-foo") == _not(t("foo"))
    assert simple_parse("--foo") == t("foo")
    assert simple_parse("foo -bar") == _bq(
        (t("foo"), Occur.SHOULD), (_not(t("bar")), Occur.SHOULD))


def test_phrase_prefix_fuzzy():
    assert simple_parse('"quick brown"') == PhraseQuery(
        ("quick", "brown"), (0, 1), 0)
    assert simple_parse('"quick brown"~2') == PhraseQuery(
        ("quick", "brown"), (0, 1), 2)
    assert simple_parse("foo*") == PrefixQuery("foo")
    assert simple_parse("FOO*") == PrefixQuery("foo")
    assert simple_parse("fox~1") == FuzzyQuery("fox", max_edits=1)
    # bare ~ = automatic fuzziness 2; out-of-range clamps; ~0 = plain term
    assert simple_parse("fox~") == FuzzyQuery("fox", max_edits=2)
    assert simple_parse("fox~9") == FuzzyQuery("fox", max_edits=2)
    assert simple_parse("fox~0") == TermQuery("fox")


def test_precedence_and_degradation():
    t = lambda s: TermQuery(s)
    assert simple_parse("(foo | bar) +baz") == _bq(
        (_bq((t("foo"), Occur.SHOULD), (t("bar"), Occur.SHOULD)),
         Occur.MUST),
        (t("baz"), Occur.MUST))
    # malformed input NEVER throws — it degrades
    assert simple_parse("foo )") == t("foo")
    assert simple_parse("( foo") == t("foo")
    assert simple_parse('"unclosed foo') == _bq(
        (t("unclosed"), Occur.SHOULD), (t("foo"), Occur.SHOULD))
    assert simple_parse("") == MatchNoDocsQuery()
    assert simple_parse("   ") == MatchNoDocsQuery()
    # "()" resets the pending operation
    assert simple_parse("foo | () bar") == _bq(
        (t("foo"), Occur.SHOULD), (t("bar"), Occur.SHOULD))


def test_flags_disable_operators():
    # with PREFIX disabled, the trailing * is ordinary text for the
    # analyzer (which drops it as punctuation)
    q = simple_parse("foo*", flags=-1 & ~PREFIX_OPERATOR)
    assert q == TermQuery("foo")


def test_default_operator_and_field():
    q = simple_parse("foo bar", default_operator=Occur.MUST)
    assert all(c.occur == Occur.MUST for c in q.clauses)
    f = simple_parse("foo", field="title")
    assert f == TermQuery("foo", field="title")


def test_end_to_end_search(ray_session, tmp_path):
    """simple_parse output drives the same search path as the classic
    parser."""
    import pandas as pd

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index

    src = tmp_path / "docs.parquet"
    pd.DataFrame({
        "doc_id": range(4),
        "text": ["quick brown fox", "lazy dog sleeps",
                 "quick red fox", "brown dog runs"],
    }).to_parquet(src)
    idx_dir = str(tmp_path / "idx")
    build_index(str(src), idx_dir, text_col="text", id_col="doc_id")
    idx = Index(idx_dir)
    q = simple_parse("quick +fox")
    out = idx.search_parsed([(0, q, 10)])
    assert sorted(out.column("doc_id").to_pylist()) == [0, 2]
    # NOT under the default OR matches (fox) OR (anything without red)
    # — the reference's documented MatchAll-rescue semantics; with AND
    # default the negation is effective
    nq = simple_parse("fox -red", default_operator=Occur.MUST)
    out2 = idx.search_parsed([(0, nq, 10)])
    assert sorted(out2.column("doc_id").to_pylist()) == [0]
