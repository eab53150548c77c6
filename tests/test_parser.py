"""Classic query-parser subset — clause semantics per QueryParserBase."""

import pytest

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
from lucene_solr_ray.search.parser import ParseError, parse
from lucene_solr_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def occurs(q):
    assert isinstance(q, BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_single_term():
    assert parse("Merge") == TermQuery("merge")  # analyzed (lowercased)


def test_default_operator_or():
    q = parse("a b")
    assert [o for o, _ in occurs(q)] == [Occur.SHOULD, Occur.SHOULD]


def test_and_promotes_previous():
    q = parse("a AND b")
    assert [o for o, _ in occurs(q)] == [Occur.MUST, Occur.MUST]
    q = parse("a b AND c")  # only b is promoted (addClause semantics)
    assert [o for o, _ in occurs(q)] == [
        Occur.SHOULD, Occur.MUST, Occur.MUST,
    ]


def test_or_keeps_should():
    q = parse("a OR b OR c")
    assert [o for o, _ in occurs(q)] == [Occur.SHOULD] * 3


def test_not_and_minus():
    q = parse("a -b")
    assert occurs(q)[1][0] == Occur.MUST_NOT
    q = parse("a NOT b")
    assert occurs(q)[1][0] == Occur.MUST_NOT


def test_plus_required():
    q = parse("+a b")
    assert [o for o, _ in occurs(q)] == [Occur.MUST, Occur.SHOULD]


def test_parens_nested():
    q = parse("(a OR b) AND c")
    (o1, sub), (o2, c) = occurs(q)
    assert o1 == Occur.MUST and o2 == Occur.MUST
    assert isinstance(sub, BooleanQuery) and c == TermQuery("c")


def test_phrase_with_slop():
    q = parse('"Quick Fox"~2')
    assert q == PhraseQuery(("quick", "fox"), (0, 1), 2)


def test_single_word_phrase_is_term():
    assert parse('"hello"') == TermQuery("hello")


def test_boost():
    q = parse("a^2.5")
    assert q == BoostQuery(TermQuery("a"), 2.5)


def test_field_prefix_dropped():
    assert parse("content:merge") == TermQuery("merge")


def test_wildcards_prefix_fuzzy_regexp_range():
    assert parse("foo*") == WildcardQuery("foo*")
    assert parse("f?o") == WildcardQuery("f?o")
    assert parse("merge~1") == FuzzyQuery("merge", max_edits=1)
    assert parse("/me.ge/") == RegexpQuery("me.ge")
    assert parse("[alpha TO beta]") == TermRangeQuery("alpha", "beta", True, True)
    assert parse("{alpha TO beta}") == TermRangeQuery("alpha", "beta", False, False)


def test_match_all():
    assert parse("*:*") == MatchAllDocsQuery()


def test_stopword_only_drops_to_matchnone():
    a = StandardAnalyzer(stop_words={"the"})
    assert isinstance(parse("the", a), MatchNoDocsQuery)


def test_parse_errors():
    with pytest.raises(ParseError):
        parse('"unclosed')
    with pytest.raises(ParseError):
        parse("a^^2")


def test_max_clause_count():
    from lucene_solr_ray.search.query import BooleanClause

    with pytest.raises(ValueError):
        BooleanQuery(
            tuple(
                BooleanClause(TermQuery(f"t{i}"), Occur.SHOULD)
                for i in range(1025)
            )
        )


def test_midword_hyphen_is_term_text():
    """'foo-bar' must NOT become foo NOT bar (review finding): it is one
    term which the analyzer splits into a SHOULD disjunction."""
    q = parse("foo-bar")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    assert [c.query for c in q.clauses] == [TermQuery("foo"), TermQuery("bar")]
    # leading '-' still negates
    q2 = parse("a -b")
    assert [c.occur for c in q2.clauses] == [Occur.SHOULD, Occur.MUST_NOT]


def test_group_boost():
    q = parse("(a b)^2")
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    assert isinstance(q.query, BooleanQuery)
    q2 = parse("(a OR b)^1.5 AND c")
    occ = [(c.occur, type(c.query).__name__) for c in q2.clauses]
    assert occ[0] == (Occur.MUST, "BoostQuery")


# -- field-scoped atoms + per-field analyzers (round-2 fixes) ---------------


def test_field_scoped_range_and_regexp():
    from lucene_solr_ray.search.parser import QueryParser

    p = QueryParser(fields={"lang"})
    q = p.parse("lang:[aa TO bb]")
    assert q == TermRangeQuery("aa", "bb", True, True, field="lang")
    q = p.parse("lang:{aa TO bb}")
    assert q == TermRangeQuery("aa", "bb", False, False, field="lang")
    q = p.parse("lang:/e.*/")
    assert q == RegexpQuery("e.*", field="lang")


def test_field_scoped_phrase():
    from lucene_solr_ray.search.parser import QueryParser

    p = QueryParser(fields={"title"})
    q = p.parse('title:"foo bar"')
    assert isinstance(q, PhraseQuery) and q.field == "title"
    assert q.phrase_terms == ("foo", "bar")


def test_field_analyzer_keyword_not_split():
    """brand:Brand#2 with a KeywordAnalyzer field must stay ONE
    case-preserved token (PerFieldAnalyzerWrapper semantics)."""
    from lucene_solr_ray.analysis.analyzer import KeywordAnalyzer
    from lucene_solr_ray.search.parser import QueryParser

    p = QueryParser(
        fields={"brand"}, field_analyzers={"brand": KeywordAnalyzer()}
    )
    assert p.parse("brand:Brand#2") == TermQuery("Brand#2", field="brand")
    # fuzzy / wildcard on a keyword field keep case (normalize() is identity)
    assert p.parse("brand:Brand*") == WildcardQuery("Brand*", field="brand")
    f = p.parse("brand:Brand~1")
    assert f == FuzzyQuery("Brand", max_edits=1, field="brand")
    # range bounds keep case too
    r = p.parse("brand:[Brand#1 TO Brand#3]")
    assert r == TermRangeQuery("Brand#1", "Brand#3", True, True, field="brand")


def test_numeric_field_range_parses_to_point_range():
    from lucene_solr_ray.search.parser import QueryParser
    from lucene_solr_ray.search.query import PointRangeQuery

    p = QueryParser(numeric_fields={"size": "int64"})
    q = p.parse("size:[10 TO 20]")
    assert q == PointRangeQuery("size", 10, 20, True, True)
    q = p.parse("size:{* TO 20}")
    assert q == PointRangeQuery("size", None, 20, False, False)


def test_dismax_parse():
    from lucene_solr_ray.analysis.analyzer import KeywordAnalyzer
    from lucene_solr_ray.search.parser import dismax_parse
    from lucene_solr_ray.search.query import (
        BooleanQuery as BQ,
        BoostQuery as BoQ,
        DisjunctionMaxQuery as DMQ,
        Occur as Oc,
        TermQuery as TQ,
    )

    q = dismax_parse(
        "merge +fast -Broken",
        qf={"_default_": 1.0, "title": 2.0},
        field_analyzers={"title": KeywordAnalyzer(lowercase_value=True)},
        tie=0.1,
        mm=1,
    )
    assert isinstance(q, BQ) and q.minimum_should_match == 1
    occ = [c.occur for c in q.clauses]
    assert occ == [Oc.SHOULD, Oc.MUST, Oc.MUST_NOT]
    d0 = q.clauses[0].query
    assert isinstance(d0, DMQ) and d0.tie_breaker == 0.1
    assert d0.disjuncts[0] == TQ("merge")
    assert isinstance(d0.disjuncts[1], BoQ)
    assert d0.disjuncts[1].query == TQ("merge", field="title")
    assert d0.disjuncts[1].boost == 2.0
