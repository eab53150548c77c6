"""ComplexPhraseQueryParser (reference ``queryparser/complexPhrase/
ComplexPhraseQueryParser.java:63``) — wildcard/fuzzy/alternation inside
phrases, matched with SpanNear semantics."""

import pandas as pd
import pytest


@pytest.fixture()
def idx(ray_session, tmp_path):
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index

    src = tmp_path / "docs.parquet"
    pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "john peters works here",          # 0
            "jonathan peterson works here",    # 1
            "jon peters sleeps",               # 2
            "peters john reversed",            # 3
            "john meets mary peters",          # 4
            "unrelated text entirely",         # 5
        ],
    }).to_parquet(src)
    idx_dir = str(tmp_path / "idx")
    build_index(str(src), idx_dir, text_col="text", id_col="doc_id")
    return Index(idx_dir)


def _hits(idx, q):
    out = idx.search_parsed([(0, q, 10)])
    return sorted(out.column("doc_id").to_pylist())


def test_wildcard_inside_phrase(idx):
    from lucene_solr_ray.search.complexphrase import complex_phrase_query

    # "john peter*" exact adjacency
    q = complex_phrase_query(idx, "john peter*")
    assert _hits(idx, q) == [0]
    # alternation group: (john jon jonathan) peter*
    q2 = complex_phrase_query(idx, "(john jon jonathan) peter*")
    assert _hits(idx, q2) == [0, 1, 2]
    # slop lets a gap in: "john peters"~2 matches the mary doc
    q3 = complex_phrase_query(idx, "john peters", slop=2)
    assert _hits(idx, q3) == [0, 4]
    # unordered + slop matches the reversed doc
    q4 = complex_phrase_query(idx, "john peters", slop=1, in_order=False)
    assert 3 in _hits(idx, q4)
    # fuzzy inside the phrase: jhn~1 → {john, jon} (1 edit each)
    q5 = complex_phrase_query(idx, "jhn~1 peters")
    assert _hits(idx, q5) == [0, 2]
    # a pattern matching nothing kills the phrase
    q6 = complex_phrase_query(idx, "zzz* peters")
    assert _hits(idx, q6) == []


def test_scores_are_positive_and_ranked(idx):
    from lucene_solr_ray.search.complexphrase import complex_phrase_query

    q = complex_phrase_query(idx, "(john jon) peter*")
    out = idx.search_parsed([(0, q, 10)])
    scores = out.column("score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
