"""Intervals algebra parity tests.

Golden expectations transcribed from the reference's
``lucene/sandbox/src/test/org/apache/lucene/search/intervals/
TestIntervals.java`` (docs tokenized with a stopword-free
StandardAnalyzer, exactly as its setupIndex does) — our eager
evaluators must emit the same interval streams the reference's lazy
iterators produce.
"""

import numpy as np
import pytest

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
from lucene_solr_ray.search.intervals import Intervals

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine days old.  Some like it hot, some like it cold, some like it "
    "in the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot "
    "twelve days old.  Some like it cold, some like it hot, some like it "
    "in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
]

FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "Down to a sunless sea",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "Pease porridge porridge hot",
]

_AN = StandardAnalyzer(stop_words=())


def _posmaps(docs):
    out = []
    for text in docs:
        pm = {}
        terms, positions, _ = _AN.analyze_with_positions(text)
        for term, pos in zip(terms, positions):
            pm.setdefault(term, []).append(pos)
        out.append({t: np.asarray(p) for t, p in pm.items()})
    return out

POS1 = _posmaps(FIELD1)
POS2 = _posmaps(FIELD2)


def _check(source, posmaps, expected):
    """expected: per doc, flattened [s0, e0, s1, e1, ...]."""
    for pm, exp in zip(posmaps, expected):
        got = source.eval(pm)
        flat = [x for iv in got for x in iv]
        assert flat == exp, (got, exp)


def test_term_intervals():
    _check(Intervals.term("porridge"), POS1, [
        [], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [],
        [1, 1, 4, 4, 7, 7], [0, 0],
    ])


def test_ordered_near_intervals():
    _check(Intervals.ordered("pease", "hot"), POS1, [
        [], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], [],
    ])


def test_phrase_intervals():
    _check(Intervals.phrase("pease", "porridge"), POS1, [
        [], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [],
        [0, 1, 3, 4, 6, 7], [],
    ])


def test_unordered_near_intervals():
    _check(Intervals.unordered("pease", "hot"), POS1, [
        [], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7],
        [0, 2, 2, 3, 6, 17], [],
    ])


def test_interval_disjunction():
    _check(
        Intervals.or_("pease", "hot", "notmatching"), POS1, [
            [], [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
            [0, 0, 3, 3, 5, 5, 6, 6, 21, 21], [3, 3, 7, 7],
            [0, 0, 2, 2, 3, 3, 6, 6, 17, 17], [],
        ])


def test_nesting():
    _check(
        Intervals.unordered(
            "pease", "porridge", Intervals.or_("hot", "cold")
        ),
        POS1,
        [
            [], [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17],
            [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17], [],
            [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17], [],
        ])


def test_nesting2():
    _check(
        Intervals.unordered(
            Intervals.ordered("like", "it", "cold"),
            Intervals.term("pease"),
        ),
        POS1,
        [[], [6, 21], [6, 17], [], [], []],
    )


def test_unordered_distinct():
    _check(
        Intervals.unordered("pease", "pease", allow_overlaps=False),
        POS1,
        [[], [0, 3, 3, 6], [0, 3, 3, 6], [], [0, 3, 3, 6], []],
    )
    src = Intervals.unordered(
        Intervals.unordered("pease", "porridge", "hot"),
        Intervals.term("porridge"),
        allow_overlaps=False,
    )
    _check(src, POS1, [
        [], [1, 4, 4, 17], [1, 5, 4, 7], [], [1, 4, 4, 17], [],
    ])
    _check(src, POS2, [[], [], [], [], [0, 3], []])


def test_maxwidth_and_filters():
    # maxwidth drops wide intervals, keeps narrow ones
    src = Intervals.maxwidth(3, Intervals.ordered("pease", "hot"))
    got = src.eval(POS1[1])
    assert got == [(0, 2)]
    # containing: unordered(pease, hot) windows containing 'porridge'
    c = Intervals.containing(
        Intervals.unordered("pease", "hot"), Intervals.term("porridge")
    )
    got = c.eval(POS1[1])  # windows (0,2),(2,3),(6,17); porridge at 1,4,7
    assert got == [(0, 2), (6, 17)]
    # contained_by: 'porridge' occurrences inside those windows
    cb = Intervals.contained_by(
        Intervals.term("porridge"), Intervals.unordered("pease", "hot")
    )
    got = cb.eval(POS1[1])
    assert got == [(1, 1), (7, 7)]


def test_not_filters():
    # non_overlapping: pease occurrences not overlapping 'porridge'
    # (they never overlap — all pease kept)
    src = Intervals.non_overlapping(
        Intervals.term("pease"), Intervals.term("porridge")
    )
    assert src.eval(POS1[1]) == [(0, 0), (3, 3), (6, 6)]
    # not_within: pease occurrences with no 'hot' within 1 position
    nw = Intervals.not_within(
        Intervals.term("pease"), 1, Intervals.term("hot")
    )
    # pease at 0,3,6; hot at 2,17 → pease@3 is within 1 of hot@2
    assert nw.eval(POS1[1]) == [(0, 0), (6, 6)]
    # not_containing: ordered(pease, porridge) chains not containing hot
    nc = Intervals.not_containing(
        Intervals.ordered("pease", "porridge"), Intervals.term("hot")
    )
    got = nc.eval(POS1[1])
    assert (0, 1) in got and (3, 4) in got


def test_interval_query_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import IntervalQuery
    from lucene_solr_ray.search.searcher import Index

    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(FIELD1)), pa.int64()),
            "text": pa.array([t.lower() for t in FIELD1]),
        }), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id")
    idx = Index(out)
    q = IntervalQuery(Intervals.ordered("pease", "hot"))
    res = idx.search_parsed([(0, q, 10)])
    # docs 1, 2, 4 match (golden above); freq identical for 1 and 4
    assert sorted(res.column("doc_id").to_pylist()) == [1, 2, 4]
    # freq = 1/3 + 1/12 for docs 1,4; doc2 = 1/3 + 1/16... scores > 0
    assert all(s > 0 for s in res.column("score").to_pylist())


def test_subtractive_sources_load_subtrahend_positions(ray_session, tmp_path):
    """Regression: not_containing / non_overlapping / not_within must read
    the subtrahend's positions in the FULL query path (leaves() excludes
    them from scoring, position_terms() must not)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import IntervalQuery
    from lucene_solr_ray.search.searcher import Index

    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta gamma", "alpha gamma", "beta alpha gamma",
        ]),
    }), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id")
    idx = Index(out)

    def docs(src):
        t = idx.search_parsed([(0, IntervalQuery(src), 10)])
        return sorted(t.column("doc_id").to_pylist())

    assert docs(Intervals.not_containing(
        Intervals.ordered("alpha", "gamma"), Intervals.term("beta")
    )) == [1, 2]
    assert docs(Intervals.non_overlapping(
        Intervals.term("alpha"), Intervals.phrase("alpha", "beta")
    )) == [1, 2]
    assert docs(Intervals.not_within(
        Intervals.term("gamma"), 1, Intervals.term("beta")
    )) == [1, 2]


def test_before_after_maxgaps():
    pos = {
        "a": [0, 10], "b": [5], "c": [2, 12],
    }
    # before: a-intervals ending before some b start
    src = Intervals.before(Intervals.term("a"), Intervals.term("b"))
    assert src.eval(pos) == [(0, 0)]
    src2 = Intervals.after(Intervals.term("a"), Intervals.term("b"))
    assert src2.eval(pos) == [(10, 10)]
    # maxgaps over ordered(a, c): candidates (0,2) gap 1, (10,12) gap 1
    ordered = Intervals.ordered("a", "c")
    assert Intervals.maxgaps(0, ordered).eval(pos) == []
    assert Intervals.maxgaps(1, ordered).eval(pos) == [(0, 2), (10, 12)]
    # min_positions: or takes min, combis sum
    assert Intervals.ordered(
        "a", Intervals.or_("b", Intervals.phrase("b", "c"))
    ).min_positions() == 2
