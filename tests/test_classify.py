"""Classifier tests: SimpleNaiveBayes (distributed counts vs a local
re-derivation) and BM25NB (engine-scored, vs per-query manual searches).

Reference semantics:
  lucene/classification/src/java/org/apache/lucene/classification/
    SimpleNaiveBayesClassifier.java:135-268  (add-1 smoothing, avg unique
    terms denominator)
  lucene/classification/src/java/org/apache/lucene/classification/
    BM25NBClassifier.java:129-232  (log top-1 BM25 scores, logsumexp norm)
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_ray.functions.classify import (
    bm25nb_classify,
    naive_bayes_classify,
)

DOCS = [
    (0, "spam buy cheap pills now", "spam"),
    (1, "cheap pills cheap deals spam offer", "spam"),
    (2, "meeting agenda for the quarterly review", "ham"),
    (3, "please review the attached agenda", "ham"),
    (4, "buy now limited offer pills", "spam"),
    (5, "quarterly earnings review meeting notes", "ham"),
]


def _nb_local(inputs):
    """Straight-line reimplementation of the reference formula."""
    classes = {}
    for _, txt, c in DOCS:
        classes[c] = classes.get(c, 0) + 1
    n_docs = sum(classes.values())
    sum_uniq = sum(len(set(t.split())) for _, t, _ in DOCS)
    avg_uniq = sum_uniq / n_docs
    hits = {}
    for _, txt, c in DOCS:
        for w in set(txt.split()):
            hits[(w, c)] = hits.get((w, c), 0) + 1
    out = {}
    for iid, txt in inputs:
        for c, df_c in classes.items():
            prior = math.log(df_c / n_docs)
            den = avg_uniq * df_c + n_docs
            ll = sum(
                math.log((hits.get((w, c), 0) + 1) / den)
                for w in txt.split()
            )
            out[(iid, c)] = round(prior + ll, 6)
    return out


def test_naive_bayes_matches_local_reference(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t, "cls": c} for i, t, c in DOCS]
    )
    inputs = [(100, "cheap pills offer"), (101, "quarterly review agenda")]
    got = naive_bayes_classify(ds, "text", "cls", inputs)
    want = _nb_local(inputs)
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert row["log_score"] == pytest.approx(
            want[(row["input_id"], row["label"])], abs=1e-6
        )
    # the spam-looking input must rank spam first
    spam_rows = got[got["input_id"] == 100].set_index("label")["log_score"]
    assert spam_rows["spam"] > spam_rows["ham"]
    ham_rows = got[got["input_id"] == 101].set_index("label")["log_score"]
    assert ham_rows["ham"] > ham_rows["spam"]


def test_bm25nb_matches_manual_searches(ray_session, sf_dir):
    from lucene_solr_ray.pipelines.fulltext import documents_index_mf
    from lucene_solr_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )

    idx = documents_index_mf(sf_dir)
    text = "merge segment policy"
    classes = ["en", "de", "fr"]
    got = bm25nb_classify(idx, text, "lang", classes, text_field=None)

    # probabilities: a distribution, sorted desc
    probs = [p for _, p in got]
    assert sum(probs) == pytest.approx(1.0, abs=1e-9)
    assert probs == sorted(probs, reverse=True)
    assert {c for c, _ in got} == set(classes)

    # manual recomputation with independent single searches
    raw = {}
    for c in classes:
        cterm = TermQuery(c, field="lang")
        t = idx.search_parsed([(0, cterm, 1)])
        s = 0.0
        rows = t.to_pylist()
        if rows and rows[0]["score"] > 0:
            s += math.log(rows[0]["score"])
        for w in text.split():
            q = BooleanQuery(
                (
                    BooleanClause(cterm, Occur.MUST),
                    BooleanClause(TermQuery(w), Occur.SHOULD),
                )
            )
            rows = idx.search_parsed([(0, q, 1)]).to_pylist()
            if rows and rows[0]["score"] > 0:
                s += math.log(rows[0]["score"])
        raw[c] = s
    smax = max(raw.values())
    lse = smax + math.log(sum(math.exp(v - smax) for v in raw.values()))
    want = {c: math.exp(v - lse) for c, v in raw.items()}
    for c, p in got:
        assert p == pytest.approx(want[c], abs=1e-9)


def test_naive_bayes_handles_null_and_empty_text(ray_session):
    import ray.data

    rows = [{"doc_id": i, "text": t, "cls": c} for i, t, c in DOCS]
    rows.append({"doc_id": 6, "text": "", "cls": "ham"})
    rows.append({"doc_id": 7, "text": None, "cls": "spam"})
    ds = ray.data.from_items(rows)
    got = naive_bayes_classify(ds, "text", "cls", [(0, "pills")])
    assert len(got) == 2  # one row per class
    assert np.isfinite(got["log_score"]).all()
