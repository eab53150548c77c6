"""Math-world ML/statistics evaluators: clustering, Markov chains,
distributions, significance tests, DSP extras (reference
``solr/solrj/.../io/eval/`` Kmeans/Dbscan/MarkovChain/TTest/... evaluator
classes).  Oracles: closed-form identities of the special functions,
recoverable synthetic structure for the clusterers, and law-of-large-
numbers checks for sampling."""

import math

import numpy as np
import pytest

from lucene_solr_ray.stages.matheval import let_eval, math_eval
from lucene_solr_ray.stages.mathml import (
    _betainc,
    _gammainc_lower,
    _norm_cdf,
)


def test_special_function_identities():
    # I_x(1,1) = x ; symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    for x in (0.1, 0.42, 0.9):
        assert math.isclose(_betainc(1, 1, x), x, rel_tol=1e-10)
    for a, b, x in ((2.5, 3.0, 0.3), (0.5, 0.5, 0.7), (5, 1, 0.2)):
        assert math.isclose(
            _betainc(a, b, x), 1.0 - _betainc(b, a, 1.0 - x),
            rel_tol=1e-9, abs_tol=1e-12,
        )
    # P(1, x) = 1 - e^-x ; P(s, 0) = 0
    for x in (0.5, 2.0, 7.0):
        assert math.isclose(
            _gammainc_lower(1.0, x), 1.0 - math.exp(-x), rel_tol=1e-10
        )
    assert _gammainc_lower(3.2, 0.0) == 0.0
    # chi-square with 2 df: CDF(x) = 1 - e^(-x/2) = P(1, x/2)
    assert math.isclose(
        _gammainc_lower(1.0, 3.0 / 2), 1 - math.exp(-1.5), rel_tol=1e-10
    )
    assert math.isclose(_norm_cdf(0.0), 0.5, rel_tol=1e-12)
    assert math.isclose(_norm_cdf(1.959964), 0.975, abs_tol=1e-5)


def test_kmeans_recovers_separated_blobs():
    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.3, size=(40, 2))
    b = rng.normal(8, 0.3, size=(40, 2))
    m = np.vstack([a, b])
    r = math_eval("kmeans(m, 2)", {"m": m})
    labels = r["labels"]
    # one label per blob, perfectly separated
    assert len(set(labels[:40])) == 1 and len(set(labels[40:])) == 1
    assert labels[0] != labels[40]
    cents = math_eval("getCentroids(r)", {"r": r})
    got = sorted(float(c[0]) for c in cents)
    assert abs(got[0] - 0) < 0.5 and abs(got[1] - 8) < 0.5
    # getCluster returns the blob's rows
    c0 = math_eval("getCluster(r, 0)", {"r": r})
    assert len(c0) == 40
    # multiKmeans no worse than any single seeded run
    best = math_eval("multiKmeans(m, 2, 5)", {"m": m})
    assert best["inertia"] <= r["inertia"] + 1e-9


def test_fuzzy_kmeans_membership():
    rng = np.random.default_rng(3)
    m = np.vstack([
        rng.normal(0, 0.2, size=(30, 2)),
        rng.normal(5, 0.2, size=(30, 2)),
    ])
    r = math_eval("fuzzyKmeans(m, 2)", {"m": m})
    u = math_eval("getMembershipMatrix(r)", {"r": r})
    assert u.shape == (60, 2)
    np.testing.assert_allclose(u.sum(axis=1), 1.0, rtol=1e-9)
    # hard labels separate the blobs
    lab = r["labels"]
    assert len(set(lab[:30])) == 1 and lab[0] != lab[30]


def test_dbscan_clusters_and_noise():
    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.1, size=(25, 2))
    b = rng.normal(4, 0.1, size=(25, 2))
    noise = np.array([[100.0, 100.0]])
    m = np.vstack([a, b, noise])
    r = math_eval("dbscan(m, 0.8, 4)", {"m": m})
    lab = r["labels"]
    assert lab[-1] == -1.0  # isolated point is noise
    assert len({v for v in lab if v >= 0}) == 2
    assert len(r["centroids"]) == 2


def test_markov_chain_stationary_frequencies():
    p = np.array([[0.9, 0.1], [0.5, 0.5]])
    chain = math_eval("markovChain(p)", {"p": p})
    walk = math_eval("sample(chain, 20000)", {"chain": chain})
    # stationary distribution of this chain: pi = (5/6, 1/6)
    freq1 = float(np.mean(walk == 1.0))
    assert abs(freq1 - 1 / 6) < 0.02
    # non-stochastic rows are normalized like the reference's builder
    chain2 = math_eval("markovChain(q)", {"q": np.array([[9., 1.],
                                                         [5., 5.]])})
    np.testing.assert_allclose(chain2["transitions"], p)


def test_distributions_pmf_cdf():
    env = {}
    d = math_eval("binomialDistribution(0.5, 10)", env)
    assert math.isclose(
        math_eval("probability(d, 5)", {"d": d}), 252 / 1024, rel_tol=1e-12
    )
    assert math.isclose(
        math_eval("cumulativeProbability(d, 10)", {"d": d}), 1.0,
        rel_tol=1e-9,
    )
    # binomial CDF = sum of pmf
    want = sum(math_eval("probability(d, %d)" % k, {"d": d})
               for k in range(0, 4))
    got = math_eval("cumulativeProbability(d, 3)", {"d": d})
    assert math.isclose(got, want, rel_tol=1e-9)
    p = math_eval("poissonDistribution(3.0)", env)
    assert math.isclose(
        math_eval("probability(p, 0)", {"p": p}), math.exp(-3),
        rel_tol=1e-10,
    )
    want = sum(math.exp(-3) * 3 ** k / math.factorial(k) for k in range(5))
    assert math.isclose(
        math_eval("cumulativeProbability(p, 4)", {"p": p}), want,
        rel_tol=1e-9,
    )
    n = math_eval("normalDistribution(10, 2)", env)
    assert math.isclose(
        math_eval("cumulativeProbability(n, 10)", {"n": n}), 0.5,
        rel_tol=1e-12,
    )
    # two-arg probability = CDF range
    pr = math_eval("probability(n, 8, 12)", {"n": n})
    assert math.isclose(pr, _norm_cdf(1) - _norm_cdf(-1), rel_tol=1e-9)
    u = math_eval("uniformDistribution(0, 10)", env)
    assert math_eval("cumulativeProbability(u, 2.5)", {"u": u}) == 0.25
    e = math_eval("empiricalDistribution(v)",
                  {"v": np.array([1., 2., 3., 4.])})
    assert math_eval("cumulativeProbability(e, 2)", {"e": e}) == 0.5
    z = math_eval("zipFDistribution(3, 1.0)", env)
    assert math.isclose(
        math_eval("probability(z, 1)", {"z": z}), (1 / 1) / (1 + 0.5 + 1 / 3),
        rel_tol=1e-12,
    )


def test_sampling_moments():
    n = math_eval("normalDistribution(5, 1)", {})
    s = math_eval("sample(n, 50000)", {"n": n})
    assert abs(float(np.mean(s)) - 5.0) < 0.05
    assert abs(float(np.std(s)) - 1.0) < 0.05
    # seeded → reproducible
    s2 = math_eval("sample(n, 50000)", {"n": n})
    np.testing.assert_array_equal(s, s2)


def test_ttest_known_values():
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 200)
    # identical samples: t = 0, p = 1
    r = math_eval("ttest(a, b)", {"a": a, "b": a.copy()})
    assert abs(r["t-statistic"]) < 1e-12 and abs(r["p-value"] - 1) < 1e-9
    # clearly shifted: tiny p
    b = rng.normal(3, 1, 200)
    r2 = math_eval("ttest(a, b)", {"a": a, "b": b})
    assert r2["p-value"] < 1e-6 and r2["t-statistic"] < -10
    # paired t on a constant shift: exact t
    d = a + 1.0
    r3 = math_eval("pairedTtest(b2, a2)", {"b2": d, "a2": a})
    assert r3["p-value"] < 1e-12
    # classic textbook check: t=2.0, df=10 → two-sided p ≈ 0.07339
    from lucene_solr_ray.stages.mathml import _t_sf2

    assert math.isclose(_t_sf2(2.0, 10.0), 0.0733881, abs_tol=2e-5)


def test_mann_whitney_and_chisquare_and_gtest():
    rng = np.random.default_rng(13)
    a = rng.normal(0, 1, 150)
    b = rng.normal(0, 1, 170)
    r = math_eval("mannWhitney(a, b)", {"a": a, "b": b})
    assert r["p-value"] > 0.01  # same distribution: not significant
    r2 = math_eval("mannWhitney(a, b)", {"a": a, "b": b + 2.0})
    assert r2["p-value"] < 1e-6
    c = math_eval("chiSquareDataSet(x, y)",
                  {"x": np.array([10., 20., 30.]),
                   "y": np.array([10., 20., 30.])})
    assert abs(c["chisquare-statistic"]) < 1e-12
    assert abs(c["p-value"] - 1.0) < 1e-9
    c2 = math_eval("chiSquareDataSet(x, y)",
                   {"x": np.array([50., 10.]), "y": np.array([10., 50.])})
    assert c2["p-value"] < 1e-6
    g = math_eval("gtestDataSet(x, y)",
                  {"x": np.array([50., 10.]), "y": np.array([10., 50.])})
    assert g["p-value"] < 1e-6 and g["G-statistic"] > 10


def test_kolmogorov_smirnov():
    rng = np.random.default_rng(17)
    a = rng.normal(0, 1, 400)
    b = rng.normal(0, 1, 400)
    r = math_eval("kolmogorovSmirnov(a, b)", {"a": a, "b": b})
    assert r["p-value"] > 0.01
    r2 = math_eval("kolmogorovSmirnov(a, b)", {"a": a, "b": b + 1.5})
    assert r2["p-value"] < 1e-6
    # one-sample against the true distribution
    n = math_eval("normalDistribution(0, 1)", {})
    r3 = math_eval("kolmogorovSmirnov(n, a)", {"n": n, "a": a})
    assert r3["p-value"] > 0.01


def test_dsp_and_smoothing():
    # oscillate + harmonicFit round-trip
    wave = math_eval("oscillate(2.5, 0.3, 1.0)", {})
    assert len(wave) == 128
    i = np.arange(128)
    np.testing.assert_allclose(wave, 2.5 * np.sin(0.3 * i + 1.0))
    # harmfit recovers a clean sine closely
    y = 3.0 * np.sin(2 * np.pi * 4 * np.arange(64) / 64 + 0.5)
    fit = math_eval("harmonicFit(y)", {"y": y})
    assert float(np.abs(fit - y).max()) < 1e-6
    # mad
    assert math_eval("mad(v)", {"v": np.array([1., 2., 3., 4., 100.])}) \
        == 1.0
    # outliers vs a normal dist
    n = math_eval("normalDistribution(0, 1)", {})
    out = math_eval("outliers(n, v, 0.01, 0.99)",
                    {"n": n, "v": np.array([0.0, 0.5, 9.0, -8.0])})
    assert sorted(out.tolist()) == [-8.0, 9.0]
    # loess smooths noise toward the trend
    rng = np.random.default_rng(19)
    x = np.linspace(0, 10, 120)
    yy = np.sin(x) + rng.normal(0, 0.15, 120)
    sm = math_eval("loess(x, yy, 0.3)", {"x": x, "yy": yy})
    assert float(np.abs(sm - np.sin(x)).mean()) < \
        float(np.abs(yy - np.sin(x)).mean())
    # spline interpolates exactly at the knots, smoothly between
    xs = np.array([0., 1., 2., 3., 4.])
    ys = xs ** 2
    model = math_eval("spline(xs, ys)", {"xs": xs, "ys": ys})
    for xv, yv in zip(xs, ys):
        assert math.isclose(
            math_eval("predict(m, %r)" % float(xv), {"m": model}), yv,
            abs_tol=1e-9,
        )
    mid = math_eval("predict(m, 2.5)", {"m": model})
    assert 5.9 < mid < 6.6  # close to 6.25


def test_let_composition_with_ml_world():
    out = let_eval({
        "d": "normalDistribution(array(1, 2, 3, 4, 5))",
        "c": "cumulativeProbability(d, 3)",
        "t": "ttest(array(1,2,3,4,5), array(1,2,3,4,5))",
    })
    assert math.isclose(out["c"], 0.5, rel_tol=1e-12)
    assert abs(out["t"]["p-value"] - 1.0) < 1e-9


def test_more_distributions():
    # gamma: shape=1, scale=θ is exponential → CDF = 1 - e^(-x/θ)
    g = math_eval("gammaDistribution(1.0, 2.0)", {})
    assert math.isclose(
        math_eval("cumulativeProbability(g, 4)", {"g": g}),
        1 - math.exp(-2), rel_tol=1e-10,
    )
    # lognormal: CDF at the scale point e^mu is 0.5
    ln = math_eval("logNormalDistribution(1.0, 0.5)", {})
    assert math.isclose(
        math_eval("cumulativeProbability(l, %r)" % math.exp(1.0),
                  {"l": ln}), 0.5, rel_tol=1e-10,
    )
    # weibull shape=1 is exponential
    w = math_eval("weibullDistribution(1.0, 3.0)", {})
    assert math.isclose(
        math_eval("cumulativeProbability(w, 3)", {"w": w}),
        1 - math.exp(-1), rel_tol=1e-10,
    )
    # triangular: CDF at the mode of a symmetric triangle is 0.5
    tr = math_eval("triangularDistribution(0, 5, 10)", {})
    assert math_eval("cumulativeProbability(t, 5)", {"t": tr}) == 0.5
    assert math_eval("cumulativeProbability(t, 0)", {"t": tr}) == 0.0
    assert math_eval("cumulativeProbability(t, 10)", {"t": tr}) == 1.0
    # geometric (failures before first success): pmf + CDF consistency
    ge = math_eval("geometricDistribution(0.25)", {})
    pmf0 = math_eval("probability(g, 0)", {"g": ge})
    assert math.isclose(pmf0, 0.25, rel_tol=1e-12)
    cdf2 = math_eval("cumulativeProbability(g, 2)", {"g": ge})
    want = sum(0.25 * 0.75 ** k for k in range(3))
    assert math.isclose(cdf2, want, rel_tol=1e-12)
    # sampling moments (gamma mean = k*θ)
    s = math_eval("sample(g2, 40000)", {"g2": math_eval(
        "gammaDistribution(3.0, 2.0)", {})})
    assert abs(float(np.mean(s)) - 6.0) < 0.1


def test_matrix_overloads_and_knn_regress(ray_session):
    import pyarrow as pa
    import ray.data

    # corr/cov matrix overloads
    rng = np.random.default_rng(31)
    m = rng.normal(size=(50, 3))
    C = math_eval("correlation(m)", {"m": m})
    assert C.shape == (3, 3)
    np.testing.assert_allclose(np.diag(C), 1.0, rtol=1e-12)
    np.testing.assert_allclose(C, np.corrcoef(m, rowvar=False))
    V = math_eval("cov(m)", {"m": m})
    np.testing.assert_allclose(V, np.cov(m, rowvar=False, ddof=1))
    s = math_eval("correlation(a, b)", {"a": m[:, 0], "b": m[:, 1]})
    assert isinstance(s, float)
    # pairwise distance matrix
    pts = np.array([[0.0, 0.0], [3.0, 4.0]])
    D = math_eval("distance(p)", {"p": pts})
    assert math.isclose(D[0, 1], 5.0, rel_tol=1e-12) and D[0, 0] == 0.0
    # movingMAD
    out = math_eval("movingMAD(v, 3)", {"v": np.array([1., 2., 3., 100.])})
    assert out.tolist() == [1.0, 1.0]
    # knnRegress + predict: exact on a linear function with k=1
    x = np.arange(20, dtype=np.float64)
    y = 3.0 * x + 1.0
    model = math_eval("knnRegress(x, y, 1)", {"x": x, "y": y})
    assert math_eval("predict(m2, 7)", {"m2": model}) == 22.0
    preds = math_eval("predict(m2, q)", {"m2": model,
                                         "q": np.array([2.0, 5.0])})
    np.testing.assert_allclose(preds, [7.0, 16.0])
    # temporal per-tuple evaluators over a timestamp column
    from lucene_solr_ray.stages.evaluators import evaluate

    t = pa.table({"ts": pa.array(
        np.array(["2026-03-05T10:20:30", "2025-12-31T23:59:59"],
                 dtype="datetime64[us]"))})
    rows = evaluate(ray.data.from_arrow(t), {
        "y": "year(ts)", "mo": "month(ts)", "d": "day(ts)",
        "doy": "dayOfYear(ts)", "h": "hour(ts)", "q": "quarter(ts)",
    }).take_all()
    assert [r["y"] for r in rows] == [2026, 2025]
    assert [r["mo"] for r in rows] == [3, 12]
    assert [r["doy"] for r in rows] == [64, 365]
    assert [r["h"] for r in rows] == [10, 23]
    assert [r["q"] for r in rows] == [1, 4]
