"""Math-expression evaluator family (``stages/matheval.py``) —
the reference's ``solr/solrj/.../io/eval/`` vector/matrix/statistics world
(ArrayEvaluator, MeanEvaluator, CorrelationEvaluator, FFTEvaluator, …)
driven through ``let_eval`` exactly as Solr's ``let(...)`` binds them."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_solr_ray.stages.evaluators import EvalError
from lucene_solr_ray.stages.matheval import let_eval, math_eval


def test_array_sequence_construction():
    assert math_eval("array(1, 2, 3)").tolist() == [1.0, 2.0, 3.0]
    # MathArrays.sequence(length, start, stride)
    assert math_eval("sequence(5, 10, 2)").tolist() == [10, 12, 14, 16, 18]
    assert math_eval("zeros(3)").tolist() == [0, 0, 0]
    assert math_eval("primes(4, 10)").tolist() == [11, 13, 17, 19]


def test_ebe_and_scalar_ops():
    assert math_eval(
        "ebeAdd(array(1,2), array(3,4))").tolist() == [4.0, 6.0]
    assert math_eval(
        "scalarMultiply(2, array(1,2,3))").tolist() == [2.0, 4.0, 6.0]
    # scalar-evaluator families element-wise over vectors
    assert math_eval("mult(array(1,2,3), 2)").tolist() == [2.0, 4.0, 6.0]
    assert math_eval("pow(array(2,3), 2)").tolist() == [4.0, 9.0]


def test_matrix_ops():
    m = math_eval("matrixMult(matrix(array(1,2), array(3,4)), "
                  "matrix(array(5,6), array(7,8)))")
    assert m.tolist() == [[19, 22], [43, 50]]
    assert math_eval(
        "transpose(matrix(array(1,2), array(3,4)))").tolist() == [
            [1, 3], [2, 4]]
    assert math_eval(
        "sumRows(matrix(array(1,2), array(3,4)))").tolist() == [3.0, 7.0]
    assert math_eval(
        "valueAt(matrix(array(1,2), array(3,4)), 1, 0)") == 3.0
    assert math_eval("rowCount(matrix(array(1,2)))") == 1.0


def test_sample_statistics():
    v = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    env = {"v": np.array(v)}
    assert math_eval("mean(v)", env) == pytest.approx(np.mean(v))
    # commons-math Variance/StandardDeviation are SAMPLE statistics
    assert math_eval("var(v)", env) == pytest.approx(np.var(v, ddof=1))
    assert math_eval("stddev(v)", env) == pytest.approx(np.std(v, ddof=1))
    assert math_eval("geometricMean(v)", env) == pytest.approx(
        float(np.exp(np.mean(np.log(v)))))
    assert math_eval("harmonicMean(v)", env) == pytest.approx(
        len(v) / sum(1.0 / x for x in v))
    assert math_eval("sumSq(v)", env) == pytest.approx(
        sum(x * x for x in v))


def test_percentile_r6_commons_math():
    # commons-math Percentile default: pos = p*(n+1)/100, linear interp.
    v = "array(1,2,3,4,5,6,7,8,9,10)"
    # p=50 → pos 5.5 → 5 + .5*(6-5) = 5.5
    assert math_eval(f"percentile({v}, 50)") == pytest.approx(5.5)
    # p=25 → pos 2.75 → 2 + .75
    assert math_eval(f"percentile({v}, 25)") == pytest.approx(2.75)
    # clamped extremes
    assert math_eval(f"percentile({v}, 1)") == pytest.approx(1.0)
    assert math_eval(f"percentile({v}, 99)") == pytest.approx(10.0)


def test_correlation_covariance_regress():
    env = {"x": np.array([1.0, 2, 3, 4, 5]),
           "y": np.array([2.0, 4.1, 5.9, 8.2, 9.8])}
    assert math_eval("correlation(x, y)", env) == pytest.approx(
        float(np.corrcoef(env["x"], env["y"])[0, 1]))
    assert math_eval("covariance(x, y)", env) == pytest.approx(
        float(np.cov(env["x"], env["y"], ddof=1)[0, 1]))
    model = math_eval("regress(x, y)", env)
    assert model["slope"] == pytest.approx(1.97, abs=0.02)
    assert model["RSquared"] > 0.997
    pred = math_eval("predict(regress(x, y), 6)", env)
    assert pred == pytest.approx(model["slope"] * 6 + model["intercept"])


def test_describe_and_distance():
    d = math_eval("describe(array(1,2,3,4,5))")
    assert d["N"] == 5 and d["mean"] == 3.0 and d["min"] == 1.0
    assert d["var"] == pytest.approx(2.5)
    assert math_eval(
        "euclideanDistance(array(0,0), array(3,4))") == 5.0
    assert math_eval(
        "manhattanDistance(array(0,0), array(3,4))") == 7.0
    assert math_eval(
        "cosineSimilarity(array(1,0), array(0,1))") == pytest.approx(0.0)


def test_moving_and_ema():
    assert math_eval(
        "movingAvg(array(1,2,3,4,5), 2)").tolist() == [1.5, 2.5, 3.5, 4.5]
    assert math_eval(
        "movingMedian(array(5,1,4,2,3), 3)").tolist() == [4.0, 2.0, 3.0]
    # EMA: SMA seed then k = 2/(w+1)
    ema = math_eval("expMovingAvg(array(2,2,2,8), 3)")
    assert ema[0] == pytest.approx(2.0)
    assert ema[1] == pytest.approx((8 - 2.0) * 0.5 + 2.0)
    with pytest.raises(EvalError):
        math_eval("movingAvg(array(1,2), 5)")


def test_diff_derivative_rank_normalize():
    assert math_eval("diff(array(1,4,9,16))").tolist() == [3.0, 5.0, 7.0]
    assert math_eval("rank(array(30,10,20))").tolist() == [3.0, 1.0, 2.0]
    z = math_eval("normalize(array(1,2,3,4,5))")
    assert float(np.mean(z)) == pytest.approx(0.0, abs=1e-12)
    assert float(np.std(z, ddof=1)) == pytest.approx(1.0)
    assert math_eval(
        "normalizeSum(array(1,1,2))").tolist() == [0.25, 0.25, 0.5]


def test_fft_roundtrip_and_convolve():
    v = [1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 0.0, 0.0]
    env = {"v": np.array(v)}
    back = math_eval("ifft(fft(v))", env)
    assert np.allclose(back, v)
    assert math_eval(
        "convolve(array(1,1), array(1,1))").tolist() == [1.0, 2.0, 1.0]


def test_find_delay():
    # y is x shifted right by 2 → delay -2 (reference sign convention:
    # argmax of correlate(x, y, full) measured from the zero-lag center)
    x = np.array([0, 0, 1, 5, 1, 0, 0, 0], dtype=float)
    y = np.roll(x, 2)
    assert abs(math_eval("findDelay(x, y)", {"x": x, "y": y})) == 2.0


def test_histogram_freqtable():
    h = math_eval("histogram(array(1,2,2,3,3,3,9), 2)")
    assert sum(b["N"] for b in h) == 7
    ft = math_eval("freqTable(array(1,1,2))")
    assert ft[0] == {"value": 1.0, "count": 2.0, "pct": pytest.approx(2 / 3)}


def test_let_sequential_binding_and_col():
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0]})
    out = let_eval({
        "t": df,
        "v": "col(t, a)",
        "m": "mean(v)",
        "c": "scalarSubtract(m, v)",  # later binding sees earlier ones
    })
    assert out["m"] == 2.5
    assert out["c"].tolist() == [-1.5, -0.5, 0.5, 1.5]
    # col() from an Arrow table too
    tab = pa.table({"x": [10.0, 20.0]})
    out2 = let_eval({"t": tab, "v": "col(t, x)", "s": "add(mean(v), 1)"})
    assert out2["s"] == 16.0


def test_unknown_and_unbound_errors():
    with pytest.raises(EvalError):
        math_eval("noSuchEvaluator(array(1))")
    with pytest.raises(EvalError):
        math_eval("mean(unboundVar)")


def test_misc_scalars():
    assert math_eval("factorial(5)") == 120.0
    assert math_eval("binomialCoefficient(5, 2)") == 10.0
    assert math_eval("precision(array(1.23456, 2.34567), 2)").tolist() == [
        1.23, 2.35]
    assert math_eval("integrate(array(0,1,2,3))") == pytest.approx(4.5)
    assert math_eval("lerp(array(0,10), array(0,100), 5)") == 50.0
    poly = math_eval("polyFit(array(0,1,2,3), array(1,3,5,7), 1)")
    assert poly[0] == pytest.approx(1.0) and poly[1] == pytest.approx(2.0)
