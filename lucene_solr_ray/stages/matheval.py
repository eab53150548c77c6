"""Solr math expressions: the ``let(...)`` vector/matrix/statistics
evaluator family.

The reference's ~201 StreamEvaluators split into two worlds: per-tuple
scalar functions (``stages/evaluators.py`` compiles those into batch
kernels) and the math-expression world — vectors, matrices and statistics
evaluated ONCE per expression inside ``let()`` on a single node
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/`` —
ArrayEvaluator, MeanEvaluator, CorrelationEvaluator, FFTEvaluator …).
This module is that second world on numpy: ``let_eval`` binds variables
sequentially, ``col(dataset, field)`` is the bridge that pulls one
column of a (bounded) Ray Dataset to the driver — the exact shape of the
reference's ``col(search(...), fld)``, which also materializes the
stream driver-side.

Semantics follow commons-math where the reference delegates:
``normalize`` is the z-score with SAMPLE std (StatUtils.normalize),
``var``/``stddev`` are sample statistics, ``percentile`` uses
commons-math's default R-6 estimation (pos = p·(n+1)/100), ``sequence``
is MathArrays.sequence(length, start, stride).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List

import numpy as np

from lucene_solr_ray.stages.evaluators import (
    EvalError, _BINARY, _UNARY, _VARIADIC, _lex, _parse,
)

__all__ = ["let_eval", "math_eval", "MATH_FUNCS"]


def _vec(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float64)
    if a.ndim == 0:
        a = a.reshape(1)
    return a


def _mat(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float64)
    if a.ndim != 2:
        raise EvalError("expecting a matrix")
    return a


def _percentile(v, p) -> float:
    """commons-math Percentile default: pos = p*(n+1)/100, linear
    interpolation, clamped to the extremes."""
    a = np.sort(_vec(v))
    n = len(a)
    pos = float(p) * (n + 1) / 100.0
    if pos < 1:
        return float(a[0])
    if pos >= n:
        return float(a[-1])
    lo = int(math.floor(pos))
    frac = pos - lo
    return float(a[lo - 1] + frac * (a[lo] - a[lo - 1]))


def _moving(v, window, fn):
    a = _vec(v)
    w = int(window)
    if w <= 0 or w > len(a):
        raise EvalError("moving window out of range")
    return np.array([fn(a[i:i + w]) for i in range(len(a) - w + 1)])


def _ema(v, window):
    """ExponentialMovingAverageEvaluator: SMA seed over the first
    window, then ema = (x - prev)*k + prev with k = 2/(window+1)."""
    a = _vec(v)
    w = int(window)
    k = 2.0 / (w + 1)
    out = [float(np.mean(a[:w]))]
    for x in a[w:]:
        out.append((float(x) - out[-1]) * k + out[-1])
    return np.array(out)


def _describe(v) -> Dict[str, float]:
    a = _vec(v)
    n = len(a)
    return {
        "N": float(n),
        "min": float(np.min(a)),
        "max": float(np.max(a)),
        "mean": float(np.mean(a)),
        "sum": float(np.sum(a)),
        "var": float(np.var(a, ddof=1)) if n > 1 else 0.0,
        "stdev": float(np.std(a, ddof=1)) if n > 1 else 0.0,
        "skewness": _skew(a),
        "kurtosis": _kurt(a),
    }


def _skew(a) -> float:
    # commons-math Skewness: bias-corrected (n/((n-1)(n-2))) Σ((x-μ)/s)³
    n = len(a)
    if n < 3:
        return 0.0
    s = np.std(a, ddof=1)
    if s == 0:
        return 0.0
    return float(n / ((n - 1) * (n - 2))
                 * np.sum(((a - np.mean(a)) / s) ** 3))


def _kurt(a) -> float:
    # commons-math Kurtosis: bias-corrected excess kurtosis
    n = len(a)
    if n < 4:
        return 0.0
    s = np.std(a, ddof=1)
    if s == 0:
        return 0.0
    m = np.mean(a)
    g = np.sum(((a - m) / s) ** 4)
    return float(n * (n + 1) / ((n - 1) * (n - 2) * (n - 3)) * g
                 - 3 * (n - 1) ** 2 / ((n - 2) * (n - 3)))


def _regress(x, y) -> Dict[str, float]:
    """OLSRegression / Regress: simple linear regression, commons-math
    SimpleRegression outputs."""
    xa, ya = _vec(x), _vec(y)
    n = len(xa)
    sx, sy = xa.sum(), ya.sum()
    sxx = np.sum((xa - xa.mean()) ** 2)
    sxy = np.sum((xa - xa.mean()) * (ya - ya.mean()))
    slope = float(sxy / sxx)
    intercept = float((sy - slope * sx) / n)
    r = float(np.corrcoef(xa, ya)[0, 1])
    return {"slope": slope, "intercept": intercept, "R": r,
            "RSquared": r * r, "N": float(n)}


def _pairwise_distance(m) -> np.ndarray:
    """distance(matrix): euclidean distance matrix of the ROWS
    (DistanceEvaluator's default measure)."""
    a = _mat(m)
    d2 = (
        (a ** 2).sum(axis=1)[:, None]
        + (a ** 2).sum(axis=1)[None, :]
        - 2.0 * (a @ a.T)
    )
    return np.sqrt(np.maximum(d2, 0.0))


def _knn_predict(model, x):
    xs, ys, k = model["x"], model["y"], model["k"]
    q = np.asarray(x, dtype=np.float64)
    if q.ndim == 0:
        q = q.reshape(1, 1)
    elif q.ndim == 1:
        q = q.reshape(-1, 1) if xs.shape[1] == 1 else q.reshape(1, -1)
    out = np.empty(q.shape[0])
    for i, row in enumerate(q):
        d = np.sqrt(((xs - row) ** 2).sum(axis=1))
        nn = np.argsort(d, kind="mergesort")[:k]
        out[i] = float(ys[nn].mean())
    return float(out[0]) if out.shape[0] == 1 and np.isscalar(x) or (
        out.shape[0] == 1 and isinstance(x, (int, float))
    ) else out


def _predict(model, x):
    if isinstance(model, dict) and model.get("type") == "spline":
        from lucene_solr_ray.stages.mathml import _spline_predict

        return _spline_predict(model, x)
    if isinstance(model, dict) and model.get("type") == "knnRegress":
        return _knn_predict(model, x)
    if isinstance(model, dict) and model.get("type") == "akima":
        from lucene_solr_ray.stages.mathml import _akima_predict

        return _akima_predict(model, x)
    slope, intercept = model["slope"], model["intercept"]
    if isinstance(x, (int, float)):
        return slope * x + intercept
    return slope * _vec(x) + intercept


def _hist(v, bins) -> List[Dict[str, float]]:
    counts, edges = np.histogram(_vec(v), bins=int(bins))
    return [
        {"min": float(edges[i]), "max": float(edges[i + 1]),
         "N": float(counts[i]),
         "mean": float((edges[i] + edges[i + 1]) / 2)}
        for i in range(len(counts))
    ]


def _freq_table(v) -> List[Dict[str, float]]:
    vals, counts = np.unique(_vec(v), return_counts=True)
    total = counts.sum()
    return [
        {"value": float(vals[i]), "count": float(counts[i]),
         "pct": float(counts[i] / total)}
        for i in range(len(vals))
    ]


def _primes(length, start):
    out, x = [], max(int(start), 2)
    while len(out) < int(length):
        if all(x % p for p in range(2, int(math.isqrt(x)) + 1)):
            out.append(float(x))
        x += 1
    return np.array(out)


def _find_delay(a, b):
    """FindDelayEvaluator: lag of the peak cross-correlation."""
    x, y = _vec(a), _vec(b)
    x = x - x.mean()
    y = y - y.mean()
    cc = np.correlate(x, y, mode="full")
    return float(len(y) - 1 - int(np.argmax(cc)))


#: hard cap on rows a math-world ``col()`` binding may pull to the
#: driver — mirrors Solr's in-memory ``let()``/``col()`` model but
#: refuses to bind a fact-scale column by accident; raise it explicitly
#: for a genuinely driver-sized working set
COL_ROW_LIMIT = 10_000_000


def _col(ds, field, limit: int = None):
    """col(stream, field): pull ONE column driver-side.

    The reference's math world is explicitly in-memory (Solr ``let()``
    evaluates streams eagerly), but a 100 TB column must not ride that
    path by accident — the pull is capped at ``COL_ROW_LIMIT`` rows and
    raises past it (take ``limit`` rows explicitly, or pre-aggregate in
    the cluster before entering the math world)."""
    import pandas as pd
    import pyarrow as pa

    cap = int(limit) if limit is not None else COL_ROW_LIMIT
    if isinstance(ds, pd.DataFrame):
        vals = ds[field].to_numpy(dtype=np.float64)
        n = len(vals)
    elif isinstance(ds, pa.Table):
        vals = ds.column(field).to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(vals)
    else:
        rows = ds.select_columns([field]).limit(cap + 1).take(cap + 1)
        vals = np.asarray([r[field] for r in rows], dtype=np.float64)
        n = len(vals)
    if n > cap:
        raise ValueError(
            f"col({field!r}) would bind {'>' if n > cap else ''}{n} rows "
            f"on the driver (cap {cap}); pre-aggregate in the cluster or "
            "pass an explicit row limit"
        )
    return vals


def _norm_z(v):
    a = _vec(v)
    return (a - a.mean()) / np.std(a, ddof=1)


MATH_FUNCS: Dict[str, Callable] = {
    # construction
    "array": lambda *a: np.array([float(x) for x in a]),
    "sequence": lambda length, start, stride: np.arange(
        float(start), float(start) + float(length) * float(stride),
        float(stride))[: int(length)],
    "zeros": lambda n: np.zeros(int(n)),
    "ones": lambda n: np.ones(int(n)),
    "primes": _primes,
    "matrix": lambda *rows: np.vstack([_vec(r) for r in rows]),
    "col": _col,
    # shape / access
    "rev": lambda v: _vec(v)[::-1],
    "copyOf": lambda v, n=None: (_vec(v)[: int(n)] if n is not None
                                 else _vec(v).copy()),
    "copyOfRange": lambda v, a, b: _vec(v)[int(a):int(b)],
    "valueAt": lambda v, i, j=None: (
        float(_mat(v)[int(i), int(j)]) if j is not None
        else float(_vec(v)[int(i)])),
    "append": lambda *vs: np.concatenate([_vec(v) for v in vs]),
    "asc": lambda v: np.sort(_vec(v)),
    "length": lambda v: float(len(_vec(v))),
    "rowAt": lambda m, i: _mat(m)[int(i)],
    "columnAt": lambda m, j: _mat(m)[:, int(j)],
    "rowCount": lambda m: float(_mat(m).shape[0]),
    "columnCount": lambda m: float(_mat(m).shape[1]),
    "transpose": lambda m: _mat(m).T,
    # element-by-element / scalar ops
    "ebeAdd": lambda a, b: _vec(a) + _vec(b),
    "ebeSubtract": lambda a, b: _vec(a) - _vec(b),
    "ebeMultiply": lambda a, b: _vec(a) * _vec(b),
    "ebeDivide": lambda a, b: _vec(a) / _vec(b),
    "scalarAdd": lambda s, v: _vec(v) + float(s),
    "scalarSubtract": lambda s, v: _vec(v) - float(s),
    "scalarMultiply": lambda s, v: _vec(v) * float(s),
    "scalarDivide": lambda s, v: _vec(v) / float(s),
    "scale": lambda s, v: _vec(v) * float(s),
    # linear algebra
    "dotProduct": lambda a, b: float(np.dot(_vec(a), _vec(b))),
    "matrixMult": lambda a, b: _mat(a) @ _mat(b),
    "cosineSimilarity": lambda a, b: float(
        np.dot(_vec(a), _vec(b))
        / (np.linalg.norm(_vec(a)) * np.linalg.norm(_vec(b)))),
    "euclideanDistance": lambda a, b: float(
        np.linalg.norm(_vec(a) - _vec(b))),
    "manhattanDistance": lambda a, b: float(
        np.abs(_vec(a) - _vec(b)).sum()),
    "chebyshevDistance": lambda a, b: float(
        np.abs(_vec(a) - _vec(b)).max()),
    "canberraDistance": lambda a, b: float(np.sum(
        np.abs(_vec(a) - _vec(b))
        / np.where((np.abs(_vec(a)) + np.abs(_vec(b))) == 0, 1,
                   np.abs(_vec(a)) + np.abs(_vec(b))))),
    "norm": lambda v: float(np.linalg.norm(_vec(v))),
    "l1Norm": lambda v: float(np.abs(_vec(v)).sum()),
    "lInfNorm": lambda v: float(np.abs(_vec(v)).max()),
    # statistics
    "mean": lambda v: float(np.mean(_vec(v))),
    "geometricMean": lambda v: float(
        np.exp(np.mean(np.log(_vec(v))))),
    "harmonicMean": lambda v: float(
        len(_vec(v)) / np.sum(1.0 / _vec(v))),
    "mode": lambda v: float(
        np.unique(_vec(v), return_counts=True)[0][
            np.argmax(np.unique(_vec(v), return_counts=True)[1])]),
    "var": lambda v: float(np.var(_vec(v), ddof=1)),
    "stddev": lambda v: float(np.std(_vec(v), ddof=1)),
    "sumSq": lambda v: float(np.sum(_vec(v) ** 2)),
    "grandSum": lambda m: float(_mat(m).sum()),
    "sumRows": lambda m: _mat(m).sum(axis=1),
    "sumColumns": lambda m: _mat(m).sum(axis=0),
    "percentile": _percentile,
    "describe": _describe,
    # corr/cov are overloaded like the reference: two vectors → scalar,
    # one matrix → column correlation/covariance matrix
    "correlation": lambda a, b=None: (
        np.corrcoef(_mat(a), rowvar=False)
        if b is None else float(np.corrcoef(_vec(a), _vec(b))[0, 1])
    ),
    "covariance": lambda a, b=None: (
        np.cov(_mat(a), rowvar=False, ddof=1)
        if b is None else float(np.cov(_vec(a), _vec(b), ddof=1)[0, 1])
    ),
    "corr": lambda a, b=None: (
        np.corrcoef(_mat(a), rowvar=False)
        if b is None else float(np.corrcoef(_vec(a), _vec(b))[0, 1])
    ),
    "cov": lambda a, b=None: (
        np.cov(_mat(a), rowvar=False, ddof=1)
        if b is None else float(np.cov(_vec(a), _vec(b), ddof=1)[0, 1])
    ),
    "distance": lambda m: _pairwise_distance(m),
    "knnRegress": lambda x, y, k=3: {
        "type": "knnRegress",
        "x": _mat(x) if np.asarray(x).ndim == 2 else
        _vec(x).reshape(-1, 1),
        "y": _vec(y), "k": int(k),
    },
    "regress": _regress,
    "olsRegress": _regress,
    "predict": _predict,
    "meanDifference": lambda a, b: float(np.mean(_vec(a) - _vec(b))),
    "sumDifference": lambda a, b: float(np.sum(_vec(a) - _vec(b))),
    "normalize": _norm_z,
    "standardize": _norm_z,
    "normalizeSum": lambda v: _vec(v) / _vec(v).sum(),
    "minMaxScale": lambda v, lo=0.0, hi=1.0: (
        (_vec(v) - _vec(v).min())
        / ((_vec(v).max() - _vec(v).min()) or 1.0)
        * (float(hi) - float(lo)) + float(lo)),
    "rank": lambda v: np.argsort(np.argsort(_vec(v))).astype(
        np.float64) + 1.0,
    "histogram": _hist,
    "freqTable": _freq_table,
    # time series
    "movingAvg": lambda v, w: _moving(v, w, np.mean),
    "movingMedian": lambda v, w: _moving(v, w, np.median),
    "movingMAD": lambda v, w: _moving(
        v, w, lambda a: np.median(np.abs(a - np.median(a)))),
    "expMovingAvg": _ema,
    "diff": lambda v, lag=1: _vec(v)[int(lag):] - _vec(v)[:-int(lag)],
    "lerp": lambda x, y, p: float(np.interp(float(p), _vec(x), _vec(y))),
    "derivative": lambda v: np.gradient(_vec(v)),
    "integrate": lambda v: float(np.trapz(_vec(v))),
    "polyFit": lambda x, y, deg=3: np.polyfit(
        _vec(x), _vec(y), int(deg))[::-1],
    # signal
    "fft": lambda v: np.vstack([np.fft.fft(_vec(v)).real,
                                np.fft.fft(_vec(v)).imag]),
    "ifft": lambda m: np.fft.ifft(
        _mat(m)[0] + 1j * _mat(m)[1]).real,
    "convolve": lambda a, b: np.convolve(_vec(a), _vec(b)),
    "findDelay": _find_delay,
    # scalar extras
    "factorial": lambda n: float(math.factorial(int(n))),
    "binomialCoefficient": lambda n, k: float(
        math.comb(int(n), int(k))),
    "precision": lambda x, d: (np.round(_vec(x), int(d))
                               if not np.isscalar(x)
                               and not isinstance(x, float)
                               else float(round(float(x), int(d)))),
    "coalesce": lambda *a: next(
        (x for x in a if x is not None
         and not (isinstance(x, float) and math.isnan(x))), None),
}

# clustering / Markov / distribution / significance-test / DSP families
from lucene_solr_ray.stages.mathml import ML_FUNCS as _ML_FUNCS  # noqa: E402

MATH_FUNCS.update(_ML_FUNCS)


def _run(node, env: Dict[str, Any]):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        if node[1] not in env:
            raise EvalError(f"unbound variable {node[1]!r}")
        return env[node[1]]
    _, fn, args = node
    if fn == "col" and len(args) == 2 and args[1][0] == "col":
        # col(stream, field): the field operand is a bare name, not a
        # variable reference — pass it through as a string
        return MATH_FUNCS["col"](_run(args[0], env), args[1][1])
    if fn == "monteCarlo" and len(args) == 2:
        # MonteCarloEvaluator.java:35 — re-evaluate the function N times;
        # per-iteration variability flows through the bound ``mcSeed``
        # variable (the reference re-populates sampling variables each
        # iteration from an unseeded RNG; deterministic seeding is this
        # engine's reproducibility contract — pass mcSeed into sample())
        n = int(_run(args[1], env))
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            env_i = dict(env)
            env_i["mcSeed"] = i + 1
            out[i] = float(_run(args[0], env_i))
        return out
    a = [_run(x, env) for x in args]
    if fn in MATH_FUNCS:
        return MATH_FUNCS[fn](*a)
    # scalar-evaluator families apply element-wise over vectors too, as in
    # the reference (add/mult/pow/log/… are shared between both worlds)
    if fn in _UNARY and len(a) == 1:
        return _UNARY[fn](np.asarray(a[0], dtype=np.float64))
    if fn in _BINARY and len(a) == 2:
        return _BINARY[fn](np.asarray(a[0], dtype=np.float64),
                           np.asarray(a[1], dtype=np.float64))
    if fn in _VARIADIC and len(a) >= 2:
        acc = np.asarray(a[0], dtype=np.float64)
        for x in a[1:]:
            acc = _VARIADIC[fn](acc, np.asarray(x, dtype=np.float64))
        return acc
    raise EvalError(f"unknown math evaluator {fn!r}")


def math_eval(expr: str, env: Dict[str, Any] | None = None):
    """Evaluate one math expression against an environment of bound
    variables (vectors, matrices, datasets for ``col``)."""
    toks = _lex(expr)
    node, j = _parse(toks, 0)
    if j != len(toks):
        raise EvalError(f"trailing tokens in {expr!r}")
    return _run(node, dict(env or {}))


def let_eval(bindings: Dict[str, Any], env: Dict[str, Any] | None = None
             ) -> Dict[str, Any]:
    """LetStream: evaluate bindings IN ORDER, each seeing the previous
    results; non-string values bind as-is (pre-bound datasets etc.)."""
    out: Dict[str, Any] = dict(env or {})
    for name, expr in bindings.items():
        out[name] = (math_eval(expr, out) if isinstance(expr, str)
                     else expr)
    return {k: v for k, v in out.items() if env is None or k not in env}
