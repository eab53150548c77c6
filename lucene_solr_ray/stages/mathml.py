"""Math-world ML/statistics evaluators: clustering, Markov chains,
probability distributions, significance tests, and DSP extras.

The reference's remaining StreamEvaluator families (``solr/solrj/src/
java/org/apache/solr/client/solrj/io/eval/`` — KmeansEvaluator,
MultiKmeansEvaluator, FuzzyKmeansEvaluator, DbscanEvaluator,
MarkovChainEvaluator, SampleEvaluator, NormalDistributionEvaluator &
friends, KolmogorovSmirnovEvaluator, TTestEvaluator,
PairedTtestEvaluator, MannWhitneyUEvaluator, ChiSquareDataSetEvaluator,
GTestDataSetEvaluator, OscillateEvaluator, HarmonicFitEvaluator,
LoessEvaluator, SplineEvaluator, MadEvaluator, OutliersEvaluator),
re-expressed on numpy.  Where the reference delegates to commons-math
randomness (kmeans init, distribution sampling) these take an explicit
``seed`` (default 0) so results are reproducible; everything else follows
the commons-math formulas.

The p-value special functions (regularized incomplete beta / gamma) are
implemented from the standard continued-fraction / series expansions —
public textbook numerics, no library dependency.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

from lucene_solr_ray.stages.evaluators import EvalError

__all__ = ["ML_FUNCS"]


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


# ---------------------------------------------------------------------------
# special functions (regularized incomplete beta / gamma)
# ---------------------------------------------------------------------------


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    TINY, EPS = 1e-300, 3e-14
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < TINY:
        d = TINY
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < TINY:
            d = TINY
        c = 1.0 + aa / c
        if abs(c) < TINY:
            c = TINY
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < TINY:
            d = TINY
        c = 1.0 + aa / c
        if abs(c) < TINY:
            c = TINY
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _gammainc_lower(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x)."""
    if x < 0 or s <= 0:
        raise EvalError("gammainc domain")
    if x == 0:
        return 0.0
    if x < s + 1.0:  # series
        term = 1.0 / s
        total = term
        n = s
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + s * math.log(x) - math.lgamma(s))
    # continued fraction for Q(s, x)
    TINY = 1e-300
    b = x + 1.0 - s
    c = 1.0 / TINY
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < TINY:
            d = TINY
        c = b + an / c
        if abs(c) < TINY:
            c = TINY
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 1e-15:
            break
    q = h * math.exp(-x + s * math.log(x) - math.lgamma(s))
    return 1.0 - q


def _norm_cdf(z: float) -> float:
    return 0.5 * math.erfc(-z / math.sqrt(2.0))


def _t_sf2(t: float, df: float) -> float:
    """Two-sided p-value of a t statistic."""
    return _betainc(df / 2.0, 0.5, df / (df + t * t))


# ---------------------------------------------------------------------------
# clustering
# ---------------------------------------------------------------------------


def _kmeans_core(m: np.ndarray, k: int, max_iter: int, seed: int):
    rng = np.random.default_rng(int(seed))
    n = m.shape[0]
    if k > n:
        raise EvalError("kmeans: k > rows")
    # k-means++ init (the commons-math KMeansPlusPlusClusterer default)
    centers = [m[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((m - c) ** 2, axis=1) for c in centers], axis=0
        )
        tot = d2.sum()
        if tot <= 0:
            centers.append(m[rng.integers(n)])
            continue
        centers.append(m[rng.choice(n, p=d2 / tot)])
    cent = np.vstack(centers)
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(int(max_iter)):
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        new = d.argmin(axis=1)
        if (new == labels).all() and _ > 0:
            break
        labels = new
        for j in range(k):
            sel = m[labels == j]
            if len(sel):
                cent[j] = sel.mean(axis=0)
    d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    inertia = float(d[np.arange(n), labels].sum())
    return cent, labels, inertia


def _kmeans(m, k, max_iter=1000, seed=0) -> Dict:
    mm = _mat(m)
    cent, labels, inertia = _kmeans_core(mm, int(k), int(max_iter),
                                         int(seed))
    return {"type": "kmeans", "centroids": cent,
            "labels": labels.astype(np.float64), "inertia": inertia,
            "data": mm}


def _multi_kmeans(m, k, trials, max_iter=1000) -> Dict:
    """Best of ``trials`` seeded runs by inertia (MultiKmeansEvaluator)."""
    best = None
    for s in range(int(trials)):
        r = _kmeans(m, k, max_iter, seed=s)
        if best is None or r["inertia"] < best["inertia"]:
            best = r
    return best


def _fuzzy_kmeans(m, k, fuzziness=1.2, max_iter=300, seed=0) -> Dict:
    """Fuzzy c-means (FuzzyKMeansClusterer): soft memberships u_ij with
    exponent ``fuzziness``; hard labels = argmax membership."""
    mm = _mat(m)
    n, _dim = mm.shape
    k = int(k)
    f = float(fuzziness)
    if f <= 1.0:
        raise EvalError("fuzziness must be > 1")
    rng = np.random.default_rng(int(seed))
    u = rng.random((n, k))
    u /= u.sum(axis=1, keepdims=True)
    cent = np.zeros((k, mm.shape[1]))
    for _ in range(int(max_iter)):
        um = u ** f
        cent = (um.T @ mm) / um.sum(axis=0)[:, None]
        d = np.maximum(
            ((mm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2),
            1e-12,
        ) ** 0.5
        inv = d ** (-2.0 / (f - 1.0))
        new_u = inv / inv.sum(axis=1, keepdims=True)
        if np.abs(new_u - u).max() < 1e-9:
            u = new_u
            break
        u = new_u
    labels = u.argmax(axis=1).astype(np.float64)
    return {"type": "fuzzyKmeans", "centroids": cent, "labels": labels,
            "membership": u, "data": mm}


def _dbscan(m, eps, min_pts) -> Dict:
    """DBSCAN (DbscanEvaluator): labels ≥ 0 are clusters, -1 is noise."""
    mm = _mat(m)
    n = mm.shape[0]
    eps2 = float(eps) ** 2
    min_pts = int(min_pts)
    d2 = ((mm[:, None, :] - mm[None, :, :]) ** 2).sum(axis=2)
    neigh = [np.nonzero(d2[i] <= eps2)[0] for i in range(n)]
    labels = np.full(n, -2, dtype=np.int64)  # -2 unvisited
    cid = -1
    for i in range(n):
        if labels[i] != -2:
            continue
        if len(neigh[i]) < min_pts:
            labels[i] = -1
            continue
        cid += 1
        labels[i] = cid
        stack = list(neigh[i])
        while stack:
            j = stack.pop()
            if labels[j] == -1:
                labels[j] = cid
            if labels[j] != -2:
                continue
            labels[j] = cid
            if len(neigh[j]) >= min_pts:
                stack.extend(neigh[j])
    cents = []
    for c in range(cid + 1):
        sel = mm[labels == c]
        cents.append(sel.mean(axis=0))
    cent = np.vstack(cents) if cents else np.zeros((0, mm.shape[1]))
    return {"type": "dbscan", "centroids": cent,
            "labels": labels.astype(np.float64), "data": mm}


def _get_centroids(model) -> np.ndarray:
    return np.asarray(model["centroids"], dtype=np.float64)


def _get_cluster(model, i) -> np.ndarray:
    data = np.asarray(model["data"], dtype=np.float64)
    labels = np.asarray(model["labels"])
    return data[labels == float(int(i))]


def _get_membership(model) -> np.ndarray:
    if "membership" not in model:
        raise EvalError("model has no membership matrix")
    return np.asarray(model["membership"], dtype=np.float64)


# ---------------------------------------------------------------------------
# Markov chains + distributions
# ---------------------------------------------------------------------------


def _markov_chain(m, states=None) -> Dict:
    """MarkovChainEvaluator: row-stochastic transition matrix model."""
    p = _mat(m)
    if p.shape[0] != p.shape[1]:
        raise EvalError("markovChain needs a square matrix")
    rows = p.sum(axis=1)
    if not np.allclose(rows, 1.0, atol=1e-9):
        p = p / rows[:, None]  # normalize like the reference's builder
    return {"type": "markovChain", "transitions": p,
            "states": list(states) if states is not None else None}


def _dist_normal(mean, sd=None) -> Dict:
    if sd is None:  # normalDistribution(vector) fits mean/sd
        v = _vec(mean)
        return {"type": "normal", "mean": float(np.mean(v)),
                "sd": float(np.std(v, ddof=1))}
    return {"type": "normal", "mean": float(mean), "sd": float(sd)}


def _dist_uniform(lo, hi) -> Dict:
    return {"type": "uniform", "lo": float(lo), "hi": float(hi)}


def _dist_binomial(p, n) -> Dict:
    return {"type": "binomial", "n": int(n), "p": float(p)}


def _dist_poisson(mean) -> Dict:
    return {"type": "poisson", "mean": float(mean)}


def _dist_empirical(v) -> Dict:
    """Exact ECDF model (the reference bins through commons-math
    EmpiricalDistribution; the exact ECDF is the bin-free limit and is
    what the SQL oracle can replay)."""
    return {"type": "empirical", "values": np.sort(_vec(v))}


def _dist_enumerated(values, probs=None) -> Dict:
    v = _vec(values)
    if probs is None:
        uniq, counts = np.unique(v, return_counts=True)
        return {"type": "enumerated", "values": uniq,
                "probs": counts / counts.sum()}
    p = _vec(probs)
    return {"type": "enumerated", "values": v, "probs": p / p.sum()}


def _dist_gamma(shape, scale) -> Dict:
    return {"type": "gamma", "shape": float(shape), "scale": float(scale)}


def _dist_lognormal(scale, shape) -> Dict:
    """logNormalDistribution(scale, shape): commons-math parameter order
    — scale = mean of the log, shape = std of the log."""
    return {"type": "lognormal", "mu": float(scale), "sigma": float(shape)}


def _dist_weibull(shape, scale) -> Dict:
    return {"type": "weibull", "shape": float(shape), "scale": float(scale)}


def _dist_triangular(lo, mode, hi) -> Dict:
    return {"type": "triangular", "lo": float(lo), "mode": float(mode),
            "hi": float(hi)}


def _dist_geometric(p) -> Dict:
    return {"type": "geometric", "p": float(p)}


def _dist_zipf(size, exponent) -> Dict:
    n, s = int(size), float(exponent)
    w = np.arange(1, n + 1, dtype=np.float64) ** (-s)
    return {"type": "enumerated",
            "values": np.arange(1, n + 1, dtype=np.float64),
            "probs": w / w.sum()}


def _probability(dist, x, x2=None) -> float:
    """probability(dist, x): pmf for discrete; probability(dist, lo, hi)
    = P(lo < X <= hi) for continuous (the reference's two-arg form)."""
    t = dist["type"]
    if x2 is not None:
        return _cumulative(dist, x2) - _cumulative(dist, x)
    if t == "binomial":
        n, p, kk = dist["n"], dist["p"], int(x)
        if kk < 0 or kk > n:
            return 0.0
        return float(math.comb(n, kk) * p ** kk * (1 - p) ** (n - kk))
    if t == "poisson":
        lam, kk = dist["mean"], int(x)
        if kk < 0:
            return 0.0
        return float(math.exp(
            -lam + kk * math.log(lam) - math.lgamma(kk + 1)))
    if t == "enumerated":
        sel = np.isclose(dist["values"], float(x))
        return float(dist["probs"][sel].sum())
    if t == "geometric":
        kk, p = int(x), dist["p"]
        return float(p * (1.0 - p) ** kk) if kk >= 0 else 0.0
    raise EvalError(f"probability() undefined for {t}; use "
                    "cumulativeProbability or the two-arg range form")


def _cumulative(dist, x) -> float:
    t, x = dist["type"], float(x)
    if t == "normal":
        return _norm_cdf((x - dist["mean"]) / dist["sd"])
    if t == "uniform":
        lo, hi = dist["lo"], dist["hi"]
        return float(min(1.0, max(0.0, (x - lo) / (hi - lo))))
    if t == "binomial":
        k = math.floor(x)
        if k < 0:
            return 0.0
        if k >= dist["n"]:
            return 1.0
        # I_{1-p}(n-k, k+1)
        return _betainc(dist["n"] - k, k + 1, 1.0 - dist["p"])
    if t == "poisson":
        k = math.floor(x)
        if k < 0:
            return 0.0
        return 1.0 - _gammainc_lower(k + 1.0, dist["mean"])
    if t == "empirical":
        v = dist["values"]
        return float(np.searchsorted(v, x, side="right") / len(v))
    if t == "enumerated":
        return float(dist["probs"][dist["values"] <= x].sum())
    if t == "gamma":
        if x <= 0:
            return 0.0
        return _gammainc_lower(dist["shape"], x / dist["scale"])
    if t == "lognormal":
        if x <= 0:
            return 0.0
        return _norm_cdf((math.log(x) - dist["mu"]) / dist["sigma"])
    if t == "weibull":
        if x <= 0:
            return 0.0
        return 1.0 - math.exp(-((x / dist["scale"]) ** dist["shape"]))
    if t == "triangular":
        lo, mo, hi = dist["lo"], dist["mode"], dist["hi"]
        if x <= lo:
            return 0.0
        if x >= hi:
            return 1.0
        if x <= mo:
            return (x - lo) ** 2 / ((hi - lo) * (mo - lo))
        return 1.0 - (hi - x) ** 2 / ((hi - lo) * (hi - mo))
    if t == "geometric":
        k = math.floor(x)
        return 1.0 - (1.0 - dist["p"]) ** (k + 1) if k >= 0 else 0.0
    raise EvalError(f"cumulativeProbability undefined for {t}")


def _sample(model, n=1, seed=0):
    """sample(distribution | markovChain, n): n draws (seeded rng — the
    reference uses an unseeded RNG; determinism is this engine's
    reproducibility contract)."""
    rng = np.random.default_rng(int(seed))
    n = int(n)
    t = model["type"]
    if t == "markovChain":
        p = model["transitions"]
        k = p.shape[0]
        out = np.empty(n, dtype=np.float64)
        state = int(rng.integers(k))
        for i in range(n):
            state = int(rng.choice(k, p=p[state]))
            out[i] = state
        return out
    if t == "normal":
        return rng.normal(model["mean"], model["sd"], size=n)
    if t == "uniform":
        return rng.uniform(model["lo"], model["hi"], size=n)
    if t == "binomial":
        return rng.binomial(model["n"], model["p"], size=n).astype(
            np.float64)
    if t == "poisson":
        return rng.poisson(model["mean"], size=n).astype(np.float64)
    if t == "empirical":
        return rng.choice(model["values"], size=n)
    if t == "enumerated":
        return rng.choice(model["values"], size=n, p=model["probs"])
    if t == "gamma":
        return rng.gamma(model["shape"], model["scale"], size=n)
    if t == "lognormal":
        return rng.lognormal(model["mu"], model["sigma"], size=n)
    if t == "weibull":
        return model["scale"] * rng.weibull(model["shape"], size=n)
    if t == "triangular":
        return rng.triangular(model["lo"], model["mode"], model["hi"],
                              size=n)
    if t == "geometric":
        return (rng.geometric(model["p"], size=n) - 1).astype(np.float64)
    if t == "beta":
        return rng.beta(model["alpha"], model["beta"], size=n)
    if t == "constant":
        return np.full(n, model["value"], dtype=np.float64)
    if t == "uniform_int":
        return rng.integers(model["lo"], model["hi"] + 1,
                            size=n).astype(np.float64)
    if t == "mvn":
        return rng.multivariate_normal(model["means"], model["cov"],
                                       size=n)
    raise EvalError(f"sample() undefined for {t}")


# ---------------------------------------------------------------------------
# significance tests
# ---------------------------------------------------------------------------


def _ttest(a, b) -> Dict[str, float]:
    """Welch two-sample t-test (commons-math TTest.tTest(double[],
    double[]) uses the unequal-variance form)."""
    x, y = _vec(a), _vec(b)
    n1, n2 = len(x), len(y)
    v1, v2 = np.var(x, ddof=1), np.var(y, ddof=1)
    se2 = v1 / n1 + v2 / n2
    t = float((np.mean(x) - np.mean(y)) / math.sqrt(se2))
    df = se2 ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    return {"t-statistic": t, "p-value": _t_sf2(t, float(df))}


def _paired_ttest(a, b) -> Dict[str, float]:
    d = _vec(a) - _vec(b)
    n = len(d)
    t = float(np.mean(d) / (np.std(d, ddof=1) / math.sqrt(n)))
    return {"t-statistic": t, "p-value": _t_sf2(t, float(n - 1))}


def _mann_whitney(a, b) -> Dict[str, float]:
    """Mann-Whitney U with normal approximation + tie correction
    (MannWhitneyUTest)."""
    x, y = _vec(a), _vec(b)
    n1, n2 = len(x), len(y)
    allv = np.concatenate([x, y])
    order = allv.argsort(kind="mergesort")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u = max(u1, n1 * n2 - u1)
    # tie-corrected variance
    _, counts = np.unique(sv, return_counts=True)
    nn = n1 + n2
    tie = ((counts ** 3 - counts).sum()) / (nn * (nn - 1.0))
    var = n1 * n2 / 12.0 * ((nn + 1.0) - tie)
    mu = n1 * n2 / 2.0
    z = (u - mu) / math.sqrt(var) if var > 0 else 0.0
    p = 2.0 * (1.0 - _norm_cdf(abs(z)))
    return {"u-statistic": float(u), "p-value": float(min(1.0, p))}


def _chi_square_dataset(a, b) -> Dict[str, float]:
    """ChiSquareDataSetEvaluator: commons-math
    chiSquareTestDataSetsComparison of two observed count arrays."""
    o1, o2 = _vec(a), _vec(b)
    if len(o1) != len(o2):
        raise EvalError("count arrays must be the same length")
    s1, s2 = o1.sum(), o2.sum()
    ratio = math.sqrt(s1 / s2)
    mask = (o1 + o2) > 0
    stat = float(np.sum(
        (o1[mask] / ratio - o2[mask] * ratio) ** 2 / (o1[mask] + o2[mask])
    ))
    df = float(mask.sum() - 1)
    p = 1.0 - _gammainc_lower(df / 2.0, stat / 2.0)
    return {"chisquare-statistic": stat, "p-value": float(p)}


def _gtest_dataset(a, b) -> Dict[str, float]:
    """GTestDataSetEvaluator: 2×k G-test of independence of two count
    rows (commons-math GTest.gTestDataSetsComparison)."""
    o1, o2 = _vec(a), _vec(b)
    if len(o1) != len(o2):
        raise EvalError("count arrays must be the same length")
    total = o1.sum() + o2.sum()
    colsum = o1 + o2
    g = 0.0
    for row in (o1, o2):
        rs = row.sum()
        for j in range(len(row)):
            if row[j] > 0:
                e = rs * colsum[j] / total
                g += row[j] * math.log(row[j] / e)
    g *= 2.0
    df = float(len(o1) - 1)
    p = 1.0 - _gammainc_lower(df / 2.0, g / 2.0)
    return {"G-statistic": float(g), "p-value": float(p)}


def _ks(a, b) -> Dict[str, float]:
    """kolmogorovSmirnov(dist, vector) one-sample or (vector, vector)
    two-sample; asymptotic p-value via the KS series."""
    y = _vec(b)
    y = np.sort(y)
    n2 = len(y)
    if isinstance(a, dict):  # one-sample vs a distribution
        cdf = np.array([_cumulative(a, v) for v in y])
        d_plus = np.max(np.arange(1, n2 + 1) / n2 - cdf)
        d_minus = np.max(cdf - np.arange(0, n2) / n2)
        d = float(max(d_plus, d_minus))
        ne = float(n2)
    else:
        x = np.sort(_vec(a))
        n1 = len(x)
        allv = np.concatenate([x, y])
        c1 = np.searchsorted(x, allv, side="right") / n1
        c2 = np.searchsorted(y, allv, side="right") / n2
        d = float(np.max(np.abs(c1 - c2)))
        ne = n1 * n2 / (n1 + n2)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    p = 2.0 * sum(
        (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        for j in range(1, 101)
    )
    return {"d-statistic": d, "p-value": float(min(max(p, 0.0), 1.0))}


# ---------------------------------------------------------------------------
# DSP / smoothing extras
# ---------------------------------------------------------------------------


def _mad(v) -> float:
    """Median absolute deviation (MadEvaluator)."""
    a = _vec(v)
    return float(np.median(np.abs(a - np.median(a))))


def _outliers(dist, v, lo, hi) -> List[float]:
    """outliers(dist, vector, lowProb, highProb): values whose CDF falls
    outside [lowProb, highProb]."""
    a = _vec(v)
    out = []
    for x in a:
        c = _cumulative(dist, float(x))
        if c < float(lo) or c > float(hi):
            out.append(float(x))
    return np.asarray(out, dtype=np.float64)


def _oscillate(amplitude, ang_freq, phase, length=128) -> np.ndarray:
    """OscillateEvaluator: amplitude·sin(angularFreq·i + phase) sampled
    at i = 0..length-1 (the reference emits a 128-sample wave)."""
    i = np.arange(int(length), dtype=np.float64)
    return float(amplitude) * np.sin(float(ang_freq) * i + float(phase))


def _harmonic_fit(v) -> np.ndarray:
    """HarmonicFitEvaluator: least-squares sine fit — frequency from the
    FFT peak, amplitude/phase from the linear sin/cos regression; returns
    the fitted wave over the input's sample points."""
    y = _vec(v)
    n = len(y)
    yc = y - y.mean()
    spec = np.abs(np.fft.rfft(yc))
    if len(spec) > 1:
        kpeak = 1 + int(np.argmax(spec[1:]))
    else:
        kpeak = 0
    w = 2.0 * math.pi * kpeak / n
    i = np.arange(n, dtype=np.float64)
    A = np.column_stack([np.sin(w * i), np.cos(w * i),
                         np.ones(n)])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    return A @ coef


def _loess(x, y=None, bandwidth=0.25) -> np.ndarray:
    """LoessEvaluator: tricube-weighted local linear regression
    (commons-math LoessInterpolator defaults: bandwidth 0.3 — callers
    pass their own; single-vector form uses 0..n-1 as x)."""
    if y is None:
        yv = _vec(x)
        xv = np.arange(len(yv), dtype=np.float64)
    else:
        xv, yv = _vec(x), _vec(y)
    n = len(xv)
    k = max(2, int(math.ceil(float(bandwidth) * n)))
    out = np.empty(n)
    order = np.argsort(xv, kind="mergesort")
    xs, ys = xv[order], yv[order]
    for idx in range(n):
        d = np.abs(xs - xs[idx])
        cut = np.partition(d, k - 1)[k - 1]
        w = np.clip(1.0 - (d / max(cut, 1e-12)) ** 3, 0.0, None) ** 3
        sw = w.sum()
        xm = (w * xs).sum() / sw
        ym = (w * ys).sum() / sw
        sxx = (w * (xs - xm) ** 2).sum()
        slope = (w * (xs - xm) * (ys - ym)).sum() / sxx if sxx > 0 else 0.0
        out[idx] = ym + slope * (xs[idx] - xm)
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    return out[inv]


def _spline(x, y) -> Dict:
    """SplineEvaluator: natural cubic spline model; use predict()."""
    xv, yv = _vec(x), _vec(y)
    n = len(xv)
    if n < 3:
        raise EvalError("spline needs >= 3 points")
    order = np.argsort(xv)
    xs, ys = xv[order], yv[order]
    h = np.diff(xs)
    # tridiagonal solve for second derivatives (natural boundary)
    a = np.zeros((n, n))
    r = np.zeros(n)
    a[0, 0] = a[-1, -1] = 1.0
    for i in range(1, n - 1):
        a[i, i - 1] = h[i - 1]
        a[i, i] = 2.0 * (h[i - 1] + h[i])
        a[i, i + 1] = h[i]
        r[i] = 3.0 * ((ys[i + 1] - ys[i]) / h[i]
                      - (ys[i] - ys[i - 1]) / h[i - 1])
    c = np.linalg.solve(a, r)
    return {"type": "spline", "x": xs, "y": ys, "c": c, "h": h}


def _spline_predict(model, x):
    xs, ys, c, h = model["x"], model["y"], model["c"], model["h"]
    b = np.diff(ys) / h - h * (2.0 * c[:-1] + c[1:]) / 3.0
    d = np.diff(c) / (3.0 * h)

    def one(v: float) -> float:
        i = int(np.clip(np.searchsorted(xs, v) - 1, 0, len(h) - 1))
        dx = v - xs[i]
        return float(ys[i] + b[i] * dx + c[i] * dx * dx + d[i] * dx ** 3)

    if np.isscalar(x) or isinstance(x, float):
        return one(float(x))
    return np.array([one(float(v)) for v in _vec(x)])


ML_FUNCS = {
    # clustering
    "kmeans": _kmeans,
    "multiKmeans": _multi_kmeans,
    "fuzzyKmeans": _fuzzy_kmeans,
    "dbscan": _dbscan,
    "getCentroids": _get_centroids,
    "getCluster": _get_cluster,
    "getMembershipMatrix": _get_membership,
    # markov + distributions
    "markovChain": _markov_chain,
    "sample": _sample,
    "normalDistribution": _dist_normal,
    "uniformDistribution": _dist_uniform,
    "binomialDistribution": _dist_binomial,
    "poissonDistribution": _dist_poisson,
    "empiricalDistribution": _dist_empirical,
    "enumeratedDistribution": _dist_enumerated,
    "zipFDistribution": _dist_zipf,
    "gammaDistribution": _dist_gamma,
    "logNormalDistribution": _dist_lognormal,
    "weibullDistribution": _dist_weibull,
    "triangularDistribution": _dist_triangular,
    "geometricDistribution": _dist_geometric,
    "probability": _probability,
    "cumulativeProbability": _cumulative,
    # significance tests
    "ttest": _ttest,
    "pairedTtest": _paired_ttest,
    "mannWhitney": _mann_whitney,
    "chiSquareDataSet": _chi_square_dataset,
    "gtestDataSet": _gtest_dataset,
    "kolmogorovSmirnov": _ks,
    "ks": _ks,
    # DSP / smoothing
    "mad": _mad,
    "outliers": _outliers,
    "oscillate": _oscillate,
    "harmonicFit": _harmonic_fit,
    "harmfit": _harmonic_fit,
    "loess": _loess,
    "spline": _spline,
}


# ---------------------------------------------------------------------------
# round 5: labeled matrices, termVectors/topFeatures, monteCarlo support,
# remaining distributions + tests
# ---------------------------------------------------------------------------


class LabeledMatrix(np.ndarray):
    """2-D float matrix carrying row/column labels and attributes — the
    reference's ``Matrix`` object (``solr/solrj/.../io/eval/Matrix.java``
    rowLabels/columnLabels/attributes).  A plain ndarray everywhere else,
    so every existing matrix evaluator accepts it."""

    def __new__(cls, data, column_labels=None, row_labels=None,
                attributes=None):
        obj = np.asarray(data, dtype=np.float64).view(cls)
        obj.column_labels = list(column_labels or [])
        obj.row_labels = list(row_labels or [])
        obj.attributes = dict(attributes or {})
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.column_labels = getattr(obj, "column_labels", [])
        self.row_labels = getattr(obj, "row_labels", [])
        self.attributes = getattr(obj, "attributes", {})


def _term_vectors(tuples, min_term_length=3, min_doc_freq=0.05,
                  max_doc_freq=0.5, exclude=None):
    """``TermVectorsEvaluator.java:35``: TF-IDF matrix over doc tuples
    carrying a ``terms`` list — vocabulary windowed to
    [minDocFreq, maxDocFreq] of the doc count, terms shorter than
    minTermLength (or containing an exclude substring) dropped; cell =
    sqrt(tf) * (log((N+1)/(df+1)) + 1); column labels are the sorted
    vocabulary, row labels the tuple ids."""
    if not isinstance(tuples, (list, tuple)) or not tuples:
        raise EvalError("termVectors expects a non-empty list of tuples")
    excludes = list(exclude) if isinstance(exclude, (list, tuple)) else (
        [exclude] if exclude else []
    )
    n = len(tuples)
    doc_freqs: Dict[str, int] = {}
    row_labels = []
    doc_term_lists = []
    for tup in tuples:
        terms = tup.get("terms")
        if terms is None:
            raise EvalError("document tuples must contain a terms field")
        row_labels.append(str(tup.get("id", "")))
        doc_term_lists.append(terms)
        for term in set(terms):
            if len(term) < int(min_term_length):
                continue
            if any(x in term for x in excludes):
                continue
            doc_freqs[term] = doc_freqs.get(term, 0) + 1
    lo = int(n * float(min_doc_freq))
    hi = int(n * float(max_doc_freq))
    doc_freqs = {
        t: c for t, c in doc_freqs.items() if lo <= c <= hi
    }
    features = sorted(doc_freqs)
    fidx = {t: i for i, t in enumerate(features)}
    data = np.zeros((n, len(features)), dtype=np.float64)
    for r, terms in enumerate(doc_term_lists):
        tf: Dict[str, int] = {}
        for t in terms:
            if t in doc_freqs:
                tf[t] = tf.get(t, 0) + 1
        for t, f in tf.items():
            df = doc_freqs[t]
            data[r, fidx[t]] = np.sqrt(f) * (
                np.log((n + 1) / (df + 1.0)) + 1.0
            )
    return LabeledMatrix(data, column_labels=features,
                         row_labels=row_labels,
                         attributes={"docFreqs": dict(doc_freqs)})


def _top_features(matrix, k):
    """``TopFeaturesEvaluator.java:35``: per row, the labels of the k
    largest values (descending), zero/negative cells included as the
    reference's plain max-heap does."""
    labels = getattr(matrix, "column_labels", None)
    if not labels:
        raise EvalError(
            "topFeatures expects a matrix with column labels "
            "(termVectors output)"
        )
    m = _mat(matrix)
    k = int(k)
    out = []
    for row in m:
        idx = np.lexsort((np.arange(len(row)), -row))[:k]
        out.append([labels[i] for i in idx])
    return out


def _feature_select(matrix, features):
    """``FeatureSelectEvaluator``: keep only the named feature columns."""
    labels = getattr(matrix, "column_labels", None)
    if not labels:
        raise EvalError("featureSelect expects a labeled matrix")
    want = [f for f in labels if f in set(
        features if isinstance(features, (list, tuple)) else [features]
    )]
    idx = [labels.index(f) for f in want]
    return LabeledMatrix(
        _mat(matrix)[:, idx], column_labels=want,
        row_labels=getattr(matrix, "row_labels", []),
    )


def _knn_matrix(matrix, vec, k, dist="euclidean"):
    """``KnnEvaluator``: the k rows of the matrix nearest to the vector."""
    m = _mat(matrix)
    v = _vec(vec)
    if dist == "cosine":
        num = m @ v
        den = np.linalg.norm(m, axis=1) * (np.linalg.norm(v) or 1.0)
        d = 1.0 - num / np.where(den == 0, 1.0, den)
    else:
        d = np.linalg.norm(m - v[None, :], axis=1)
    idx = np.lexsort((np.arange(len(d)), d))[: int(k)]
    rl = getattr(matrix, "row_labels", [])
    return LabeledMatrix(
        m[idx],
        column_labels=getattr(matrix, "column_labels", []),
        row_labels=[rl[i] for i in idx] if rl else [],
    )


def _get_column_labels(m):
    return list(getattr(m, "column_labels", []) or [])


def _get_row_labels(m):
    return list(getattr(m, "row_labels", []) or [])


def _set_column_labels(m, labels):
    return LabeledMatrix(_mat(m), column_labels=list(labels),
                         row_labels=getattr(m, "row_labels", []))


def _set_row_labels(m, labels):
    return LabeledMatrix(_mat(m), row_labels=list(labels),
                         column_labels=getattr(m, "column_labels", []))


def _get_attribute(m, name):
    return dict(getattr(m, "attributes", {}) or {}).get(name)


def _get_attributes(m):
    return dict(getattr(m, "attributes", {}) or {})


def _dist_beta(alpha, beta) -> Dict:
    return {"type": "beta", "alpha": float(alpha), "beta": float(beta)}


def _dist_constant(value) -> Dict:
    return {"type": "constant", "value": float(value)}


def _dist_uniform_int(lo, hi) -> Dict:
    return {"type": "uniform_int", "lo": int(lo), "hi": int(hi)}


def _dist_mvn(means, cov) -> Dict:
    return {"type": "mvn", "means": _vec(means), "cov": _mat(cov)}


def _anova(*vectors):
    """``AnovaEvaluator``: one-way ANOVA over ≥2 vectors — returns
    {f-ratio, p-value} via the regularized incomplete beta (the same
    textbook route the t-test here uses)."""
    groups = [_vec(v) for v in vectors]
    if len(groups) < 2:
        raise EvalError("anova requires at least two vectors")
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = np.mean(np.concatenate(groups))
    ss_between = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups)
    ss_within = sum(((g - np.mean(g)) ** 2).sum() for g in groups)
    df1, df2 = k - 1, n - k
    if df2 <= 0 or ss_within == 0:
        raise EvalError("anova: degenerate inputs")
    f = (ss_between / df1) / (ss_within / df2)
    # p = 1 - F_cdf(f; df1, df2) via I_x(df2/2, df1/2)
    x = df2 / (df2 + df1 * f)
    p = _betainc(df2 / 2.0, df1 / 2.0, x)
    return {"f-ratio": float(f), "p-value": float(p)}


def _earth_movers(a, b):
    """``EarthMoversEvaluator``: 1-D EMD between two equal-length
    distributions = Σ|running flow|."""
    va, vb = _vec(a), _vec(b)
    if len(va) != len(vb):
        raise EvalError("earthMovers expects equal-length vectors")
    return float(np.abs(np.cumsum(va - vb)[:-1]).sum()) if len(va) > 1 \
        else 0.0


def _akima(x, y):
    """``AkimaEvaluator``: Akima cubic interpolation model (the classic
    1970 slope-weighting construction; public textbook algorithm)."""
    xv, yv = _vec(x), _vec(y)
    if len(xv) < 5:
        raise EvalError("akima requires at least 5 points")
    m = np.diff(yv) / np.diff(xv)
    mm = np.concatenate((
        [2 * m[0] - m[1], 2 * m[0] - m[1]], m,
        [2 * m[-1] - m[-2], 2 * m[-1] - m[-2]],
    ))
    w1 = np.abs(mm[3:] - mm[2:-1])
    w2 = np.abs(mm[1:-2] - mm[:-3])
    den = w1 + w2
    t = np.where(den == 0, (mm[1:-2] + mm[2:-1]) / 2.0,
                 (w1 * mm[1:-2] + w2 * mm[2:-1]) / np.where(den == 0, 1,
                                                            den))
    return {"type": "akima", "x": xv, "y": yv, "t": t}


def _akima_predict(model, x):
    xv, yv, t = model["x"], model["y"], model["t"]
    xq = np.atleast_1d(np.asarray(x, dtype=np.float64))
    i = np.clip(np.searchsorted(xv, xq, side="right") - 1, 0,
                len(xv) - 2)
    h = xv[i + 1] - xv[i]
    d = xq - xv[i]
    m = (yv[i + 1] - yv[i]) / h
    p0, p1 = yv[i], t[i]
    p2 = (3 * m - 2 * t[i] - t[i + 1]) / h
    p3 = (t[i] + t[i + 1] - 2 * m) / h ** 2
    out = p0 + p1 * d + p2 * d ** 2 + p3 * d ** 3
    return out if np.ndim(x) else float(out[0])


def _unitize(x):
    """``UnitEvaluator``: scale rows (matrix) / the vector to length 1."""
    a = np.asarray(x, dtype=np.float64)
    if a.ndim == 2:
        nrm = np.linalg.norm(a, axis=1, keepdims=True)
        return a / np.where(nrm == 0, 1.0, nrm)
    nrm = np.linalg.norm(a)
    return a / (nrm or 1.0)


def _index_of(v, x):
    """``IndexOfEvaluator``: first index of x in the vector, else -1."""
    a = _vec(v)
    hits = np.nonzero(a == float(x))[0]
    return float(hits[0]) if len(hits) else -1.0


def _if_then_else(cond, a, b):
    """``IfThenElseEvaluator`` — vectorized ternary."""
    c = np.asarray(cond)
    if c.ndim == 0:
        return a if bool(c) else b
    return np.where(c.astype(bool), a, b)


def _density(dist, x):
    """``DensityEvaluator``: per-point pdf for continuous distributions
    (pmf for the discrete ones, via probability)."""
    t = dist["type"]
    xv = np.atleast_1d(np.asarray(x, dtype=np.float64))

    def out(v):
        return v if np.ndim(x) else float(v[0])

    if t == "normal":
        m, s = dist["mean"], dist["sd"]
        return out(np.exp(-((xv - m) ** 2) / (2 * s * s))
                   / (s * np.sqrt(2 * np.pi)))
    if t == "uniform":
        lo, hi = dist["lo"], dist["hi"]
        return out(np.where((xv >= lo) & (xv <= hi),
                            1.0 / (hi - lo), 0.0))
    if t == "lognormal":
        mu, sg = dist["mu"], dist["sigma"]
        v = np.where(
            xv > 0,
            np.exp(-((np.log(np.where(xv > 0, xv, 1.0)) - mu) ** 2)
                   / (2 * sg * sg))
            / (np.where(xv > 0, xv, 1.0) * sg * np.sqrt(2 * np.pi)),
            0.0,
        )
        return out(v)
    if t == "gamma":
        k, th = dist["shape"], dist["scale"]
        v = np.where(
            xv > 0,
            np.exp((k - 1) * np.log(np.where(xv > 0, xv, 1.0))
                   - xv / th - math.lgamma(k) - k * np.log(th)),
            0.0,
        )
        return out(v)
    if t == "weibull":
        k, lam = dist["shape"], dist["scale"]
        z = np.where(xv >= 0, xv / lam, 0.0)
        return out(np.where(
            xv >= 0, (k / lam) * z ** (k - 1) * np.exp(-(z ** k)), 0.0))
    if t == "beta":
        a, b = dist["alpha"], dist["beta"]
        lb = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b))
        inside = (xv > 0) & (xv < 1)
        xs = np.where(inside, xv, 0.5)
        return out(np.where(
            inside,
            np.exp(lb + (a - 1) * np.log(xs) + (b - 1) * np.log(1 - xs)),
            0.0,
        ))
    if t == "triangular":
        lo, md, hi = dist["lo"], dist["mode"], dist["hi"]
        up = 2 * (xv - lo) / ((hi - lo) * (md - lo)) if md > lo else 0.0
        dn = 2 * (hi - xv) / ((hi - lo) * (hi - md)) if hi > md else 0.0
        v = np.where((xv >= lo) & (xv <= md), up,
                     np.where((xv > md) & (xv <= hi), dn, 0.0))
        return out(v)
    # discrete: density == pmf
    return out(np.asarray([_probability(dist, float(v)) for v in xv]))


ML_FUNCS.update({
    "termVectors": _term_vectors,
    "topFeatures": _top_features,
    "featureSelect": _feature_select,
    "knn": _knn_matrix,
    "getColumnLabels": _get_column_labels,
    "getRowLabels": _get_row_labels,
    "setColumnLabels": _set_column_labels,
    "setRowLabels": _set_row_labels,
    "getAttribute": _get_attribute,
    "getAttributes": _get_attributes,
    "betaDistribution": _dist_beta,
    "constantDistribution": _dist_constant,
    "uniformIntegerDistribution": _dist_uniform_int,
    "multiVariateNormalDistribution": _dist_mvn,
    "anova": _anova,
    "earthMovers": _earth_movers,
    "akima": _akima,
    "unitize": _unitize,
    "indexOf": _index_of,
    "if": _if_then_else,
    "density": _density,
})
