"""Mergeable sketch aggregates: HyperLogLog distinct counts + exact
distributed quantiles.

The JSON-facet aggregation family beyond sum/avg/min/max/stddev (reference
``solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java``,
``PercentileAgg.java``, ``UniqueAgg.java``; distributed bucket merge in
``FacetFieldMerger.java``):

- :func:`hll_distinct` — classic HLL (2^p registers, blake2b hashing): one
  sketch per batch, register-max merge — the canonical
  partial-then-combine aggregation (sketches are designed mergeable).
- :func:`exact_distinct` — exact via two-level groupby (value → count),
  for when the cardinality itself is modest.
- :func:`quantile` — EXACT distributed quantile: distributed sort + take
  at the rank offset (``floor(q * (n-1))``, lower interpolation) — exact,
  deterministic, and SQL-comparable (``ORDER BY x LIMIT 1 OFFSET r``);
  the approximate-percentile path at 100 TB is a KLL/t-digest sketch in
  the same partial/combine shape as the HLL here.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Optional

import numpy as np
import pyarrow as pa

__all__ = ["HLL", "hll_distinct", "exact_distinct", "quantile"]


class HLL:
    """Minimal HyperLogLog (no sparse mode, no bias table beyond the
    standard small/large range corrections)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of `rest` + 1 — via bit_length
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add_values(self, values) -> None:
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        str(v).encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                for v in values
            ),
            dtype=np.uint64,
            count=len(values),
        )
        if len(hs):
            self.add_hashes(hs)

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -self.registers.astype(np.float64)).sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate distinct count: per-batch HLL partials merged on the
    driver (each partial is 2^p bytes — tiny)."""

    def _sketch(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_values([v for v in t.column(col).to_pylist() if v is not None])
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(_sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for r in parts:
        acc.merge(HLL.from_bytes(r["sketch"], p))
    return acc.cardinality()


def exact_distinct(ds, col: str) -> int:
    vals = ds.unique(col)
    return len(vals) if vals else 0


def quantile(ds, col: str, q: float) -> float:
    """Exact distributed quantile, lower interpolation: the element at
    rank ``floor(q * (n-1))`` of the sorted column."""
    n = ds.count()
    if n == 0:
        raise ValueError("quantile of empty dataset")
    r = int(math.floor(q * (n - 1)))
    # distributed sort, then split at the rank so only the single row at
    # the boundary leaves the cluster (take(r+1) would ship r rows to the
    # driver)
    sorted_ds = ds.select_columns([col]).sort(col)
    _, tail = sorted_ds.split_at_indices([r])
    return tail.take(1)[0][col]


def quantile_approx(ds, col: str, q, bins: int = 2048):
    """Approximate quantile(s) via a mergeable fixed-bin histogram sketch —
    the PercentileAgg scale path (two passes, NO global sort):

    1. min/max aggregate (tiny);
    2. per-batch histogram partials over [min, max] merged by summation
       (histograms are trivially mergeable, like the HLL above);
    3. invert the cumulative histogram at each q — error ≤ (max-min)/bins.

    Accepts a float or a list of floats; returns float or list.
    """
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi <= lo:
        qs = q if isinstance(q, (list, tuple)) else [q]
        out = [lo for _ in qs]
        return out if isinstance(q, (list, tuple)) else out[0]
    width = (hi - lo) / bins

    def _hist(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy()
        v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"hist": pa.array([counts.tobytes()], pa.binary())})

    parts = ds.map_batches(_hist, batch_format="pyarrow").take_all()
    acc = np.zeros(bins, dtype=np.int64)
    for r in parts:
        acc += np.frombuffer(r["hist"], dtype=np.int64)
    cum = np.cumsum(acc)
    n = int(cum[-1])
    qs = q if isinstance(q, (list, tuple)) else [q]
    out = []
    for qq in qs:
        rank = qq * (n - 1)
        b = int(np.searchsorted(cum, rank + 1))
        b = min(b, bins - 1)
        out.append(lo + (b + 0.5) * width)
    return out if isinstance(q, (list, tuple)) else out[0]
