"""ML streams: feature selection + distributed logistic regression.

The reference's streaming-ML pair (``solr/solrj/src/java/org/apache/solr/
client/solrj/io/stream/FeaturesSelectionStream.java`` and
``TextLogitStream.java``): select the most informative terms for a binary
label by Information Gain, then train a logistic-regression text
classifier with distributed gradient passes.

Ray shape:
- :func:`features_selection` — term/label co-occurrence counts via ONE
  grouped aggregate over exploded (doc, term, label) rows, then the IG
  formula vectorized over the (small) term table; nothing per-doc reaches
  the driver.
- :class:`TextLogit` — iterative batch gradient descent: each iteration
  broadcasts the weight vector (``ray.put``), every batch computes its
  gradient partial with one matmul, partials sum in a tiny aggregate, the
  driver applies the update.  This is the classic broadcast-weights /
  reduce-gradients loop (TextLogitStream runs the same shape through
  Solr's terms + /sql round-trips).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["features_selection", "TextLogit"]


def features_selection(ds, text_col: str, label_col: str, id_col: str,
                       positive_label, top_n: int = 10) -> pd.DataFrame:
    """Top-``top_n`` terms by Information Gain for the binary label.

    IG(t) = H(C) − [P(t)·H(C|t) + P(¬t)·H(C|¬t)] over DOCUMENT presence
    (df-based, as FeaturesSelectionStream's igain works per doc).
    Returns (term, ig) ordered (ig desc, term asc)."""
    from ray.data.aggregate import Count, Sum

    def _explode(t: pa.Table) -> pa.Table:
        # vectorized per-doc DISTINCT terms: one split +
        # dictionary_encode + packed-key unique per batch (no Python
        # token loops, terms stay Arrow)
        import pyarrow.compute as pc

        from lucene_solr_ray.functions.textstats import (
            _distinct_row_codes,
            _token_lists,
        )

        pos_np = pc.fill_null(
            pc.equal(t.column(label_col), pa.scalar(positive_label)), False
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        flat, row_ids, _ = _token_lists(t.column(text_col))
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "pos": pa.array([], pa.int64())}
            )
        ur, uc, dictionary = _distinct_row_codes(flat, row_ids)
        return pa.table(
            {
                "term": dictionary.take(pa.array(uc)),
                "pos": pa.array(pos_np[ur]),
            }
        )

    # per-term (docs-with-term-and-positive, docs-with-term) in ONE
    # grouped aggregate — the (term, pos) pivot never leaves the cluster
    counts_ds = (
        ds.select_columns([text_col, label_col])
        .map_batches(_explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("pos", alias_name="tp"), Count(alias_name="t_total")
        )
    )
    def _lab(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "pos": pc.fill_null(
                pc.equal(t.column(label_col), pa.scalar(positive_label)),
                False,
            ).cast(pa.int64())
        })

    lab = (
        ds.select_columns([label_col])
        .map_batches(_lab, batch_format="pyarrow")
        .groupby("pos")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    n_pos = int(lab[lab["pos"] == 1]["n"].sum())
    n_neg = int(lab[lab["pos"] == 0]["n"].sum())
    n = n_pos + n_neg

    def _score(t: pa.Table) -> pa.Table:
        # IG per term, vectorized over this batch of the grouped table
        def h(p: np.ndarray) -> np.ndarray:
            p = np.clip(p, 1e-12, 1 - 1e-12)
            return -(p * np.log2(p) + (1 - p) * np.log2(1 - p))

        tp = t.column("tp").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        t_total = t.column("t_total").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        h_c = h(np.asarray([n_pos / n]))[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            h_t = h(np.where(t_total > 0, tp / np.maximum(t_total, 1), 0.0))
            rest = n - t_total
            h_nt = h(
                np.where(rest > 0, (n_pos - tp) / np.maximum(rest, 1), 0.0)
            )
        ig = h_c - (t_total / n) * h_t - ((n - t_total) / n) * h_nt
        return pa.table(
            {"term": t.column("term"), "ig": pa.array(ig, pa.float64())}
        )

    # scoring AND the (ig desc, term asc) top-n ranking stay in-cluster —
    # only top_n rows reach the driver (the vocabulary itself can be big)
    out = (
        counts_ds.map_batches(_score, batch_format="pyarrow")
        .sort(["ig", "term"], descending=[True, False])
        .limit(top_n)
        .to_pandas()
    )
    return out.reset_index(drop=True)


class TextLogit:
    """Distributed logistic regression over bag-of-words features.

    ``fit`` runs ``iterations`` of full-batch gradient descent: weights
    broadcast per iteration, per-batch partial gradients (one matmul),
    summed via a tiny aggregate, updated on the driver.  Deterministic
    (fixed feature order, zero init)."""

    def __init__(self, features: Sequence[str], lr: float = 0.5,
                 iterations: int = 20, l2: float = 0.0):
        self.features = list(features)
        self.lr = lr
        self.iterations = iterations
        self.l2 = l2
        self.weights = np.zeros(len(self.features) + 1)  # + bias
        self.history: List[float] = []

    def _design(self, texts: List[str]) -> np.ndarray:
        idx = {t: i for i, t in enumerate(self.features)}
        X = np.zeros((len(texts), len(self.features) + 1))
        X[:, -1] = 1.0  # bias
        for r, text in enumerate(texts):
            for tok in (text or "").split():
                j = idx.get(tok)
                if j is not None:
                    X[r, j] = 1.0  # presence features (igain pairing)
        return X

    def fit(self, ds, text_col: str, label_col: str, positive_label):
        import ray

        feats = self.features
        n_total = ds.count()

        for it in range(self.iterations):
            w_ref = ray.put(self.weights.copy())

            def _grad(t: pa.Table) -> pa.Table:
                w = ray.get(w_ref)
                texts = t.column(text_col).to_pylist()
                y = np.asarray(
                    [1.0 if v == positive_label else 0.0
                     for v in t.column(label_col).to_pylist()]
                )
                X = self._design(texts)
                p = 1.0 / (1.0 + np.exp(-(X @ w)))
                g = X.T @ (p - y)  # (d+1,)
                loss = float(
                    -(y * np.log(np.clip(p, 1e-12, 1))
                      + (1 - y) * np.log(np.clip(1 - p, 1e-12, 1))).sum()
                )
                return pa.table(
                    {
                        "j": pa.array(range(len(g)), pa.int64()),
                        "g": pa.array(g.astype(np.float64)),
                        "loss": pa.array([loss] * len(g)),
                    }
                )

            parts = (
                ds.select_columns([text_col, label_col])
                .map_batches(_grad, batch_format="pyarrow")
                .to_pandas()
            )
            g = parts.groupby("j")["g"].sum().sort_index().to_numpy()
            # each batch emits its loss on every j row; the j==0 slice has
            # exactly one row per batch
            loss = float(parts[parts["j"] == 0]["loss"].sum())
            g = g / n_total + self.l2 * self.weights
            self.weights = self.weights - self.lr * g
            self.history.append(float(loss))
        return self

    def predict_proba(self, texts: List[str]) -> np.ndarray:
        X = self._design(texts)
        return 1.0 / (1.0 + np.exp(-(X @ self.weights)))

    def predict(self, texts: List[str]) -> np.ndarray:
        return (self.predict_proba(texts) >= 0.5).astype(np.int64)
