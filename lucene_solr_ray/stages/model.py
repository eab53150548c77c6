"""ModelStream + ClassifyStream — stored-model scoring over a Dataset.

Reference: ``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
ModelStream.java`` (fetch the latest cached logistic-regression model
tuple from a model collection) and ``solr/core/src/java/org/apache/solr/
handler/ClassifyStream.java`` (classify each doc tuple with it).

Model tuples carry the reference's exact fields — ``terms_ss``,
``weights_ds`` (bias FIRST, as ClassifyStream's ``tfidfs.add(1.0)`` bias
slot expects), ``idfs_ds``, ``iteration_i`` — stored as one parquet row
per saved generation under a models directory; ``model_stream`` returns
the highest-iteration row for an id (ModelStream's sort-by-iteration-desc
fetch).

ClassifyStream scoring (ClassifyStream.java:140-176, replicated exactly):
``tf_i = 1 + ln(count_i)`` when the model term occurs (else 0),
``feature_i = idf_i * tf_i``, ``total = w0 + Σ feature_i * w_{i+1}``,
``probability_d = sigmoid(total)``, ``score_d = total / sqrt(termCount)``
with termCount = ALL tokens the analyzer emits for the doc.

Ray shape: the model is tiny — loaded once per actor in ``__init__`` and
applied per batch with one dense matmul; no shuffle.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["save_model", "load_model", "model_stream", "classify_stream"]

_MODEL_SCHEMA = pa.schema(
    [
        ("model_id", pa.string()),
        ("iteration_i", pa.int64()),
        ("terms_ss", pa.list_(pa.string())),
        ("weights_ds", pa.list_(pa.float64())),
        ("idfs_ds", pa.list_(pa.float64())),
    ]
)


def save_model(
    model_dir: str,
    model_id: str,
    terms: Sequence[str],
    weights: Sequence[float],
    idfs: Optional[Sequence[float]] = None,
    iteration: int = 0,
) -> str:
    """Persist one model generation (UpdateStream into the model
    collection).  ``weights`` is bias-first, length ``len(terms) + 1``."""
    if len(weights) != len(terms) + 1:
        raise ValueError("weights must be bias-first: len(terms) + 1")
    os.makedirs(model_dir, exist_ok=True)
    idfs = list(idfs) if idfs is not None else [1.0] * len(terms)
    path = os.path.join(model_dir, f"{model_id}-{iteration}.parquet")
    pq.write_table(
        pa.table(
            {
                "model_id": pa.array([model_id]),
                "iteration_i": pa.array([int(iteration)], pa.int64()),
                "terms_ss": pa.array([list(terms)], pa.list_(pa.string())),
                "weights_ds": pa.array(
                    [[float(w) for w in weights]], pa.list_(pa.float64())
                ),
                "idfs_ds": pa.array(
                    [[float(v) for v in idfs]], pa.list_(pa.float64())
                ),
            },
            schema=_MODEL_SCHEMA,
        ),
        path,
    )
    return path


def load_model(model_dir: str, model_id: str) -> Dict:
    """The latest-iteration model tuple for ``model_id`` (ModelStream's
    ``sort="iteration_i desc" rows=1`` fetch + cache semantics)."""
    import pyarrow.dataset as pads

    import pyarrow.compute as pc

    ds = pads.dataset(model_dir, format="parquet")
    t = ds.to_table(filter=pc.field("model_id") == model_id)
    if t.num_rows == 0:
        raise FileNotFoundError(f"model {model_id!r} not in {model_dir}")
    i = int(np.argmax(t.column("iteration_i").to_numpy()))
    row = t.slice(i, 1).to_pylist()[0]
    return row


def model_stream(model_dir: str, model_id: str):
    """ModelStream: a one-tuple Dataset carrying the latest model."""
    import ray.data

    return ray.data.from_items([load_model(model_dir, model_id)])


class _ClassifyFn:
    """Actor-pool stage: model loaded once per actor, batch matmul per
    call (the analyzer re-tokenizes exactly as indexing would)."""

    def __init__(self, model: Dict, text_col: str, analyzer=None):
        from lucene_solr_ray.analysis.analyzer import StandardAnalyzer

        self.text_col = text_col
        self.analyzer = analyzer or StandardAnalyzer()
        self.terms: List[str] = list(model["terms_ss"])
        self.t_index = {t: i for i, t in enumerate(self.terms)}
        self.weights = np.asarray(model["weights_ds"], dtype=np.float64)
        self.idfs = np.asarray(model["idfs_ds"], dtype=np.float64)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        n = len(texts)
        tfs = np.zeros((n, len(self.terms)), dtype=np.float64)
        term_counts = np.zeros(n, dtype=np.float64)
        for r, text in enumerate(texts):
            toks = self.analyzer.analyze(text or "")
            term_counts[r] = len(toks)
            for tok in toks:
                j = self.t_index.get(tok)
                if j is not None:
                    tfs[r, j] += 1.0
        nz = tfs > 0
        tfs[nz] = 1.0 + np.log(tfs[nz])
        feats = tfs * self.idfs[None, :]
        total = self.weights[0] + feats @ self.weights[1:]
        prob = 1.0 / (1.0 + np.exp(-total))
        denom = np.sqrt(np.maximum(term_counts, 1.0))
        score = total / denom
        return t.append_column(
            "probability_d", pa.array(prob)
        ).append_column("score_d", pa.array(score))


def classify_stream(ds, model: Dict, text_col: str, analyzer=None,
                    concurrency: Optional[int] = None):
    """ClassifyStream: append ``probability_d`` / ``score_d`` to every doc
    tuple using a stored logistic-regression model."""
    if concurrency:
        return ds.map_batches(
            _ClassifyFn, fn_constructor_args=(model, text_col, analyzer),
            batch_format="pyarrow", concurrency=concurrency,
        )
    return ds.map_batches(
        _ClassifyFn(model, text_col, analyzer), batch_format="pyarrow"
    )
