"""KNN text classification over the BM25 index.

The classification-module role (reference ``lucene/classification/`` —
3,065 LoC: ``KNearestNeighborClassifier`` runs a MoreLikeThis query and
majority-votes the top-k neighbors' class field).  Here: MLT term
selection → BM25 top-k → fetch the label column → weighted vote.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional, Tuple

__all__ = ["knn_classify"]


def knn_classify(
    index,
    text: str,
    label_table: str,
    label_col: str,
    id_col: str = "doc_id",
    k: int = 10,
    max_query_terms: int = 15,
    weighted: bool = True,
    similarity=None,
) -> Tuple[Optional[str], float]:
    """(predicted label, confidence = winning weight share)."""
    from lucene_solr_ray.search.fetch import fetch_from_corpus

    hits = index.more_like_this(
        text, k=k, max_query_terms=max_query_terms, similarity=similarity
    )
    if hits.num_rows == 0:
        return None, 0.0
    fetched = fetch_from_corpus(hits, label_table, id_col, [label_col])
    votes: defaultdict = defaultdict(float)
    for row in fetched.to_pylist():
        w = float(row["score"]) if weighted else 1.0
        votes[row[label_col]] += w
    total = sum(votes.values()) or 1.0
    best = max(votes.items(), key=lambda kv: (kv[1], kv[0]))
    return best[0], best[1] / total
