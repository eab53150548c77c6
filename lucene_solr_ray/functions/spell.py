"""Spell correction from the index term dictionary.

The DirectSpellChecker role (reference ``lucene/suggest/.../spell/
DirectSpellChecker.java``): candidate corrections come straight from the
live term dictionary via fuzzy expansion (no side dictionary), ranked by
(edit distance asc, docFreq desc, term asc); terms already frequent enough
in the index need no correction.
"""

from __future__ import annotations

from typing import List, Tuple

from lucene_solr_ray.search.query import FuzzyQuery
from lucene_solr_ray.search.searcher import Index, _edit_distance_le

__all__ = ["suggest_corrections"]


def _edit_distance(a: str, b: str, cap: int = 3) -> int:
    for k in range(cap + 1):
        if _edit_distance_le(a, b, k):
            return k
    return cap + 1


def suggest_corrections(
    index: Index,
    term: str,
    n: int = 5,
    max_edits: int = 2,
    max_doc_freq_frac: float = 0.01,
) -> List[Tuple[str, int, int]]:
    """[(candidate, edit_distance, df), ...] best-first.

    ``max_doc_freq_frac``: a term present in more than this fraction of
    docs is considered correctly spelled (DirectSpellChecker's
    maxQueryFrequency) and returned as its own sole suggestion."""
    pat = FuzzyQuery(term, max_edits=max_edits)
    stats, exp = index.collect_stats([term], [pat])
    own_df = stats.df.get(term, 0)
    if own_df > max_doc_freq_frac * max(stats.doc_count, 1):
        return [(term, 0, own_df)]
    candidates = [t for t in exp.get(pat, ()) if t != term]
    if not candidates:
        return []
    cstats, _ = index.collect_stats(candidates)
    ranked = sorted(
        (
            (t, _edit_distance(term, t, max_edits), cstats.df.get(t, 0))
            for t in candidates
        ),
        key=lambda x: (x[1], -x[2], x[0]),
    )
    return ranked[:n]
