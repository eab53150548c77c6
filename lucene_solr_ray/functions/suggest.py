"""Prefix suggester over the distributed term dictionary.

The suggest-module role (reference ``lucene/suggest/`` — 15,043 LoC:
AnalyzingSuggester/FSTCompletionLookup): completions for a prefix, weighted
by collection term frequency, served from the index's term dictionaries.

Ray shape: one map over the segments' postings *metadata* columns (term,
ttf — no posting lists touched), prefix-filtered per segment, summed via a
small groupby, top-n by (weight desc, term asc).  A fuzzy variant reuses
the FuzzyQuery expansion from the searcher.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import pyarrow as pa

__all__ = ["suggest_terms", "suggest_infix", "free_text_suggest"]


def suggest_terms(index, prefix: str, n: int = 10,
                  max_edits: int = 0) -> List[Tuple[str, int]]:
    """Top-n (term, total ttf) completions for ``prefix`` across segments.

    ``max_edits`` > 0 switches to fuzzy completion on the prefix
    (FuzzySuggester semantics, constant-prefix length 0).
    """
    import ray.data
    from ray.data.aggregate import Sum

    paths = [os.path.join(d, "postings.parquet") for d in index.seg_dirs]
    ds = ray.data.read_parquet(paths, columns=["term", "ttf"])

    if max_edits == 0:
        def _filter(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.starts_with(t.column("term"), prefix))
    else:
        from lucene_solr_ray.search.query import FuzzyQuery
        from lucene_solr_ray.search.searcher import match_terms

        pat = FuzzyQuery(prefix, max_edits=max_edits)

        def _filter(t: pa.Table) -> pa.Table:
            terms = t.column("term").to_pylist()
            keep = set(match_terms(pat, terms))
            mask = pa.array([x in keep for x in terms])
            return t.filter(mask)

    out = (
        ds.map_batches(_filter, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("ttf", alias_name="weight"))
    )
    rows = out.sort(["weight", "term"], descending=[True, False]).take(n)
    return [(r["term"], int(r["weight"])) for r in rows]


def suggest_infix(index, fragment: str, n: int = 10) -> List[Tuple[str, int]]:
    """Infix completions: terms CONTAINING the fragment anywhere, weighted
    by collection ttf (the ``AnalyzingInfixSuggester`` role, reference
    ``lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java`` — it
    indexes term n-grams; over a columnar dictionary a vectorized
    substring scan of the metadata columns does the same job)."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    paths = [os.path.join(d, "postings.parquet") for d in index.seg_dirs]
    ds = ray.data.read_parquet(paths, columns=["term", "ttf"])

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t.column("term"), fragment))

    rows = (
        ds.map_batches(_filter, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("ttf", alias_name="weight"))
        .to_pandas()
    )
    rows = rows.sort_values(["weight", "term"],
                            ascending=[False, True]).head(n)
    return [(r.term, int(r.weight)) for r in rows.itertuples()]


def free_text_suggest(ds, col: str, context: str, n: int = 5,
                      id_col: str = None):
    """FreeTextSuggester (reference ``lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/FreeTextSuggester.java``): an n-gram
    language model over the corpus — given the last context word, rank
    next-word completions by bigram frequency (ties by word asc).

    One distributed pass shingles each doc into (prev, next) pairs and a
    grouped count ranks the continuations; nothing corpus-sized leaves
    the cluster."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    prev = context.strip().split()[-1].lower()

    def _bigrams(t: pa.Table) -> pa.Table:
        nxt = []
        for text in t.column(col).to_pylist():
            toks = (text or "").lower().split()
            for a, b in zip(toks, toks[1:]):
                if a == prev:
                    nxt.append(b)
        return pa.table({"next": pa.array(nxt, pa.string())})

    rows = (
        ds.map_batches(_bigrams, batch_format="pyarrow")
        .groupby("next")
        .aggregate(Count(alias_name="weight"))
        .to_pandas()
    )
    rows = rows.sort_values(["weight", "next"],
                            ascending=[False, True]).head(n)
    return [(r.next, int(r.weight)) for r in rows.itertuples()]
