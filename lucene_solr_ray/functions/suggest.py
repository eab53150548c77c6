"""Suggesters over the distributed term dictionary + free-text n-grams.

The suggest-module role (reference ``lucene/suggest/`` — 15,043 LoC):

- :func:`suggest_terms` — prefix completion weighted by collection ttf
  (FSTCompletionLookup / AnalyzingSuggester's completion core);
- :func:`suggest_infix` — substring completion
  (``AnalyzingInfixSuggester.java`` — it indexes term n-grams; over a
  columnar dictionary a vectorized substring scan does the same job);
- :func:`analyzing_suggest` — analyzer-aware completion: the lookup key
  runs through the index's analyzer chain first
  (``analyzing/AnalyzingSuggester.java:187-210`` analyzes the key into
  its surface form before the FST walk);
- :func:`fuzzy_suggest` — typo-tolerant completion
  (``analyzing/FuzzySuggester.java``): terms whose PREFIX lies within
  ``max_edits`` of the key, with the reference's ``nonFuzzyPrefix`` /
  ``minFuzzyLength`` guards (plain Levenshtein, no transpositions, so a
  SQL oracle can replay it);
- :class:`FreeTextSuggester` — the n-gram language model
  (``analyzing/FreeTextSuggester.java``): the model is built ONCE in one
  distributed pass (the reference's ``build()``), lookups are pruned
  reads of the materialized (prev, next, count) table — no per-call
  corpus re-scan.

Ray shape: everything reads the segments' postings *metadata* columns
(term, ttf — no posting lists touched), filters vectorized per batch,
sums via a small groupby, and ranks with ``sort().take(n)`` IN the
cluster — the term dictionary of a 100 TB corpus is itself big, so no
suggester pulls the grouped vocabulary to the driver.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "suggest_terms",
    "suggest_infix",
    "analyzing_suggest",
    "fuzzy_suggest",
    "FreeTextSuggester",
    "free_text_suggest",
]


def _dict_ds(index):
    import ray.data

    paths = [os.path.join(d, "postings.parquet") for d in index.seg_dirs]
    return ray.data.read_parquet(paths, columns=["term", "ttf"])


def _topn(grouped, n: int, term_col: str = "term") -> List[Tuple[str, int]]:
    """(weight desc, term asc) top-n IN the cluster; only n rows return."""
    rows = grouped.sort(["weight", term_col],
                       descending=[True, False]).take(n)
    return [(r[term_col], int(r["weight"])) for r in rows]


def suggest_terms(index, prefix: str, n: int = 10,
                  max_edits: int = 0) -> List[Tuple[str, int]]:
    """Top-n (term, total ttf) completions for ``prefix`` across segments.

    ``max_edits`` > 0 switches to fuzzy matching of the WHOLE term
    against ``prefix`` (DirectSpellChecker-flavored); for fuzzy
    *completion* (prefix within edits) use :func:`fuzzy_suggest`.
    """
    from ray.data.aggregate import Sum

    ds = _dict_ds(index)

    if max_edits == 0:
        def _filter(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.starts_with(t.column("term"), prefix))
    else:
        from lucene_solr_ray.search.query import FuzzyQuery
        from lucene_solr_ray.search.searcher import match_terms_arrow

        pat = FuzzyQuery(prefix, max_edits=max_edits)

        def _filter(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            col = t.column("term")
            keep = match_terms_arrow(pat, col)
            return t.filter(pc.is_in(col, value_set=pa.array(
                keep, pa.string()
            )))

    out = (
        ds.map_batches(_filter, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("ttf", alias_name="weight"))
    )
    return _topn(out, n)


def suggest_infix(index, fragment: str, n: int = 10) -> List[Tuple[str, int]]:
    """Infix completions: terms CONTAINING the fragment anywhere, weighted
    by collection ttf; top-n ranked in the cluster."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _dict_ds(index)

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t.column("term"), fragment))

    out = (
        ds.map_batches(_filter, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("ttf", alias_name="weight"))
    )
    return _topn(out, n)


def analyzing_suggest(index, key: str, n: int = 10,
                      analyzer=None) -> List[Tuple[str, int]]:
    """Analyzer-aware completion (``AnalyzingSuggester``): the lookup key
    runs through the index's analyzer chain (case folding, stopwords,
    stemming — whatever the index used), and the LAST analyzed token
    prefix-completes over the (already-analyzed) term dictionary."""
    if analyzer is None:
        from lucene_solr_ray.analysis.analyzer import (
            StandardAnalyzer,
            analyzer_from_spec,
        )

        spec = index.manifest.get("analyzer")
        analyzer = (analyzer_from_spec(spec) if spec else None) \
            or StandardAnalyzer()
    toks = analyzer.analyze(key)
    if not toks:
        return []
    last = toks[-1][0] if isinstance(toks[-1], tuple) else toks[-1]
    return suggest_terms(index, last, n=n)


def _prefix_edit_distance(key: str, term: str, max_edits: int) -> int:
    """min over prefixes p of ``term`` of levenshtein(key, p) — the
    FuzzySuggester acceptance test (edits apply to the key, the rest of
    the term is free completion).  Plain Levenshtein (no transpositions)
    so the DuckDB ``levenshtein`` oracle replays it exactly."""
    klen = len(key)
    cap = min(len(term), klen + max_edits)
    prev = np.arange(cap + 1)
    # DP over key (rows) x term-prefix (cols); the answer is the min of
    # the final row = distance to the best term prefix
    row = np.empty(cap + 1, dtype=np.int64)
    for i in range(1, klen + 1):
        row[0] = i
        kc = key[i - 1]
        for j in range(1, cap + 1):
            c = 0 if term[j - 1] == kc else 1
            row[j] = min(prev[j] + 1, row[j - 1] + 1, prev[j - 1] + c)
        prev, row = row.copy(), prev
    return int(prev[1:].min()) if cap >= 1 else int(prev[0])


def fuzzy_suggest(index, key: str, n: int = 10, max_edits: int = 1,
                  prefix_length: int = 1,
                  min_fuzzy_length: int = 3) -> List[Tuple[str, int]]:
    """FuzzySuggester (``analyzing/FuzzySuggester.java``): completions
    whose PREFIX is within ``max_edits`` Levenshtein edits of the key.

    Reference guards preserved: the first ``prefix_length`` characters
    never edit (``nonFuzzyPrefix``), and keys shorter than
    ``min_fuzzy_length`` fall back to exact-prefix completion
    (``minFuzzyLength``).  Candidates prefilter vectorized on the exact
    non-fuzzy prefix; the banded prefix-DP runs only on that small set.
    Weight = collection ttf, ties by term asc, top-n in-cluster."""
    from ray.data.aggregate import Sum

    if len(key) < min_fuzzy_length or max_edits == 0:
        return suggest_terms(index, key, n=n)
    hard = key[:prefix_length]

    def _filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column("term")
        m = pc.starts_with(col, hard)
        # length window: a qualifying term has some prefix of length
        # ≥ len(key) − max_edits
        m = pc.and_(m, pc.greater_equal(
            pc.utf8_length(col), len(key) - max_edits
        ))
        cand = t.filter(m)
        if cand.num_rows == 0:
            return cand
        keep = [
            _prefix_edit_distance(key, s, max_edits) <= max_edits
            for s in cand.column("term").to_pylist()
        ]
        return cand.filter(pa.array(keep))

    out = (
        _dict_ds(index).map_batches(_filter, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("ttf", alias_name="weight"))
    )
    return _topn(out, n)


class FreeTextSuggester:
    """Free-text (n-gram LM) suggester with the reference's build/lookup
    split (``FreeTextSuggester.build()`` walks the corpus ONCE into an
    FST; every ``lookup()`` reads the model).

    ``build`` shingles the corpus into (prev, next) bigram counts in one
    vectorized distributed pass and materializes the model (in the object
    store, or as partitioned parquet when ``model_dir`` is given — the
    resumable form a 100 TB corpus wants).  ``lookup`` filters the model
    to one context word and ranks in-cluster; the corpus is never
    re-scanned."""

    def __init__(self, model_ds=None, model_dir: Optional[str] = None):
        self._model = model_ds
        self.model_dir = model_dir

    @classmethod
    def build(cls, ds, col: str,
              model_dir: Optional[str] = None) -> "FreeTextSuggester":
        from ray.data.aggregate import Count

        def _bigrams(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from lucene_solr_ray.functions.textstats import _token_lists

            flat, row_ids, _ = _token_lists(
                pc.utf8_lower(t.column(col))
            )
            if len(flat) < 2:
                return pa.table(
                    {"prev": pa.array([], pa.string()),
                     "next": pa.array([], pa.string())}
                )
            same_row = pa.array(row_ids[:-1] == row_ids[1:])
            return pa.table(
                {
                    "prev": flat.slice(0, len(flat) - 1).filter(same_row),
                    "next": flat.slice(1).filter(same_row),
                }
            )

        model = (
            ds.map_batches(_bigrams, batch_format="pyarrow")
            .groupby(["prev", "next"])
            .aggregate(Count(alias_name="weight"))
        )
        if model_dir:
            model.write_parquet(model_dir)
            return cls(model_dir=model_dir)
        return cls(model_ds=model.materialize())

    def _model_ds(self):
        if self._model is not None:
            return self._model
        import ray.data

        return ray.data.read_parquet(self.model_dir)

    def lookup(self, context: str, n: int = 5) -> List[Tuple[str, int]]:
        import pyarrow.compute as pc

        prev = context.strip().split()[-1].lower()

        def _filt(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("prev"), prev))

        out = self._model_ds().map_batches(_filt, batch_format="pyarrow")
        return _topn(out, n, term_col="next")


def free_text_suggest(ds, col: str, context: str, n: int = 5,
                      id_col: str = None):
    """One-shot convenience wrapper: build the bigram model (one corpus
    pass) and look up ``context`` — for repeated lookups build a
    :class:`FreeTextSuggester` once and reuse it."""
    return FreeTextSuggester.build(ds, col).lookup(context, n=n)


def blended_infix_suggest(
    entries, fragment: str, n: int = 10, blender: str = "linear",
    exponent: float = 2.0, text_col: str = "text",
    weight_col: str = "weight", id_col: str = "doc_id",
):
    """``BlendedInfixSuggester`` (reference ``lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java:58``): suggestions whose TEXT contains a
    token starting with ``fragment``, ranked by
    ``weight × coefficient(position of the first matching token)`` —
    linear ``1 − 0.10·pos``, reciprocal ``1/(pos+1)``, or exponential
    reciprocal ``1/(pos+1)^e``.

    Ray shape: one vectorized ``map_batches`` computes each entry's
    first-match position + blended score (per-batch partial top-n), then
    a tiny global sort — no full materialization.  Returns a pa.Table
    (id, score) of the top ``n`` (score desc, id asc)."""
    import numpy as np

    frag = fragment.lower()

    def coef(pos: "np.ndarray") -> "np.ndarray":
        if blender == "linear":
            return 1.0 - 0.10 * pos
        if blender == "reciprocal":
            return 1.0 / (pos + 1.0)
        if blender == "exponential_reciprocal":
            return 1.0 / np.power(pos + 1.0, exponent)
        raise ValueError(f"unknown blender {blender!r}")

    def _score(t: pa.Table) -> pa.Table:
        ids, scores = [], []
        ws = t.column(weight_col).to_numpy(zero_copy_only=False)
        for rid, text, w in zip(t.column(id_col).to_pylist(),
                                t.column(text_col).to_pylist(), ws):
            toks = (text or "").lower().split()
            pos = next((i for i, tk in enumerate(toks)
                        if tk.startswith(frag)), None)
            if pos is None:
                continue
            ids.append(rid)
            scores.append(float(w) * float(coef(np.float64(pos))))
        if not ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        tb = pa.table({id_col: pa.array(ids, pa.int64()),
                       "score": pa.array(scores, pa.float64())})
        # per-batch partial top-n: only n rows leave each task
        order = pa.compute.sort_indices(
            tb, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )[:n]
        return tb.take(order)

    parts = entries.map_batches(_score, batch_format="pyarrow").take_all()
    rows = sorted(parts, key=lambda r: (-r["score"], r[id_col]))[:n]
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows], pa.int64()),
        "score": pa.array([round(r["score"], 4) for r in rows],
                          pa.float64()),
    })
