"""Per-segment exhaustive scoring (the COMPLETE-mode oracle).

Evaluates the query AST over one segment with vectorized numpy kernels,
reproducing the reference's scoring contract exactly:

- per-term BM25 with **global** collection stats resolved before scoring
  (``IndexSearcher.java:764-792``; Solr's ``ExactStatsCache`` lesson)
- BooleanQuery: MUST/FILTER intersection, MUST_NOT exclusion,
  minimumNumberShouldMatch, SHOULD-sum accumulated in float64 over
  per-clause float32 scores in clause order, final cast to float32
  (``WANDScorer.score():445-450``, ``DisjunctionSumScorer``)
- boosts multiply into leaf weights (``BoostQuery`` distributes,
  ``BM25Similarity.java:219``)
- PhraseQuery: positions-intersection phrase freq, scored with the summed
  idf of its terms (``PhraseWeight`` + ``Similarity.scorer(boost, collection,
  termStats...)``)
- multi-term queries must be rewritten to primitive term sets *before*
  scoring (see ``searcher.rewrite_query``), mirroring
  ``IndexSearcher.rewrite`` (``:665-672``) + CONSTANT_SCORE_REWRITE.

This exhaustive path is the correctness oracle for the pruned (WAND /
block-max) scorer, exactly as ``CheckHits.checkTopScores``
(``lucene/test-framework/.../CheckHits.java:576-640``) uses
totalHitsThreshold=MAX as the oracle for TOP_SCORES pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from lucene_solr_ray.search.join import (
    ToChildBlockJoinQuery,
    ToParentBlockJoinQuery,
    eval_block_join,
    eval_child_join,
)
from lucene_solr_ray.search.query import (
    BlendedTermQuery,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    ExpressionScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    FunctionScoreQuery,
    CommonTermsQuery,
    IntervalQuery,
    PayloadScoreQuery,
    PhraseQuery,
    PointRangeQuery,
    Query,
    SpanFirstQuery,
    ComplexPhraseQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
)
from lucene_solr_ray.search.similarity import BM25Similarity

__all__ = ["GlobalStats", "score_segment", "topk_segment"]

_EMPTY_I = np.empty(0, dtype=np.int32)
_EMPTY_F = np.empty(0, dtype=np.float32)


@dataclass
class GlobalStats:
    """Collection-wide stats, summed over all segments before any scoring
    (``CollectionStatistics`` + per-term ``TermStatistics``).

    ``df``/``ttf`` are keyed by the TERM-DICTIONARY key (bare term for the
    default field, ``field\x1fterm`` otherwise).  ``field_stats`` carries
    per-field (doc_count, sumTotalTermFreq) for non-default fields; the
    default field uses the top-level numbers."""

    doc_count: int
    sum_total_term_freq: int
    df: Dict[str, int] = field(default_factory=dict)
    ttf: Dict[str, int] = field(default_factory=dict)
    field_stats: Dict[str, Tuple[int, int]] = field(default_factory=dict)

    def collection_for(self, fld: Optional[str]) -> Tuple[int, int]:
        if fld and fld in self.field_stats:
            return self.field_stats[fld]
        return self.doc_count, self.sum_total_term_freq


class _Eval:
    def __init__(self, reader, stats: GlobalStats, sim: BM25Similarity):
        self.reader = reader
        self.stats = stats
        self.sim = sim
        self.norms = reader.norms  # uint8[ndocs]
        self.ndocs = reader.ndocs

    # returns (ords ascending int32, scores float32 aligned)
    def eval(self, q: Query, boost: float) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(q, TermQuery):
            return self._term(q.term, boost, q.field)
        if isinstance(q, BoostQuery):
            return self.eval(q.query, boost * q.boost)
        if isinstance(q, BooleanQuery):
            return self._boolean(q, boost)
        if isinstance(q, PhraseQuery):
            return self._phrase(q, boost)
        if isinstance(q, SynonymQuery):
            return self._synonym(q, boost)
        if isinstance(q, BlendedTermQuery):
            return self._blended(q, boost)
        if isinstance(q, DisjunctionMaxQuery):
            return self._dismax(q, boost)
        if isinstance(q, MatchAllDocsQuery):
            ords = np.arange(self.ndocs, dtype=np.int32)
            dt = self.sim.out_dtype
            return ords, np.full(self.ndocs, dt(boost), dtype=dt)
        if isinstance(q, MatchNoDocsQuery):
            return _EMPTY_I, _EMPTY_F
        if isinstance(q, ConstantScoreQuery):
            ords, _ = self.eval(q.query, 1.0)
            dt = self.sim.out_dtype
            return ords, np.full(len(ords), dt(boost), dtype=dt)
        if isinstance(q, SpanNearQuery):
            return self._span_near(q, boost)
        if isinstance(q, ComplexPhraseQuery):
            return self._complex_phrase(q, boost)
        if isinstance(q, IntervalQuery):
            return self._interval_query(q, boost)
        if isinstance(q, CommonTermsQuery):
            # buildQuery rewrite against the EXACT global stats
            doc_count, _ = self.stats.collection_for(q.field)
            return self.eval(q.build(self.stats.df, doc_count), boost)
        if isinstance(q, (SpanTermQuery, SpanFirstQuery, SpanNotQuery,
                          SpanOrQuery)):
            return self._span_query(q, boost)
        if isinstance(q, PayloadScoreQuery):
            return self._payload_score(q, boost)
        if isinstance(q, ToParentBlockJoinQuery):
            return eval_block_join(self, q, boost)
        if isinstance(q, ToChildBlockJoinQuery):
            return eval_child_join(self, q, boost)
        if isinstance(q, PointRangeQuery):
            return self._point_range(q, boost)
        if isinstance(q, FunctionScoreQuery):
            return self._function_score(q, boost)
        if isinstance(q, ExpressionScoreQuery):
            return self._expression_score(q, boost)
        if isinstance(q, TermInSetQuery):
            # constant-score union (CONSTANT_SCORE_REWRITE semantics)
            all_ords: List[np.ndarray] = []
            for t in q.in_terms:
                p = self.reader.postings(t)
                if p is not None:
                    all_ords.append(p[0])
            if not all_ords:
                return _EMPTY_I, _EMPTY_F
            ords = np.unique(np.concatenate(all_ords)).astype(np.int32)
            dt = self.sim.out_dtype
            return ords, np.full(len(ords), dt(boost), dtype=dt)
        raise TypeError(
            f"unrewritten or unsupported query node: {type(q).__name__}"
        )

    def _span_near(self, q: SpanNearQuery, boost: float):
        """SpanNearQuery over the positions blobs: minimal spans per doc
        (NearSpansOrdered / NearSpansUnordered), span frequency
        Σ 1/(1 + gaps), scored with the summed idf of the span's terms
        (the SpanScorer + sloppyFreq shape).  Matching-doc semantics are
        pytest-oracled against an exhaustive position-tuple scan."""
        from lucene_solr_ray.index.segment import field_term

        keys = [field_term(q.field, t) for t in q.span_terms]
        readers = []
        cand = None
        for k in keys:
            pr = self.reader.positions(k)
            if pr is None:
                return _EMPTY_I, _EMPTY_F
            readers.append(pr)
            cand = pr[0] if cand is None else np.intersect1d(
                cand, pr[0], assume_unique=True
            )
        if cand is None or len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        out_ords: List[int] = []
        out_freqs: List[float] = []
        n = len(keys)
        for d in cand:
            pls = []
            for (ords, posfn) in readers:
                idx = np.searchsorted(ords, d)
                pls.append(posfn(int(idx)))
            f = (
                _span_freq_ordered(pls, q.slop)
                if q.in_order else _span_freq_unordered(pls, q.slop)
            )
            if f > 0:
                out_ords.append(int(d))
                out_freqs.append(f)
        if not out_ords:
            return _EMPTY_I, _EMPTY_F
        ords = np.asarray(out_ords, dtype=np.int32)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        dt = self.sim.out_dtype
        doc_count, sttf = self.stats.collection_for(q.field)
        idf_acc = 0.0
        # each DISTINCT term contributes once — SpanWeight builds its sim
        # weight from a Map<Term,TermStates>, so duplicated clause terms
        # (e.g. SpanNear("x","x")) must not double the idf
        for key in dict.fromkeys(keys):
            idf_acc += float(
                dt(self.sim.idf_value(self.stats.df.get(key, 0), doc_count))
            )
        idf = dt(idf_acc)
        sc = self.sim.scorer_from_idf(boost, idf, doc_count, sttf)
        norms = self.reader.norms_for(q.field) if q.field else self.norms
        return ords, sc.score(freqs, norms[ords])

    def _complex_phrase(self, q: "ComplexPhraseQuery", boost: float):
        """ComplexPhraseQuery: SpanNear semantics with per-slot
        alternative-term sets — each slot's position list for a doc is
        the sorted union of its alternatives' positions (exactly what
        NearSpans sees over a SpanOr subclause); scored like
        ``_span_near`` with the summed distinct idf of the PRESENT
        alternatives (SpanWeight skips absent TermStates)."""
        from lucene_solr_ray.index.segment import field_term

        slot_readers = []
        cand = None
        present: List[str] = []
        for slot in q.slots:
            rs = []
            docs = None
            for t in slot:
                k = field_term(q.field, t)
                pr = self.reader.positions(k)
                if pr is None:
                    continue
                rs.append(pr)
                present.append(k)
                docs = pr[0] if docs is None else np.union1d(docs, pr[0])
            if docs is None or len(docs) == 0:
                return _EMPTY_I, _EMPTY_F
            slot_readers.append(rs)
            cand = docs if cand is None else np.intersect1d(cand, docs)
        if cand is None or len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        out_ords: List[int] = []
        out_freqs: List[float] = []
        for d in cand:
            pls = []
            ok = True
            for rs in slot_readers:
                parts = []
                for (ords, posfn) in rs:
                    i = np.searchsorted(ords, d)
                    if i < len(ords) and ords[i] == d:
                        parts.append(posfn(int(i)))
                if not parts:
                    ok = False
                    break
                pls.append(np.sort(np.concatenate(parts))
                           if len(parts) > 1 else parts[0])
            if not ok:
                continue
            f = (
                _span_freq_ordered(pls, q.slop)
                if q.in_order else _span_freq_unordered(pls, q.slop)
            )
            if f > 0:
                out_ords.append(int(d))
                out_freqs.append(f)
        if not out_ords:
            return _EMPTY_I, _EMPTY_F
        ords = np.asarray(out_ords, dtype=np.int32)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        dt = self.sim.out_dtype
        doc_count, sttf = self.stats.collection_for(q.field)
        idf_acc = 0.0
        for key in dict.fromkeys(present):
            idf_acc += float(
                dt(self.sim.idf_value(self.stats.df.get(key, 0), doc_count))
            )
        sc = self.sim.scorer_from_idf(boost, dt(idf_acc), doc_count, sttf)
        norms = self.reader.norms_for(q.field) if q.field else self.norms
        return ords, sc.score(freqs, norms[ords])

    def _interval_query(self, q: IntervalQuery, boost: float):
        """IntervalQuery over the positions blobs: the source's interval
        algebra (search/intervals.py, ports of the reference
        IntervalFunction advance rules) runs per candidate doc;
        freq = Σ 1/(end − start + 1) (IntervalScorer.java:73), scored
        with the summed distinct-leaf-term idf (buildSimScorer)."""
        from lucene_solr_ray.index.segment import field_term

        leaf_terms = list(dict.fromkeys(q.source.leaves()))
        readers = {}
        # positions load for position_terms(): subtractive sources need
        # the subtrahend's positions even though it never scores
        for t in dict.fromkeys(q.source.position_terms()):
            pr = self.reader.positions(field_term(q.field, t))
            if pr is not None:
                readers[t] = pr
        # candidate docs: each requires()-group needs ≥1 of its terms
        cand = None
        for alts in q.source.requires():
            docs = None
            for t in alts:
                pr = readers.get(t)
                if pr is None:
                    continue
                docs = pr[0] if docs is None else np.union1d(docs, pr[0])
            if docs is None or len(docs) == 0:
                return _EMPTY_I, _EMPTY_F
            cand = docs if cand is None else np.intersect1d(cand, docs)
        if cand is None or len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        out_ords: List[int] = []
        out_freqs: List[float] = []
        for d in cand:
            pos = {}
            for t, (ords, posfn) in readers.items():
                i = np.searchsorted(ords, d)
                if i < len(ords) and ords[i] == d:
                    pos[t] = posfn(int(i))
            ivs = q.source.eval(pos)
            if ivs:
                out_ords.append(int(d))
                out_freqs.append(
                    sum(1.0 / (e - s + 1) for s, e in ivs)
                )
        if not out_ords:
            return _EMPTY_I, _EMPTY_F
        ords = np.asarray(out_ords, dtype=np.int32)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        dt = self.sim.out_dtype
        doc_count, sttf = self.stats.collection_for(q.field)
        idf_acc = 0.0
        for t in leaf_terms:
            key = field_term(q.field, t)
            idf_acc += float(
                dt(self.sim.idf_value(self.stats.df.get(key, 0), doc_count))
            )
        idf = dt(idf_acc)
        sc = self.sim.scorer_from_idf(boost, idf, doc_count, sttf)
        norms = self.reader.norms_for(q.field) if q.field else self.norms
        return ords, sc.score(freqs, norms[ords])

    # -- composable span family (SpanTerm/First/Not/Or over SpanNear) ------

    def _span_candidates(self, q) -> Optional[np.ndarray]:
        """Docs that COULD carry spans of q (sorted ords), None = none."""
        from lucene_solr_ray.index.segment import field_term

        if isinstance(q, SpanTermQuery):
            pr = self.reader.positions(field_term(q.field, q.span_term))
            return pr[0] if pr is not None else None
        if isinstance(q, SpanNearQuery):
            cand = None
            for k in [field_term(q.field, t) for t in q.span_terms]:
                pr = self.reader.positions(k)
                if pr is None:
                    return None
                cand = pr[0] if cand is None else np.intersect1d(
                    cand, pr[0], assume_unique=True
                )
            return cand
        if isinstance(q, SpanFirstQuery):
            return self._span_candidates(q.match)
        if isinstance(q, SpanNotQuery):
            return self._span_candidates(q.include)
        if isinstance(q, SpanOrQuery):
            cands = [self._span_candidates(c) for c in q.clauses]
            cands = [c for c in cands if c is not None and len(c)]
            if not cands:
                return None
            return np.unique(np.concatenate(cands))
        raise TypeError(type(q))

    def _doc_spans(self, q, d: int):
        """Spans of q in doc d: list of (start, end, gaps)."""
        from lucene_solr_ray.index.segment import field_term

        if isinstance(q, SpanTermQuery):
            pr = self.reader.positions(field_term(q.field, q.span_term))
            if pr is None:
                return []
            ords, posfn = pr
            i = np.searchsorted(ords, d)
            if i >= len(ords) or ords[i] != d:
                return []
            return [(int(p), int(p) + 1, 0) for p in posfn(int(i))]
        if isinstance(q, SpanNearQuery):
            pls = []
            for k in [field_term(q.field, t) for t in q.span_terms]:
                pr = self.reader.positions(k)
                if pr is None:
                    return []
                ords, posfn = pr
                i = np.searchsorted(ords, d)
                if i >= len(ords) or ords[i] != d:
                    return []
                pls.append(posfn(int(i)))
            return (
                _span_list_ordered(pls, q.slop)
                if q.in_order else _span_list_unordered(pls, q.slop)
            )
        if isinstance(q, SpanFirstQuery):
            return [
                s for s in self._doc_spans(q.match, d) if s[1] <= q.end
            ]
        if isinstance(q, SpanNotQuery):
            inc = self._doc_spans(q.include, d)
            if not inc:
                return []
            exc = self._doc_spans(q.exclude, d)
            if not exc:
                return inc
            return [
                s for s in inc
                if not any(s[0] < e_e and e_s < s[1] for e_s, e_e, _ in exc)
            ]
        if isinstance(q, SpanOrQuery):
            out = []
            for c in q.clauses:
                out.extend(self._doc_spans(c, d))
            return sorted(out)
        raise TypeError(type(q))

    def _span_query(self, q, boost: float):
        """Generic span scorer: freq(doc) = Σ 1/(1 + gaps) over the doc's
        spans, scored with the summed idf of the leaf terms (SpanWeight +
        SpanScorer shape)."""
        cand = self._span_candidates(q)
        if cand is None or len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        out_ords: List[int] = []
        out_freqs: List[float] = []
        for d in cand:
            spans = self._doc_spans(q, int(d))
            if not spans:
                continue
            out_ords.append(int(d))
            out_freqs.append(sum(1.0 / (1.0 + g) for _, _, g in spans))
        if not out_ords:
            return _EMPTY_I, _EMPTY_F
        ords = np.asarray(out_ords, dtype=np.int32)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        keys = _span_scoring_terms(q)
        fld = _span_field(q)
        dt = self.sim.out_dtype
        doc_count, sttf = self.stats.collection_for(fld)
        idf_acc = 0.0
        # distinct terms only (SpanWeight's Map<Term,TermStates>) — see
        # _span_near
        for key in dict.fromkeys(keys):
            idf_acc += float(
                dt(self.sim.idf_value(self.stats.df.get(key, 0), doc_count))
            )
        sc = self.sim.scorer_from_idf(
            boost, dt(idf_acc), doc_count, sttf
        )
        norms = self.reader.norms_for(fld) if fld else self.norms
        return ords, sc.score(freqs, norms[ords])

    def _payload_leaves(self, q) -> List[str]:
        """Positive leaf term-dictionary keys whose occurrences carry the
        payloads a matched span consumes (SpanNot's ``exclude`` never
        contributes — the reference PayloadSpanCollector visits only the
        include side's term positions)."""
        from lucene_solr_ray.index.segment import field_term

        if isinstance(q, SpanTermQuery):
            return [field_term(q.field, q.span_term)]
        if isinstance(q, SpanNearQuery):
            return [field_term(q.field, t) for t in q.span_terms]
        if isinstance(q, SpanFirstQuery):
            return self._payload_leaves(q.match)
        if isinstance(q, SpanNotQuery):
            return self._payload_leaves(q.include)
        if isinstance(q, SpanOrQuery):
            out: List[str] = []
            for c in q.clauses:
                out.extend(self._payload_leaves(c))
            return out
        raise TypeError(type(q))

    def _payload_score(self, q: PayloadScoreQuery, boost: float):
        """PayloadScoreQuery (reference ``queries/payloads/
        PayloadScoreQuery.java``): collect the payloads at leaf-term
        positions inside matched spans, combine with
        Min/Max/Avg/SumPayloadFunction (a doc with spans but zero payloads
        scores the reference's ``docScore`` default of 1), optionally
        multiply by the span score."""
        cand = self._span_candidates(q.span)
        if cand is None or len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        srcs = []
        for key in dict.fromkeys(self._payload_leaves(q.span)):
            pr = self.reader.positions(key)
            py = self.reader.payloads(key)
            if pr is not None and py is not None:
                srcs.append((pr[0], pr[1], py[1]))
        out_ords: List[int] = []
        out_pay: List[float] = []
        for d in cand:
            spans = self._doc_spans(q.span, int(d))
            if not spans:
                continue
            pays = []
            for ords_k, posfn, payfn in srcs:
                i = np.searchsorted(ords_k, d)
                if i >= len(ords_k) or ords_k[i] != d:
                    continue
                pos = posfn(int(i))
                m = np.zeros(len(pos), dtype=bool)
                for s, e, _ in spans:
                    m |= (pos >= s) & (pos < e)
                if m.any():
                    pays.append(payfn(int(i))[m])
            if pays:
                arr = np.concatenate(pays).astype(np.float64)
                if q.func == "min":
                    p = float(arr.min())
                elif q.func == "max":
                    p = float(arr.max())
                elif q.func == "sum":
                    p = float(arr.sum())
                else:  # avg
                    p = float(arr.mean())
            else:
                p = 1.0
            out_ords.append(int(d))
            out_pay.append(p)
        if not out_ords:
            return _EMPTY_I, _EMPTY_F
        ords = np.asarray(out_ords, dtype=np.int32)
        pscores = np.asarray(out_pay, dtype=np.float64)
        dt = self.sim.out_dtype
        if q.include_span_score:
            s_ords, s_scores = self.eval(q.span, boost)
            # identical match sets by construction: align by position
            pos = np.searchsorted(s_ords, ords)
            pscores = pscores * s_scores[pos].astype(np.float64)
        else:
            pscores = pscores * boost
        return ords, pscores.astype(dt)

    def _function_score(self, q: FunctionScoreQuery, boost: float):
        """FunctionScoreQuery: combine inner scores with a per-doc value
        column (docmeta stored col) — multiply/sum/replace."""
        import os as _os

        import pyarrow.parquet as _pq

        ords, scores = self.eval(q.query, boost)
        if len(ords) == 0:
            return ords, scores
        cache = getattr(self.reader, "_value_cols", None)
        if cache is None:
            cache = self.reader._value_cols = {}
        vals = cache.get(q.value_field)
        if vals is None:
            vals = _pq.read_table(
                _os.path.join(self.reader.seg_dir, "docmeta.parquet"),
                columns=[q.value_field],
            ).column(q.value_field).to_numpy().astype(np.float64)
            cache[q.value_field] = vals
        v = vals[ords]
        s64 = scores.astype(np.float64)
        if q.mode == "multiply":
            out = s64 * v
        elif q.mode == "sum":
            out = s64 + v
        elif q.mode == "replace":
            out = v
        else:
            raise ValueError(f"unknown FunctionScore mode {q.mode!r}")
        return ords, out.astype(self.sim.out_dtype)

    def _expression_score(self, q: ExpressionScoreQuery, boost: float):
        """ExpressionScoreQuery: replace inner scores with the compiled
        expression over docmeta columns + ``_score`` (reference
        ExpressionValueSource; the FunctionScoreQuery wrapper's boost
        multiplies the expression value, FunctionScoreQuery.java:180)."""
        import os as _os

        import pyarrow.parquet as _pq

        from lucene_solr_ray.search.expressions import compile_expression

        ords, scores = self.eval(q.query, 1.0)
        if len(ords) == 0:
            return ords, scores
        # per-reader caches: compiled AST + docmeta column arrays
        ecache = getattr(self.reader, "_expr_cache", None)
        if ecache is None:
            ecache = self.reader._expr_cache = {}
        expr = ecache.get(q.source)
        if expr is None:
            expr = ecache[q.source] = compile_expression(q.source)
        cache = getattr(self.reader, "_value_cols", None)
        if cache is None:
            cache = self.reader._value_cols = {}
        bmap = dict(q.bindings)
        # unbound variables fall back to the same-named docmeta column
        # (reference SimpleBindings.add(SortField) implicit binding)
        need = sorted(
            {bmap.get(v, v) for v in expr.variables
             if bmap.get(v, v) != "_score" and v != "_score"}
        )
        miss = [c for c in need if c not in cache]
        if miss:
            from lucene_solr_ray.index.docvalues import read_docmeta_column

            for c in miss:
                # read through numeric DocValues-update overlays, like the
                # reference's ExpressionValueSource reading updatable DVs
                cache[c], _ = read_docmeta_column(self.reader.seg_dir, c)
        bindings = {}
        for v in expr.variables:
            col = bmap.get(v, v)
            if v == "_score" or col == "_score":
                bindings[v] = scores.astype(np.float64)
            else:
                bindings[v] = cache[col][ords]
        out = expr.evaluate(bindings) * boost
        return ords, out.astype(self.sim.out_dtype)

    def _point_range(self, q: "PointRangeQuery", boost: float):
        """Constant-score numeric range over the segment's flat-sorted
        points (1-D BKD semantics, reference ``search/PointRangeQuery.java``
        — the weight is a ConstantScoreWeight)."""
        # segment-level prune off the meta min/max (the BKD root-cell
        # check) — skips the points.parquet read entirely
        mm = self.reader.meta.get("points_minmax", {}).get(q.nfield)
        if mm is not None:
            if q.lower is not None and (
                mm[1] < q.lower
                or (mm[1] == q.lower and not q.include_lower)
            ):
                return _EMPTY_I, _EMPTY_F
            if q.upper is not None and (
                mm[0] > q.upper
                or (mm[0] == q.upper and not q.include_upper)
            ):
                return _EMPTY_I, _EMPTY_F
        p = self.reader.points(q.nfield)
        if p is None:
            return _EMPTY_I, _EMPTY_F
        vals, ords = p
        lo = 0
        hi = len(vals)
        if q.lower is not None:
            lo = np.searchsorted(
                vals, float(q.lower),
                side="left" if q.include_lower else "right",
            )
        if q.upper is not None:
            hi = np.searchsorted(
                vals, float(q.upper),
                side="right" if q.include_upper else "left",
            )
        if hi <= lo:
            return _EMPTY_I, _EMPTY_F
        sel = np.sort(ords[lo:hi]).astype(np.int32)
        dt = self.sim.out_dtype
        return sel, np.full(len(sel), dt(boost), dtype=dt)

    def _term(self, term: str, boost: float, fld: Optional[str] = None):
        from lucene_solr_ray.index.segment import field_term

        key = field_term(fld, term)
        p = self.reader.postings(key)
        if p is None:
            return _EMPTY_I, _EMPTY_F
        ords, freqs = p
        df = self.stats.df.get(key, 0)
        if df <= 0:
            return _EMPTY_I, _EMPTY_F
        doc_count, sttf = self.stats.collection_for(fld)
        sc = self.sim.scorer(
            boost,
            doc_count,
            sttf,
            df,
            total_term_freq=self.stats.ttf.get(key, df),
        )
        norms = self.reader.norms_for(fld) if fld else self.norms
        scores = sc.score(freqs, norms[ords])
        return ords, scores

    def _synonym(self, q: SynonymQuery, boost: float):
        """Sum freqs across synonyms, score once with blended stats
        (df = max over terms, ttf = sum — ``SynonymQuery.java``)."""
        freq_acc = np.zeros(self.ndocs, dtype=np.float64)
        seen = np.zeros(self.ndocs, dtype=bool)
        df_max = 0
        for t in q.syn_terms:
            p = self.reader.postings(t)
            df_max = max(df_max, self.stats.df.get(t, 0))
            if p is None:
                continue
            ords, freqs = p
            np.add.at(freq_acc, ords, freqs.astype(np.float64))
            seen[ords] = True
        if df_max <= 0 or not seen.any():
            return _EMPTY_I, _EMPTY_F
        ords = np.nonzero(seen)[0].astype(np.int32)
        sc = self.sim.scorer(
            boost, self.stats.doc_count, self.stats.sum_total_term_freq,
            df_max,
        )
        return ords, sc.score(freq_acc[ords], self.norms[ords])

    def _blended(self, q: BlendedTermQuery, boost: float):
        """Σ_t boost_t · BM25(freq_t, norm; df = max df over the set) —
        blended statistics keep rare fuzzy variants from dominating via
        tiny df (``BlendedTermQuery.java`` adjustFrequencies)."""
        df_blend = max(
            (self.stats.df.get(t, 0) for t in q.bl_terms), default=0
        )
        if df_blend <= 0:
            return _EMPTY_I, _EMPTY_F
        doc_count, sttf = self.stats.collection_for(q.field)
        norms = self.reader.norms_for(q.field) if q.field else self.norms
        acc = np.zeros(self.ndocs, dtype=np.float64)
        seen = np.zeros(self.ndocs, dtype=bool)
        for t, b in zip(q.bl_terms, q.boosts):
            p = self.reader.postings(t)
            if p is None:
                continue
            ords, freqs = p
            sc = self.sim.scorer(boost * b, doc_count, sttf, df_blend)
            np.add.at(
                acc, ords,
                sc.score(freqs, norms[ords]).astype(np.float64),
            )
            seen[ords] = True
        ords = np.nonzero(seen)[0].astype(np.int32)
        return ords, acc[ords].astype(self.sim.out_dtype)

    def _dismax(self, q: DisjunctionMaxQuery, boost: float):
        """score = max + tie_breaker * (sum - max) over matching disjuncts
        (``DisjunctionMaxQuery.java``; DisjunctionMaxScorer math)."""
        mx = np.zeros(self.ndocs, dtype=np.float64)
        sm = np.zeros(self.ndocs, dtype=np.float64)
        seen = np.zeros(self.ndocs, dtype=bool)
        for d in q.disjuncts:
            ords, scores = self.eval(d, boost)
            s64 = scores.astype(np.float64)
            np.maximum.at(mx, ords, s64)
            np.add.at(sm, ords, s64)
            seen[ords] = True
        ords = np.nonzero(seen)[0].astype(np.int32)
        total = mx[ords] + q.tie_breaker * (sm[ords] - mx[ords])
        return ords, total.astype(self.sim.out_dtype)

    def _boolean(self, q: BooleanQuery, boost: float):
        n_must = n_filter = n_should = 0
        acc = np.zeros(self.ndocs, dtype=np.float64)
        must_cnt = np.zeros(self.ndocs, dtype=np.int32)
        filt_cnt = np.zeros(self.ndocs, dtype=np.int32)
        should_cnt = np.zeros(self.ndocs, dtype=np.int32)
        prohibited = np.zeros(self.ndocs, dtype=bool)
        for c in q.clauses:
            if c.occur is Occur.MUST:
                ords, scores = self.eval(c.query, boost)
                np.add.at(acc, ords, scores.astype(np.float64))
                must_cnt[ords] += 1
                n_must += 1
            elif c.occur is Occur.SHOULD:
                ords, scores = self.eval(c.query, boost)
                np.add.at(acc, ords, scores.astype(np.float64))
                should_cnt[ords] += 1
                n_should += 1
            elif c.occur is Occur.FILTER:
                ords, _ = self.eval(c.query, 1.0)
                filt_cnt[ords] += 1
                n_filter += 1
            else:  # MUST_NOT
                ords, _ = self.eval(c.query, 1.0)
                prohibited[ords] = True
        msm = q.minimum_should_match
        if n_must == 0 and n_filter == 0:
            msm = max(msm, 1)
        matched = (
            (must_cnt == n_must)
            & (filt_cnt == n_filter)
            & ~prohibited
            & (should_cnt >= msm)
        )
        if n_should == 0 and msm > 0:
            matched[:] = False
        ords = np.nonzero(matched)[0].astype(np.int32)
        return ords, acc[ords].astype(self.sim.out_dtype)

    def _phrase(self, q: PhraseQuery, boost: float):
        from lucene_solr_ray.index.segment import field_term

        keys = [field_term(q.field, t) for t in q.phrase_terms]
        readers = []
        for key in keys:
            pp = self.reader.positions(key)
            if pp is None or self.stats.df.get(key, 0) <= 0:
                return _EMPTY_I, _EMPTY_F
            readers.append(pp)
        # candidate docs: intersection of all term ords
        cand = readers[0][0]
        for ords, _ in readers[1:]:
            cand = np.intersect1d(cand, ords, assume_unique=True)
        if len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        # per-doc phrase frequency via offset-aligned position intersection
        rel = np.asarray(q.positions, dtype=np.int64)
        rel = rel - rel[0]
        out_ords: List[int] = []
        out_freqs: List[float] = []
        for d in cand:
            base = None
            for (ords, posfn), off in zip(readers, rel):
                idx = np.searchsorted(ords, d)
                p = posfn(int(idx)) - off
                base = p if base is None else np.intersect1d(base, p, assume_unique=True)
                if len(base) == 0:
                    break
            if base is not None and len(base) and q.slop == 0:
                out_ords.append(int(d))
                out_freqs.append(float(len(base)))
            elif q.slop > 0:
                f = self._sloppy_freq(
                    readers, d, q.slop, rel,
                    terms_distinct=len(set(keys)) == len(keys),
                )
                if f > 0:
                    out_ords.append(int(d))
                    out_freqs.append(f)
        if not out_ords:
            return _EMPTY_I, _EMPTY_F
        ords = np.asarray(out_ords, dtype=np.int32)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        # combined idf = sum of per-term idfs (BM25Similarity.idfExplain for
        # multiple TermStatistics), accumulated in the similarity's dtype
        dt = self.sim.out_dtype
        doc_count, sttf = self.stats.collection_for(q.field)
        # per-term float idfs summed in a DOUBLE, single final cast —
        # BM25Similarity.idfExplain(CollectionStatistics, TermStatistics[])
        # accumulates getValue().doubleValue() and casts once
        idf_acc = 0.0
        for key in keys:
            idf_acc += float(
                dt(self.sim.idf_value(self.stats.df[key], doc_count))
            )
        idf = dt(idf_acc)
        sc = self.sim.scorer_from_idf(boost, idf, doc_count, sttf)
        norms = self.reader.norms_for(q.field) if q.field else self.norms
        return ords, sc.score(freqs, norms[ords])

    def _sloppy_freq(self, readers, d, slop, rel,
                     terms_distinct: bool = True) -> float:
        """Sloppy phrase frequency for one doc.

        Distinct-term phrases run the exact reference algorithm
        (``SloppyPhraseScorer.phraseFreq`` — the min-position priority
        queue that minimizes each match length before scoring it
        ``1/(1+matchLength)``).  Phrases with REPEATED terms fall back to
        enumerating alignments (the reference's repeats machinery —
        ``advanceRpts`` term grouping — is not ported)."""
        import itertools

        pos_lists = []
        for (ords, posfn) in readers:
            idx = np.searchsorted(ords, d)
            pos_lists.append(posfn(int(idx)))
        if terms_distinct:
            adjusted = [
                (np.asarray(p, dtype=np.int64) - off).tolist()
                for p, off in zip(pos_lists, rel)
            ]
            return _sloppy_freq_exact(adjusted, slop)
        freq = 0.0
        for combo in itertools.product(*[p.tolist() for p in pos_lists]):
            adj = [int(p) - int(off) for p, off in zip(combo, rel)]
            ml = max(adj) - min(adj)
            if ml <= slop and len(set(combo)) == len(combo):
                freq += 1.0 / (1.0 + ml)
        return freq


def score_segment(
    reader, query: Query, stats: GlobalStats, sim: Optional[BM25Similarity] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Exhaustively score one segment; returns (ords asc, float32 scores).

    Tombstoned docs are dropped from the RESULT but still count in the
    collection/term stats — exactly Lucene's live-docs contract (deleted
    docs affect docFreq/avgdl until the segment merges away;
    ``LeafReader.getLiveDocs`` filters iteration only)."""
    ev = _Eval(reader, stats, sim or BM25Similarity())
    ords, scores = ev.eval(query, 1.0)
    if getattr(reader, "has_deletes", False) and len(ords):
        m = reader.live_mask(ords)
        ords, scores = ords[m], scores[m]
    return ords, scores


def topk_segment(
    reader, query: Query, stats: GlobalStats, k: int,
    sim: Optional[BM25Similarity] = None,
    pruning: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k of one segment, tie-broken by ascending ordinal (doc order),
    as ``TopScoreDocCollector`` collects per leaf.

    With ``pruning`` (TOP_SCORES mode), pure term disjunctions and
    conjunctions take the block-max WAND/MaxScore path (search/wand.py);
    everything else — and ``pruning=False`` (COMPLETE mode, the
    checkTopScores oracle) — scores exhaustively."""
    # segments with tombstones take the exhaustive path: WAND's top-k would
    # under-fill after post-hoc filtering (Lucene threads liveDocs through
    # the scorer iterators; deleted segments merge away, so this slow path
    # is transient per segment)
    if pruning and not getattr(reader, "has_deletes", False):
        from lucene_solr_ray.search.wand import topk_pruned

        hit = topk_pruned(reader, query, stats, k, sim)
        if hit is not None:
            return hit
    ords, scores = score_segment(reader, query, stats, sim)
    if len(ords) > k:
        # keep every doc tied with the k-th score so the (score desc,
        # doc asc) tie-break decides the boundary, not argpartition order
        part = np.argpartition(-scores, k - 1)
        kth = scores[part[k - 1]]
        mask = scores >= kth
        ords, scores = ords[mask], scores[mask]
    # ties break on the GLOBAL doc_id (not the segment ordinal): rankings
    # are then invariant to segmentation — merges and parallelism cannot
    # reorder equal-scored docs (stricter than the reference's
    # (shardIndex, doc) tie, which shifts when segments merge)
    dids = reader.doc_ids[ords]
    order = np.lexsort((dids, -scores.astype(np.float64)))[:k]
    return ords[order], scores[order]


def _span_scoring_terms(q) -> List[str]:
    """Terms contributing idf to a span score: SpanNot scores with the
    INCLUDE side only (reference ``SpanNotWeight.extractTermStates``
    delegates to includeWeight — the absent exclude side must not move
    scores); every other node scores all its leaves."""
    if isinstance(q, SpanNotQuery):
        return _span_scoring_terms(q.include)
    if isinstance(q, SpanFirstQuery):
        return _span_scoring_terms(q.match)
    if isinstance(q, SpanOrQuery):
        return [t for c in q.clauses for t in _span_scoring_terms(c)]
    return q.terms()


def _span_field(q) -> Optional[str]:
    """Common field of a span tree's leaves (span queries are single-field,
    as the reference's SpanQuery.getField contract requires)."""
    if isinstance(q, (SpanTermQuery, SpanNearQuery)):
        return q.field
    if isinstance(q, SpanFirstQuery):
        return _span_field(q.match)
    if isinstance(q, SpanNotQuery):
        return _span_field(q.include)
    if isinstance(q, SpanOrQuery):
        flds = {_span_field(c) for c in q.clauses}
        if len(flds) > 1:
            raise ValueError("SpanOrQuery clauses must share one field")
        return next(iter(flds))
    raise TypeError(type(q))


def _span_list_ordered(pos_lists, slop: int):
    """Minimal ORDERED spans (start, end, gaps): for each start position of
    the first term, greedily chain each next term to its smallest position
    strictly after the previous one; the span matches when its gap count
    (covered length − #terms) ≤ slop."""
    first = pos_lists[0]
    out = []
    for p0 in first.tolist():
        prev = p0
        ok = True
        for pl in pos_lists[1:]:
            i = np.searchsorted(pl, prev + 1)
            if i >= len(pl):
                ok = False
                break
            prev = int(pl[i])
        if not ok:
            break  # later starts only move prev further right
        gaps = (prev - p0 + 1) - len(pos_lists)
        if gaps <= slop:
            out.append((int(p0), prev + 1, gaps))
    return out


def _span_list_unordered(pos_lists, slop: int):
    """Minimal UNORDERED spans (start, end, gaps): sliding window over the
    merged tagged position stream; every minimal window covering ≥1
    position of each term with gap count ≤ slop is emitted."""
    tagged = sorted(
        (int(p), t) for t, pl in enumerate(pos_lists) for p in pl.tolist()
    )
    n_terms = len(pos_lists)
    counts = [0] * n_terms
    covered = 0
    out = []
    left = 0
    for right in range(len(tagged)):
        t = tagged[right][1]
        counts[t] += 1
        if counts[t] == 1:
            covered += 1
        while covered == n_terms:
            # shrink to minimal window, then record + advance
            lt = tagged[left][1]
            if counts[lt] > 1:
                counts[lt] -= 1
                left += 1
                continue
            gaps = (tagged[right][0] - tagged[left][0] + 1) - n_terms
            if gaps <= slop:
                out.append(
                    (tagged[left][0], tagged[right][0] + 1, gaps)
                )
            counts[lt] -= 1
            covered -= 1
            left += 1
    return out


def _span_freq_ordered(pos_lists, slop: int) -> float:
    return sum(
        1.0 / (1.0 + g) for _, _, g in _span_list_ordered(pos_lists, slop)
    )


def _span_freq_unordered(pos_lists, slop: int) -> float:
    return sum(
        1.0 / (1.0 + g)
        for _, _, g in _span_list_unordered(pos_lists, slop)
    )


def _sloppy_freq_exact(adjusted_pos_lists, slop: int) -> float:
    """Port of the reference sloppy matcher's core loop
    (``SloppyPhraseScorer.phraseFreq`` / ``SloppyPhraseMatcher``): a
    priority queue of per-term iterators over offset-adjusted positions;
    the minimum is advanced, shrinking the current match length until the
    min term moves past the runner-up, at which point the match scores
    ``1/(1 + matchLength)``.  Exact for phrases without repeated terms."""
    import heapq

    k = len(adjusted_pos_lists)
    ptrs = [0] * k
    heap = []  # (position, term_index)
    end = -(1 << 60)
    for i, pl in enumerate(adjusted_pos_lists):
        if not pl:
            return 0.0
        heapq.heappush(heap, (pl[0], i))
        end = max(end, pl[0])

    def advance(i):
        nonlocal end
        ptrs[i] += 1
        pl = adjusted_pos_lists[i]
        if ptrs[i] >= len(pl):
            return None
        pos = pl[ptrs[i]]
        if pos > end:
            end = pos
        return pos

    freq = 0.0
    pos, i = heapq.heappop(heap)
    match_length = end - pos
    nxt = heap[0][0] if heap else pos
    while True:
        new_pos = advance(i)
        if new_pos is None:
            break
        if new_pos > nxt:
            # done minimizing the current match length
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (new_pos, i))
            pos, i = heapq.heappop(heap)
            nxt = heap[0][0] if heap else pos
            match_length = end - pos
        else:
            match_length = min(match_length, end - new_pos)
            pos = new_pos
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq
