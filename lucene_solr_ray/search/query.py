"""Query algebra — the predicate AST of the engine.

Mirrors the core query classes of the reference
(``lucene/core/src/java/org/apache/lucene/search/``): ``TermQuery``,
``BooleanQuery`` (MUST/SHOULD/FILTER/MUST_NOT + minimumNumberShouldMatch,
max 1024 clauses), ``PhraseQuery`` (exact + sloppy), ``BoostQuery``,
``MatchAllDocsQuery``/``MatchNoDocsQuery``, plus the multi-term queries
(``PrefixQuery``/``WildcardQuery``/``RegexpQuery``/``TermRangeQuery``/
``FuzzyQuery``) which rewrite to term disjunctions against the term
dictionary before scoring (``AutomatonQuery`` rewrite semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Tuple

__all__ = [
    "Query",
    "TermQuery",
    "PhraseQuery",
    "SpanNearQuery",
    "SpanTermQuery",
    "SpanFirstQuery",
    "SpanNotQuery",
    "SpanOrQuery",
    "CommonTermsQuery",
    "IntervalQuery",
    "PayloadScoreQuery",
    "SynonymQuery",
    "DisjunctionMaxQuery",
    "BlendedTermQuery",
    "Occur",
    "BooleanClause",
    "BooleanQuery",
    "BoostQuery",
    "MatchAllDocsQuery",
    "MatchNoDocsQuery",
    "PrefixQuery",
    "WildcardQuery",
    "RegexpQuery",
    "FuzzyQuery",
    "TermRangeQuery",
    "TermInSetQuery",
    "PointRangeQuery",
    "FunctionScoreQuery",
    "ConstantScoreQuery",
]

MAX_CLAUSE_COUNT = 1024  # BooleanQuery.maxClauseCount default


class Query:
    """Base marker. Queries are immutable value objects."""

    def terms(self) -> List[str]:
        """All primitive terms mentioned (for the global-stats pass)."""
        return []


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    #: None = the index's default field; otherwise postings live under the
    #: ``field\x1fterm`` key with per-field norms/stats
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [field_term(self.field, self.term)]


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Terms at ascending positions; ``slop`` = max edit distance
    (``PhraseQuery.java``; exact matcher when slop == 0)."""

    phrase_terms: Tuple[str, ...]
    positions: Tuple[int, ...]
    slop: int = 0
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [field_term(self.field, t) for t in self.phrase_terms]


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Multi-term single-score: freqs summed across synonyms before the
    tf saturation, stats blended as (df = max, ttf = sum)
    (``SynonymQuery.java``)."""

    syn_terms: Tuple[str, ...]

    def terms(self) -> List[str]:
        return list(self.syn_terms)


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """Weighted term union with BLENDED statistics: every term scores with
    df = max df across the set, then per-term boosts apply and scores sum
    (``BlendedTermQuery.java``; the shape FuzzyQuery's default
    TopTermsBlendedFreqScoringRewrite produces)."""

    #: term-DICTIONARY keys (already field-prefixed when field is set)
    bl_terms: Tuple[str, ...]
    boosts: Tuple[float, ...]
    field: Optional[str] = None

    def terms(self) -> List[str]:
        return list(self.bl_terms)


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """max over sub-scores + tie_breaker * (sum - max)
    (``DisjunctionMaxQuery.java``)."""

    disjuncts: Tuple[Query, ...]
    tie_breaker: float = 0.0

    def terms(self) -> List[str]:
        out: List[str] = []
        for d in self.disjuncts:
            out.extend(d.terms())
        return out


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: Tuple[BooleanClause, ...]
    minimum_should_match: int = 0

    def __post_init__(self):
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"maxClauseCount is set to {MAX_CLAUSE_COUNT}"
            )

    def terms(self) -> List[str]:
        out: List[str] = []
        for c in self.clauses:
            out.extend(c.query.terms())
        return out


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float

    def terms(self) -> List[str]:
        return self.query.terms()


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    reason: str = ""


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    # score == boost (1.0 unless wrapped in BoostQuery)

    def terms(self) -> List[str]:
        return self.query.terms()


# ---- multi-term queries: rewrite against the term dictionary --------------


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    field: Optional[str] = None


@dataclass(frozen=True)
class WildcardQuery(Query):
    """``*`` any run, ``?`` one char (``WildcardQuery.java``)."""

    pattern: str
    field: Optional[str] = None


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str
    field: Optional[str] = None


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2  # FuzzyQuery.defaultMaxEdits
    prefix_length: int = 0
    field: Optional[str] = None


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: Optional[str]
    upper: Optional[str]
    include_lower: bool = True
    include_upper: bool = True
    field: Optional[str] = None


@dataclass(frozen=True)
class SpanTermQuery(Query):
    """A single term as a span source (reference
    ``search/spans/SpanTermQuery.java``) — each occurrence is a width-1
    span; composes under SpanFirst/Not/Or."""

    span_term: str
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [field_term(self.field, self.span_term)]


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """Spans of ``match`` that END within the first ``end`` positions
    (reference ``search/spans/SpanFirstQuery.java``)."""

    match: "Query"
    end: int

    def terms(self) -> List[str]:
        return self.match.terms()


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """Spans of ``include`` that do not OVERLAP any span of ``exclude``
    (reference ``search/spans/SpanNotQuery.java``)."""

    include: "Query"
    exclude: "Query"

    def terms(self) -> List[str]:
        return self.include.terms() + self.exclude.terms()


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """Union of the clause spans (reference
    ``search/spans/SpanOrQuery.java``)."""

    clauses: Tuple["Query", ...]

    def terms(self) -> List[str]:
        out: List[str] = []
        for c in self.clauses:
            out.extend(c.terms())
        return out


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Terms within ``slop`` extra positions of each other, ordered or not
    (reference ``lucene/core/src/java/org/apache/lucene/search/spans/
    SpanNearQuery.java``; matching via NearSpansOrdered/Unordered minimal
    spans).  Span frequency = Σ 1/(1 + gaps) over minimal spans, scored
    like a phrase with the summed idf of its terms (SpanScorer +
    Similarity.SimScorer sloppyFreq shape) — match semantics are validated
    against the in-repo exhaustive positional oracle."""

    span_terms: Tuple[str, ...]
    slop: int = 0
    in_order: bool = True
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [field_term(self.field, t) for t in self.span_terms]


@dataclass(frozen=True)
class ComplexPhraseQuery(Query):
    """A phrase whose slots are ALTERNATIVE-TERM sets — the compiled
    form of ``ComplexPhraseQueryParser``'s quoted wildcard phrases
    (reference ``lucene/queryparser/src/java/org/apache/lucene/
    queryparser/complexPhrase/ComplexPhraseQueryParser.java:63``, which
    rewrites to SpanNear over SpanOr).  Each slot matches at a position
    if ANY of its terms occurs there; spans evaluate exactly like
    SpanNearQuery (minimal spans, sloppyFreq).  Patterns are expanded
    against the live dictionary BEFORE construction (see
    ``search/complexphrase.py``)."""

    slots: Tuple[Tuple[str, ...], ...]
    slop: int = 0
    in_order: bool = True
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [field_term(self.field, t)
                for slot in self.slots for t in slot]


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """High/low-frequency clause splitting (reference ``lucene/queries/
    src/java/org/apache/lucene/queries/CommonTermsQuery.java:60,
    buildQuery``): terms whose docFreq exceeds
    ``max_term_frequency`` (absolute when ≥ 1, else a maxDoc ratio,
    ceil'd) form an optional SHOULD group; the rest form the
    ``low_freq_occur`` group wrapped MUST — stopword-frequency terms
    influence ranking without dominating recall.  If every term is
    high-frequency, the high group becomes a conjunction (the
    slow-query guard).  The rewrite happens at scoring time against the
    EXACT global stats."""

    ct_terms: Tuple[str, ...]
    max_term_frequency: float = 0.01
    low_freq_occur: "Occur" = None  # defaults to SHOULD (set in build)
    high_freq_occur: "Occur" = None
    low_freq_min_should: int = 0
    high_freq_min_should: int = 0
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [field_term(self.field, t) for t in self.ct_terms]

    def build(self, df_by_key, max_doc: int) -> Query:
        """The ``buildQuery`` rewrite given global (df, maxDoc)."""
        import math

        from lucene_solr_ray.index.segment import field_term

        low_occur = self.low_freq_occur or Occur.SHOULD
        high_occur = self.high_freq_occur or Occur.SHOULD
        mtf = self.max_term_frequency
        low: List[Query] = []
        high: List[Query] = []
        for t in self.ct_terms:
            df = int(df_by_key.get(field_term(self.field, t), 0))
            if df == 0:
                low.append(TermQuery(t, field=self.field))
            elif (mtf >= 1.0 and df > mtf) or (
                df > int(math.ceil(mtf * float(max_doc)))
            ):
                high.append(TermQuery(t, field=self.field))
            else:
                low.append(TermQuery(t, field=self.field))
        low_msm = self.low_freq_min_should if low_occur == Occur.SHOULD \
            else 0
        high_msm = self.high_freq_min_should \
            if high_occur == Occur.SHOULD else 0
        if not low and high_msm == 0 and high_occur != Occur.MUST:
            high_occur = Occur.MUST
        clauses: List[BooleanClause] = []
        if low:
            lq = BooleanQuery(
                tuple(BooleanClause(q, low_occur) for q in low),
                minimum_should_match=low_msm,
            )
            clauses.append(BooleanClause(BoostQuery(lq, 1.0), Occur.MUST))
        if high:
            hq = BooleanQuery(
                tuple(BooleanClause(q, high_occur) for q in high),
                minimum_should_match=high_msm,
            )
            clauses.append(
                BooleanClause(BoostQuery(hq, 1.0), Occur.SHOULD)
            )
        if not clauses:
            return MatchNoDocsQuery("empty CommonTermsQuery")
        return BooleanQuery(tuple(clauses))


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Minimal-interval proximity query (reference ``lucene/sandbox/src/
    java/org/apache/lucene/search/intervals/IntervalQuery.java``): docs
    with ≥1 interval of the source; ``freq = Σ 1/(end − start + 1)``
    (IntervalScorer.java:73) scored with a sim scorer built from every
    distinct leaf term's stats (buildSimScorer:77-92)."""

    source: object  # lucene_solr_ray.search.intervals.IntervalsSource
    field: Optional[str] = None

    def terms(self) -> List[str]:
        from lucene_solr_ray.index.segment import field_term

        return [
            field_term(self.field, t)
            for t in dict.fromkeys(self.source.leaves())
        ]


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """Score docs by a function of the payloads collected at the matched
    span positions (reference ``lucene/queries/src/java/org/apache/lucene/
    queries/payloads/PayloadScoreQuery.java`` with
    Min/Max/Avg/SumPayloadFunction and the float PayloadDecoder):
    score = payloadFn(payloads) [× spanScore when ``include_span_score``].

    Payload collection: every leaf-term occurrence lying inside a matched
    span interval contributes its payload (the reference's
    PayloadSpanCollector enumerates exactly those positions for
    SpanTermQuery; for composite spans with repeated terms inside one
    window the interval form may collect supersets — documented engine
    semantics, property-tested against a brute-force oracle)."""

    span: "Query"
    func: str = "avg"  # min | max | avg | sum
    include_span_score: bool = False

    def terms(self) -> List[str]:
        return self.span.terms()


@dataclass(frozen=True)
class PointRangeQuery(Query):
    """Range over an INDEXED NUMERIC point field — constant-score doc-id
    selection from the per-segment sorted points column (the engine's
    flat-sorted analogue of the BKD tree: reference
    ``lucene/core/src/java/org/apache/lucene/search/PointRangeQuery.java:47``,
    ``util/bkd/BKDWriter.java:82``).  ``None`` bound = open."""

    nfield: str
    lower: Optional[float]
    upper: Optional[float]
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """Score of the inner query combined with a per-doc value source
    (reference ``lucene/queries/src/java/org/apache/lucene/queries/
    function/FunctionScoreQuery.java`` with a field DoubleValuesSource):
    ``mode`` ∈ multiply | sum | replace over a numeric docmeta column
    (stored_cols at build time)."""

    query: "Query"
    value_field: str
    mode: str = "multiply"

    def terms(self) -> List[str]:
        return self.query.terms()


@dataclass(frozen=True)
class ExpressionScoreQuery(Query):
    """Re-score the inner query with a compiled javascript expression
    (reference ``lucene/expressions/.../ExpressionValueSource.java`` via
    ``Expression.getDoubleValuesSource(bindings)`` wrapped in a
    FunctionScoreQuery).  ``bindings`` maps each expression variable to a
    docmeta column name, with the reserved name ``_score`` bound to the
    inner query's score (``expressions/ScoreFunctionValues`` role)."""

    query: "Query"
    source: str
    bindings: Tuple[Tuple[str, str], ...]  # (variable, column) pairs

    def terms(self) -> List[str]:
        return self.query.terms()


@dataclass(frozen=True)
class TermInSetQuery(Query):
    in_terms: Tuple[str, ...]

    def terms(self) -> List[str]:
        return list(self.in_terms)
