"""Classic query-parser subset (the reference's default syntax).

Covers the grammar subset exercised by the reference query sets
(``lucene/benchmark/conf/query-terms.txt``, ``query-phrases.txt``) and the
clause semantics of ``lucene/queryparser/src/java/org/apache/lucene/
queryparser/classic/QueryParser.jj:196-240`` / ``QueryParserBase.addClause``:

- terms, ``AND``/``&&``, ``OR``/``||``, ``NOT``/``!``, ``+``/``-`` prefixes,
  parentheses, ``"quoted phrases"`` with ``~slop``, ``term^boost``,
  ``field:term`` (accepted; this engine indexes a single field so the field
  name is validated-and-dropped), ``wild*card``/``wild?card``, ``fuzzy~2``,
  ``/regexp/``, ``[a TO b]``/``{a TO b}`` term ranges, ``*:*`` match-all.
- default operator is OR (SHOULD); ``AND`` retroactively promotes the
  previous clause to MUST exactly as ``addClause`` does.
- ``-``/``!`` are MUST_NOT operators only at a clause start; mid-word
  hyphens stay term text ("foo-bar" is ONE term which the analyzer then
  splits — matching the reference, where escaping rules keep mid-word
  punctuation inside the term).
- query text runs through the same analyzer as indexing; a term that
  analyzes to nothing (stopword) drops its clause; a term that analyzes to
  several tokens becomes a SHOULD-disjunction of them.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
from lucene_solr_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

__all__ = ["QueryParser", "parse", "dismax_parse"]

_TOKEN_RE = re.compile(
    r"""
    (?P<space>\s+)
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<lparen>\()
  | (?P<rparen>\)(?:\^\d+(?:\.\d+)?)?)
  | (?P<phrase>(?:\w+:)?"(?:[^"\\]|\\.)*")
  | (?P<regexp>(?:\w+:)?/(?:[^/\\]|\\.)+/)
  | (?P<range>(?:\w+:)?[\[{][^\]}]*(?:TO)[^\]}]*[\]}])
  | (?P<term>[^\s()+\-!"^~][^\s()"^~]*)
    """,
    re.VERBOSE,
)

_SUFFIX_RE = re.compile(r"(?:~(?P<fuzz>\d*(?:\.\d+)?))?(?:\^(?P<boost>\d+(?:\.\d+)?))?")


class ParseError(ValueError):
    pass


class QueryParser:
    def __init__(self, analyzer: Optional[StandardAnalyzer] = None,
                 fields: Optional[set] = None,
                 field_analyzers: Optional[dict] = None,
                 numeric_fields: Optional[dict] = None) -> None:
        self.analyzer = analyzer or StandardAnalyzer()
        #: known NON-default field names: "lang:en" becomes a field-scoped
        #: TermQuery when "lang" is listed here; unknown prefixes are
        #: validated-and-dropped (single-field behavior)
        self.fields = frozenset(fields or ())
        #: field → analyzer: field-scoped text analyzes with the FIELD's own
        #: chain (``PerFieldAnalyzerWrapper`` semantics, reference
        #: ``analysis/miscellaneous/PerFieldAnalyzerWrapper.java``); fields
        #: not listed use the default analyzer
        self.field_analyzers = dict(field_analyzers or {})
        #: numeric point fields: field → dtype ("int64"/"double");
        #: ``field:[a TO b]`` on these parses to PointRangeQuery
        self.numeric_fields = dict(numeric_fields or {})

    def _field_analyzer(self, fld: Optional[str]) -> StandardAnalyzer:
        if fld is not None and fld in self.field_analyzers:
            return self.field_analyzers[fld]
        return self.analyzer

    # -- lexer -------------------------------------------------------------
    def _lex(self, s: str) -> List[Tuple[str, str]]:
        toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if m is None:
                raise ParseError(f"cannot lex query at: {s[pos:]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "space":
                continue
            text = m.group()
            # attach ~fuzz / ^boost suffixes to phrase/term/range tokens
            if kind in ("phrase", "term", "range", "regexp"):
                sm = _SUFFIX_RE.match(s, pos)
                if sm and sm.end() > pos:
                    text += s[pos : sm.end()]
                    pos = sm.end()
            toks.append((kind, text))
        return toks

    # -- parser ------------------------------------------------------------
    def parse(self, s: str) -> Query:
        if s.strip() == "*:*":
            return MatchAllDocsQuery()
        toks = self._lex(s)
        q, rest = self._parse_clauses(toks, 0)
        if rest != len(toks):
            raise ParseError(f"unbalanced ) in query: {s!r}")
        return q

    def _parse_clauses(self, toks, i) -> Tuple[Query, int]:
        """Flat clause list with QueryParserBase.addClause conjunction
        semantics (default operator OR)."""
        clauses: List[BooleanClause] = []
        conj_and = False
        mod: Optional[Occur] = None
        while i < len(toks):
            kind, text = toks[i]
            if kind == "rparen":
                i += 1
                break
            if kind == "and":
                conj_and = True
                i += 1
                continue
            if kind == "or":
                conj_and = False
                i += 1
                continue
            if kind in ("not",):
                mod = Occur.MUST_NOT
                i += 1
                continue
            if kind == "plus":
                mod = Occur.MUST
                i += 1
                continue
            if kind == "minus":
                mod = Occur.MUST_NOT
                i += 1
                continue
            if kind == "lparen":
                sub, i = self._parse_clauses(toks, i + 1)
                # group boost rides on the closing-paren token: "(a b)^2"
                if (
                    i > 0
                    and toks[i - 1][0] == "rparen"
                    and "^" in toks[i - 1][1]
                ):
                    sub = BoostQuery(
                        sub, float(toks[i - 1][1].split("^", 1)[1])
                    )
                self._add_clause(clauses, conj_and, mod, sub)
                conj_and, mod = False, None
                continue
            if kind in ("term", "phrase", "range", "regexp"):
                q = self._atom(kind, text)
                i += 1
                if q is not None:
                    self._add_clause(clauses, conj_and, mod, q)
                conj_and, mod = False, None
                continue
            raise ParseError(f"unexpected token {text!r}")
        if not clauses:
            return MatchNoDocsQuery("empty query"), i
        if len(clauses) == 1 and clauses[0].occur in (Occur.SHOULD, Occur.MUST):
            return clauses[0].query, i
        return BooleanQuery(tuple(clauses)), i

    def _add_clause(self, clauses, conj_and, mod, q):
        # QueryParserBase.addClause: AND promotes the previous SHOULD clause
        if conj_and and clauses and clauses[-1].occur == Occur.SHOULD:
            clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
        occur = mod or (Occur.MUST if conj_and else Occur.SHOULD)
        clauses.append(BooleanClause(q, occur))

    # -- atoms -------------------------------------------------------------
    def _atom(self, kind: str, text: str) -> Optional[Query]:
        boost = None
        fuzz: Optional[str] = None
        m = re.search(r"\^(\d+(?:\.\d+)?)$", text)
        if m:
            boost = float(m.group(1))
            text = text[: m.start()]
        m = re.search(r"~(\d*(?:\.\d+)?)$", text)
        if m and kind in ("phrase", "term"):
            fuzz = m.group(1)
            text = text[: m.start()]

        q: Optional[Query]
        if kind == "phrase":
            fld, text = self._strip_prefix(text)
            q = self._phrase(text, int(float(fuzz)) if fuzz else 0, fld)
        elif kind == "regexp":
            fld, text = self._strip_prefix(text)
            q = RegexpQuery(text.strip("/"), field=fld)
        elif kind == "range":
            fld, text = self._strip_prefix(text)
            q = self._range(text, fld)
        else:
            q = self._term(text, fuzz)
        if q is None:
            return None
        if boost is not None:
            q = BoostQuery(q, boost)
        return q

    def _strip_field(self, text: str):
        # "field:term": known non-default fields scope the term; unknown
        # prefixes are accepted-and-dropped (bare ":" inside terms stays —
        # the tokenizer treats it as MidLetter)
        m = re.match(r"^(\w+):(.+)$", text)
        if not m:
            return None, text
        fld = m.group(1)
        if fld in self.fields or fld in self.numeric_fields:
            return fld, m.group(2)
        return None, m.group(2)

    def _strip_prefix(self, text: str):
        """Field prefix on phrase/range/regexp tokens (lexer allows
        ``field:"..."`` / ``field:[a TO b]`` / ``field:/re/``)."""
        m = re.match(r"^(\w+):", text)
        if not m:
            return None, text
        fld = m.group(1)
        rest = text[m.end():]
        if fld in self.fields or fld in self.numeric_fields:
            return fld, rest
        return None, rest

    def _term(self, text: str, fuzz: Optional[str]) -> Optional[Query]:
        fld, text = self._strip_field(text)
        analyzer = self._field_analyzer(fld)
        if fuzz is not None:
            base = analyzer.normalize(text)
            max_edits = int(float(fuzz)) if fuzz else 2
            return FuzzyQuery(base, max_edits=max_edits, field=fld)
        if "*" in text or "?" in text:
            return WildcardQuery(analyzer.normalize(text), field=fld)
        toks = analyzer.analyze(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0], field=fld)
        return BooleanQuery(
            tuple(
                BooleanClause(TermQuery(t, field=fld), Occur.SHOULD)
                for t in toks
            )
        )

    def _phrase(self, text: str, slop: int,
                fld: Optional[str] = None) -> Optional[Query]:
        body = text[1:-1].replace('\\"', '"')
        analyzer = self._field_analyzer(fld)
        terms, positions, _ = analyzer.analyze_with_positions(body)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=fld)
        return PhraseQuery(tuple(terms), tuple(positions), slop, field=fld)

    def _range(self, text: str, fld: Optional[str] = None) -> Query:
        include_lower = text[0] == "["
        include_upper = text[-1] == "]"
        body = text[1:-1]
        m = re.match(r"\s*(\S+)\s+TO\s+(\S+)\s*", body)
        if not m:
            raise ParseError(f"bad range: {text!r}")
        lo_raw = None if m.group(1) == "*" else m.group(1)
        hi_raw = None if m.group(2) == "*" else m.group(2)
        if fld is not None and fld in self.numeric_fields:
            from lucene_solr_ray.search.query import PointRangeQuery

            conv = float if self.numeric_fields[fld] == "double" else int
            return PointRangeQuery(
                fld,
                None if lo_raw is None else conv(lo_raw),
                None if hi_raw is None else conv(hi_raw),
                include_lower, include_upper,
            )
        analyzer = self._field_analyzer(fld)
        lo = None if lo_raw is None else analyzer.normalize(lo_raw)
        hi = None if hi_raw is None else analyzer.normalize(hi_raw)
        return TermRangeQuery(lo, hi, include_lower, include_upper, field=fld)


def parse(s: str, analyzer: Optional[StandardAnalyzer] = None) -> Query:
    return QueryParser(analyzer).parse(s)


def dismax_parse(
    query_text: str,
    qf: "dict[str, float]",
    analyzer: Optional[StandardAnalyzer] = None,
    field_analyzers: Optional[dict] = None,
    tie: float = 0.0,
    mm: int = 0,
) -> Query:
    """(e)DisMax parsing (reference ``solr/core/src/java/org/apache/solr/
    search/DisMaxQParser.java`` / ``ExtendedDismaxQParser.java``): each
    whitespace clause of the user query becomes a DisjunctionMaxQuery over
    the ``qf`` fields (per-field boosts, ``tie`` breaker), combined as
    SHOULD clauses with ``mm`` minimum-should-match.  ``+``/``-`` clause
    prefixes keep their classic meaning.

    Each field analyzes the clause with its OWN analyzer; a clause that
    analyzes to multiple tokens in a field becomes that field's phrase-
    like AND group (eDisMax's per-field subquery)."""
    from lucene_solr_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        BoostQuery,
        DisjunctionMaxQuery,
        MatchNoDocsQuery,
        Occur,
        TermQuery,
    )

    analyzer = analyzer or StandardAnalyzer()
    field_analyzers = field_analyzers or {}
    clauses = []
    for raw in query_text.split():
        occur = Occur.SHOULD
        if raw.startswith("+"):
            occur, raw = Occur.MUST, raw[1:]
        elif raw.startswith("-"):
            occur, raw = Occur.MUST_NOT, raw[1:]
        if not raw:
            continue
        per_field = []
        for fld, boost in qf.items():
            a = field_analyzers.get(fld, analyzer)
            toks = a.analyze(raw)
            if not toks:
                continue
            f = None if fld == "_default_" else fld
            if len(toks) == 1:
                node: Query = TermQuery(toks[0], field=f)
            else:
                node = BooleanQuery(
                    tuple(
                        BooleanClause(TermQuery(t, field=f), Occur.MUST)
                        for t in toks
                    )
                )
            if boost != 1.0:
                node = BoostQuery(node, boost)
            per_field.append(node)
        if not per_field:
            continue
        node = (
            per_field[0] if len(per_field) == 1
            else DisjunctionMaxQuery(tuple(per_field), tie_breaker=tie)
        )
        clauses.append(BooleanClause(node, occur))
    if not clauses:
        return MatchNoDocsQuery("empty dismax query")
    return BooleanQuery(tuple(clauses), minimum_should_match=mm)
