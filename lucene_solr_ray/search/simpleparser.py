"""SimpleQueryParser: the fault-tolerant end-user query syntax.

Reference ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java:63``: ``+`` AND, ``|`` OR, ``-`` NOT,
``"..."`` phrase (``~N`` slop), ``(...)`` precedence, trailing ``*``
prefix, ``~N`` fuzzy, ``\\`` escape — and NEVER throws: any malformed
input degrades to the nearest sensible query (unmatched parens/quotes
become extraneous characters), replayed here state-machine-for-state-
machine (parseSubQuery/consumeToken/buildQueryTree).

``flags`` enables individual operators (default: all on), matching the
reference's feature bitmask behavior — a disabled operator's character
is ordinary token text.
"""

from __future__ import annotations

from typing import List, Optional

from lucene_solr_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

__all__ = [
    "SimpleQueryParser", "simple_parse",
    "AND_OPERATOR", "NOT_OPERATOR", "OR_OPERATOR", "PREFIX_OPERATOR",
    "PHRASE_OPERATOR", "PRECEDENCE_OPERATORS", "ESCAPE_OPERATOR",
    "WHITESPACE_OPERATOR", "FUZZY_OPERATOR", "NEAR_OPERATOR",
]

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_WS = " \t\n\r"
_MAX_FUZZINESS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "current", "previous",
                 "not_count")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top: Optional[Query] = None
        self.current: Optional[Occur] = None
        self.previous: Optional[Occur] = None
        self.not_count = 0


class SimpleQueryParser:
    def __init__(self, analyzer=None, flags: int = -1,
                 default_operator: Occur = Occur.SHOULD,
                 field: Optional[str] = None):
        if analyzer is None:
            from lucene_solr_ray.analysis.analyzer import StandardAnalyzer

            analyzer = StandardAnalyzer()
        self.analyzer = analyzer
        self.flags = flags
        self.default_operator = default_operator
        self.field = field

    # -- factory methods (newDefaultQuery / newFuzzyQuery / ...) ----------

    def _default_query(self, text: str) -> Optional[Query]:
        terms = self.analyzer.analyze(text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=self.field)
        return BooleanQuery(tuple(
            BooleanClause(TermQuery(t, field=self.field),
                          self.default_operator)
            for t in terms
        ))

    def _normalize(self, text: str) -> str:
        norm = getattr(self.analyzer, "normalize", None)
        return norm(text) if norm else text.lower()

    def _fuzzy_query(self, text: str, fuzziness: int) -> Query:
        return FuzzyQuery(self._normalize(text), max_edits=fuzziness,
                          field=self.field)

    def _prefix_query(self, text: str) -> Query:
        return PrefixQuery(self._normalize(text), field=self.field)

    def _phrase_query(self, text: str, slop: int) -> Optional[Query]:
        terms, positions, _ = self.analyzer.analyze_with_positions(text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=self.field)
        return PhraseQuery(tuple(terms), tuple(positions), slop,
                           field=self.field)

    # -- the reference state machine ---------------------------------------

    def parse(self, text: str) -> Query:
        if text is None or not text.strip():
            return MatchNoDocsQuery()
        st = _State(text, 0, len(text))
        self._parse_sub(st)
        return st.top if st.top is not None else MatchNoDocsQuery()

    def _parse_sub(self, st: _State) -> None:
        f = self.flags
        while st.index < st.length:
            c = st.data[st.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_sub(st)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                st.index += 1  # extraneous
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(st)
            elif c == "+" and f & AND_OPERATOR:
                if st.current is None and st.top is not None:
                    st.current = Occur.MUST
                st.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if st.current is None and st.top is not None:
                    st.current = Occur.SHOULD
                st.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                st.not_count += 1
                st.index += 1
                continue  # keep the pending NOT across the next char
            elif c in _WS and f & WHITESPACE_OPERATOR:
                st.index += 1
            else:
                self._consume_token(st)
            st.not_count = 0

    def _consume_sub(self, st: _State) -> None:
        start = st.index + 1
        st.index = start
        depth = 1
        escaped = False
        while st.index < st.length:
            c = st.data[st.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    st.index += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing paren: '(' is extraneous
        elif st.index == start:
            st.current = None  # "()" resets the pending operation
            st.index += 1
        else:
            sub = _State(st.data, start, st.index)
            self._parse_sub(sub)
            self._build(st, sub.top)
            st.index += 1

    def _consume_phrase(self, st: _State) -> None:
        start = st.index + 1
        st.index = start
        copied: List[str] = []
        escaped = False
        has_slop = False
        while st.index < st.length:
            c = st.data[st.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    st.index += 1
                    continue
                if c == '"':
                    if (st.length > st.index + 1
                            and st.data[st.index + 1] == "~"
                            and self.flags & NEAR_OPERATOR):
                        st.index += 1
                        if st.length > st.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            copied.append(c)
            st.index += 1
        if st.index == st.length:
            st.index = start  # unmatched quote is extraneous
        elif st.index == start:
            st.current = None
            st.index += 1
        else:
            phrase = "".join(copied)
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build(st, self._phrase_query(phrase, slop))
            st.index += 1

    def _consume_token(self, st: _State) -> None:
        copied: List[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while st.index < st.length:
            c = st.data[st.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(c):
                    break
                if copied and c == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(copied) and c == "*" \
                    and bool(self.flags & PREFIX_OPERATOR)
            escaped = False
            copied.append(c)
            st.index += 1
        if not copied:
            return
        token = "".join(copied)
        if fuzzy:
            fuzziness = min(self._parse_fuzziness(st), _MAX_FUZZINESS)
            branch = self._default_query(token) if fuzziness == 0 \
                else self._fuzzy_query(token, fuzziness)
        elif prefix:
            branch = self._prefix_query(token[:-1])
        else:
            branch = self._default_query(token)
        self._build(st, branch)

    def _parse_fuzziness(self, st: _State) -> int:
        if st.index >= st.length or st.data[st.index] != "~":
            return 0
        digits: List[str] = []
        while st.index < st.length:
            st.index += 1
            if st.index < st.length:
                if self._token_finished(st.data[st.index]):
                    break
                digits.append(st.data[st.index])
        text = "".join(digits)
        if text == "":
            return 2  # automatic fuzziness
        try:
            return max(0, int(text))
        except ValueError:
            return 0

    def _token_finished(self, c: str) -> bool:
        f = self.flags
        return (
            (c == '"' and bool(f & PHRASE_OPERATOR))
            or (c == "|" and bool(f & OR_OPERATOR))
            or (c == "+" and bool(f & AND_OPERATOR))
            or (c == "(" and bool(f & PRECEDENCE_OPERATORS))
            or (c == ")" and bool(f & PRECEDENCE_OPERATORS))
            or (c in _WS and bool(f & WHITESPACE_OPERATOR))
        )

    def _build(self, st: _State, branch: Optional[Query]) -> None:
        if branch is not None:
            if st.not_count % 2 == 1:
                branch = BooleanQuery((
                    BooleanClause(branch, Occur.MUST_NOT),
                    BooleanClause(MatchAllDocsQuery(), Occur.SHOULD),
                ))
            if st.top is None:
                st.top = branch
            else:
                if st.current is None:
                    st.current = self.default_operator
                if st.previous != st.current:
                    st.top = BooleanQuery((
                        BooleanClause(st.top, st.current),
                    ))
                assert isinstance(st.top, BooleanQuery)
                st.top = BooleanQuery(
                    st.top.clauses + (BooleanClause(branch, st.current),),
                    minimum_should_match=st.top.minimum_should_match,
                )
                st.previous = st.current
        st.current = None


def simple_parse(text: str, analyzer=None,
                 default_operator: Occur = Occur.SHOULD,
                 flags: int = -1, field: Optional[str] = None) -> Query:
    return SimpleQueryParser(
        analyzer, flags=flags, default_operator=default_operator,
        field=field,
    ).parse(text)
