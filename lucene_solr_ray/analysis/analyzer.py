"""StandardAnalyzer-equivalent analysis chain: tokenize → lowercase → stop.

Semantics mirror the reference:

- ``LowerCaseFilter`` (``lucene/core/src/java/org/apache/lucene/analysis/
  LowerCaseFilter.java:30-45``) lowercases per *code point* with Java's
  ``Character.toLowerCase(int)`` — the **simple** case mapping.  Python's
  ``str.lower()`` applies the full mapping (context-sensitive final sigma,
  U+0130 → "i"+combining dot); we correct the divergent code points.
- ``StopFilter`` (``analysis/StopFilter.java:31-110`` via
  ``FilteringTokenFilter.java:48-57``) drops stopwords and **accumulates the
  skipped positionIncrements into the next surviving token**.
- ``StandardAnalyzer()`` defaults to an **empty** stop set
  (``analysis/standard/StandardAnalyzer.java:49-51``); the classic English
  set lives in ``analysis/en/EnglishAnalyzer.java:41-52``.
- Field length for norms = number of tokens emitted by the full chain
  (``index/DefaultIndexingChain.java:775-892``, ``FieldInvertState``);
  ``numOverlap`` counts posIncr==0 tokens (never produced by this chain).
- Multi-valued fields are separated by ``positionIncrementGap`` (the
  analyzer's, default 0 for StandardAnalyzer; Solr text fields use 100) —
  ``DefaultIndexingChain.java:888-891``.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Iterable, List, Optional, Sequence, Tuple

from lucene_solr_ray.analysis.tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    tokenize,
)

__all__ = [
    "StandardAnalyzer",
    "KeywordAnalyzer",
    "ENGLISH_STOP_WORDS",
    "lowercase",
    "analyzer_from_spec",
]

#: ``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET`` (reference
#: ``lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
#: EnglishAnalyzer.java:41-52``) — the classic 33-word list.
ENGLISH_STOP_WORDS: FrozenSet[str] = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# Code points where Python's full lowercase mapping diverges from Java's
# simple mapping (Character.toLowerCase): U+0130 LATIN CAPITAL LETTER I WITH
# DOT ABOVE full-lowers to "i̇" but simple-lowers to "i".
_SIMPLE_LOWER_FIXUP = {0x130: "i"}


def lowercase(token: str) -> str:
    """Per-code-point simple lowercase, matching ``Character.toLowerCase``."""
    if token.isascii():
        return token.lower()
    out = token.lower()
    if len(out) != len(token):
        out = "".join(
            _SIMPLE_LOWER_FIXUP.get(ord(c), c.lower()) for c in token
        )
    # final-sigma: full mapping lowers trailing Σ to ς; simple mapping → σ
    return out.replace("ς", "σ")


class StandardAnalyzer:
    """tokenize → lowercase → stop-filter; per-field reusable, stateless.

    ``analyze(text)`` returns the surviving terms in order;
    ``analyze_with_positions(text)`` additionally returns absolute token
    positions (stop-filter gaps included) and the norm field length.
    """

    def __init__(
        self,
        stop_words: Iterable[str] = (),
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        position_increment_gap: int = 0,
    ) -> None:
        self.stop_words = frozenset(stop_words)
        self.max_token_length = max_token_length
        self.position_increment_gap = position_increment_gap

    # -- single value ------------------------------------------------------
    def analyze(self, text: str) -> List[str]:
        # ASCII fast path: case never changes ASCII token boundaries, so
        # lowercasing the whole text first replaces per-token calls with
        # one C-level str.lower()
        if text.isascii():
            toks = tokenize(text.lower(), self.max_token_length)
            stop = self.stop_words
            if stop:
                return [t for t in toks if t not in stop]
            return toks
        toks = tokenize(text, self.max_token_length)
        stop = self.stop_words
        if stop:
            return [t for t in map(lowercase, toks) if t not in stop]
        return [lowercase(t) for t in toks]

    def analyze_with_positions(
        self, text: str
    ) -> Tuple[List[str], List[int], int]:
        """Returns (terms, positions, field_length).

        Positions are absolute (first token at 0); a dropped stopword leaves
        a gap, exactly as ``StopFilter`` accumulates skipped increments.
        field_length counts surviving tokens (Σ termFreq), the input to
        ``computeNorm`` (numOverlap == 0 for this chain).
        """
        stop = self.stop_words
        if text.isascii():
            toks = tokenize(text.lower(), self.max_token_length)
            if not stop:
                return toks, list(range(len(toks))), len(toks)
            terms = []
            positions = []
            for pos, t in enumerate(toks):
                if t not in stop:
                    terms.append(t)
                    positions.append(pos)
            return terms, positions, len(terms)
        toks = tokenize(text, self.max_token_length)
        terms = []
        positions = []
        pos = -1
        for t in toks:
            pos += 1
            lt = lowercase(t)
            if lt in stop:
                continue
            terms.append(lt)
            positions.append(pos)
        return terms, positions, len(terms)

    def analyze_with_offsets(self, text: str):
        """(terms, positions, starts, ends, field_length) — the
        OffsetAttribute path (start/end char offsets of surviving tokens,
        reference ``analysis/tokenattributes/OffsetAttribute.java``)."""
        from lucene_solr_ray.analysis.tokenizer import tokenize_with_offsets

        stop = self.stop_words
        if text.isascii():
            triples = tokenize_with_offsets(
                text.lower(), self.max_token_length
            )
            lowered = [t for t, _, _ in triples]
        else:
            triples = tokenize_with_offsets(text, self.max_token_length)
            lowered = [lowercase(t) for t, _, _ in triples]
        terms, positions, starts, ends = [], [], [], []
        for pos, (lt, trip) in enumerate(zip(lowered, triples)):
            if lt in stop:
                continue
            terms.append(lt)
            positions.append(pos)
            starts.append(trip[1])
            ends.append(trip[2])
        return terms, positions, starts, ends, len(terms)

    # -- multi-valued field ------------------------------------------------
    def analyze_multi(
        self, values: Sequence[str]
    ) -> Tuple[List[str], List[int], int]:
        """Analyze a multi-valued field with positionIncrementGap between
        values (``DefaultIndexingChain.java:888-891``)."""
        terms: List[str] = []
        positions: List[int] = []
        base = 0
        length = 0
        for i, v in enumerate(values):
            if i > 0:
                base += self.position_increment_gap
            t, p, fl = self.analyze_with_positions(v)
            terms.extend(t)
            positions.extend(pp + base for pp in p)
            base += (p[-1] + 1) if p else 0
            length += fl
        return terms, positions, length

    # -- term frequency vector (the indexing hot path) ---------------------
    def term_freqs(self, text: str) -> Dict[str, int]:
        """term → freq for one document field (order-insensitive)."""
        from collections import Counter

        return Counter(self.analyze(text))

    # -- query-time normalization ------------------------------------------
    def normalize(self, text: str) -> str:
        """Apply the chain's normalization filters WITHOUT tokenizing — the
        path multi-term queries (wildcard/fuzzy/range/prefix) take through
        ``Analyzer.normalize`` (reference ``analysis/Analyzer.java:256-280``,
        used by ``QueryParserBase.getWildcardQuery`` et al.)."""
        return lowercase(text)

    def spec(self) -> Dict:
        """JSON-serializable description, persisted in the index manifest so
        query-time code reconstructs per-field analyzers
        (``analyzer_from_spec``)."""
        return {
            "kind": "standard",
            "stop_words": sorted(self.stop_words),
            "max_token_length": self.max_token_length,
            "position_increment_gap": self.position_increment_gap,
        }


class KeywordAnalyzer(StandardAnalyzer):
    """The whole value is ONE atomic token — ``StringField`` /
    ``KeywordAnalyzer`` semantics (reference
    ``lucene/core/src/java/org/apache/lucene/analysis/standard/``'s
    untokenized sibling; ``document/StringField.java``).  ``lowercase=True``
    gives KeywordTokenizer+LowerCaseFilter (Solr's lowercase fieldType)."""

    def __init__(self, lowercase_value: bool = False) -> None:
        super().__init__()
        self.lowercase_value = lowercase_value

    def _one(self, text: str) -> List[str]:
        if not text:
            return []
        return [lowercase(text) if self.lowercase_value else text]

    def analyze(self, text: str) -> List[str]:
        return self._one(text)

    def analyze_with_positions(self, text: str):
        t = self._one(text)
        return t, [0] * len(t), len(t)

    def analyze_with_offsets(self, text: str):
        t = self._one(text)
        if not t:
            return [], [], [], [], 0
        return t, [0], [0], [len(text)], 1

    def normalize(self, text: str) -> str:
        # KeywordAnalyzer has no LowerCaseFilter unless configured
        return lowercase(text) if self.lowercase_value else text

    def spec(self) -> Dict:
        return {"kind": "keyword", "lowercase": self.lowercase_value}


class DelimitedPayloadAnalyzer(StandardAnalyzer):
    """Whitespace tokenizer + DelimitedPayloadTokenFilter with FloatEncoder
    (reference ``lucene/analysis/common/src/java/org/apache/lucene/
    analysis/payloads/DelimitedPayloadTokenFilter.java`` +
    ``FloatEncoder.java``): each whitespace token ``word|3.5`` splits into
    the lowercased term ``word`` carrying float payload 3.5; tokens
    without the delimiter carry payload 0.0.  Stop words drop AFTER the
    payload strip (leaving a position gap), matching a
    Whitespace→DelimitedPayload→LowerCase→Stop chain."""

    def __init__(
        self, delimiter: str = "|", stop_words: Iterable[str] = ()
    ) -> None:
        super().__init__(stop_words=stop_words)
        self.delimiter = delimiter

    def _parse(self, text: str):
        terms: List[str] = []
        payloads: List[float] = []
        positions: List[int] = []
        stop = self.stop_words
        for pos, tok in enumerate(text.split()):
            term, _, pay = tok.partition(self.delimiter)
            term = lowercase(term)
            if not term or term in stop:
                continue
            try:
                p = float(pay) if pay else 0.0
            except ValueError:
                p = 0.0
            terms.append(term)
            payloads.append(p)
            positions.append(pos)
        return terms, positions, payloads

    def analyze(self, text: str) -> List[str]:
        return self._parse(text)[0]

    def analyze_with_positions(self, text: str):
        terms, positions, _ = self._parse(text)
        return terms, positions, len(terms)

    def analyze_with_payloads(self, text: str):
        """(terms, positions, payloads, field_length) — the
        PayloadAttribute path."""
        terms, positions, payloads = self._parse(text)
        return terms, positions, payloads, len(terms)

    def spec(self) -> Dict:
        return {
            "kind": "delimited_payload",
            "delimiter": self.delimiter,
            "stop_words": sorted(self.stop_words),
        }


def analyzer_from_spec(spec: Dict) -> "Optional[StandardAnalyzer]":
    """Reconstruct an analyzer from its manifest ``spec()`` dict.

    ``custom`` chains (filters.CustomAnalyzer) are session objects and
    return None — pass the same chain explicitly at query time."""
    kind = spec.get("kind", "standard")
    if kind == "custom":
        return None
    if kind == "keyword":
        return KeywordAnalyzer(lowercase_value=bool(spec.get("lowercase")))
    if kind == "delimited_payload":
        return DelimitedPayloadAnalyzer(
            delimiter=spec.get("delimiter", "|"),
            stop_words=spec.get("stop_words", ()),
        )
    if kind == "english":
        from lucene_solr_ray.analysis.en import EnglishAnalyzer

        return EnglishAnalyzer(stop_words=spec.get("stop_words"))
    return StandardAnalyzer(
        stop_words=spec.get("stop_words", ()),
        max_token_length=spec.get(
            "max_token_length", DEFAULT_MAX_TOKEN_LENGTH
        ),
        position_increment_gap=spec.get("position_increment_gap", 0),
    )
