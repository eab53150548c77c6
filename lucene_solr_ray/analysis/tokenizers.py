"""Tokenizer factories beyond the default UAX#29 StandardTokenizer.

Reference: the CharTokenizer family and friends in
``lucene/analysis/common/src/java/org/apache/lucene/analysis/core/``
(``WhitespaceTokenizer.java``, ``LetterTokenizer.java``,
``LowerCaseTokenizer.java``, ``KeywordTokenizer.java``),
``.../path/PathHierarchyTokenizer.java`` /
``ReversePathHierarchyTokenizer.java``,
``.../pattern/PatternTokenizer.java`` and
``.../ngram/NGramTokenizer.java`` / ``EdgeNGramTokenizer.java``.

Each factory's ``run(text, max_token_length)`` returns
``[(term, position, start, end), ...]`` — position carries the
reference's posIncrement semantics (PathHierarchy stacks every level at
position 0, exactly the posIncr 1,0,0,... stream the reference emits),
offsets index the text handed to the tokenizer (CharFilter corrections
happen in CustomAnalyzer).

These plug into :class:`~lucene_solr_ray.analysis.filters.CustomAnalyzer`
via ``CustomAnalyzer(tokenizer=WhitespaceTokenizer())`` — the filter
chain, norms and index plumbing are unchanged.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

__all__ = [
    "TokenizerFactory",
    "WhitespaceTokenizer",
    "LetterTokenizer",
    "LowerCaseTokenizer",
    "KeywordTokenizer",
    "PathHierarchyTokenizer",
    "PatternTokenizer",
    "NGramTokenizer",
    "EdgeNGramTokenizer",
]

Quad = Tuple[str, int, int, int]  # (term, position, start, end)

# Java Character.isWhitespace excludes the non-breaking spaces that
# Python's \s (str.isspace) includes — a WhitespaceTokenizer must keep
# "a b" ONE token, as the reference does
_JAVA_WS_TOKEN = re.compile(r"(?:[^\s]|[   ])+")
_LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


def _chunk(m_start: int, tok: str, max_len: int, out: List[Quad],
           pos: int) -> int:
    """CharTokenizer buffer-overflow behavior: a run longer than
    maxTokenLen is emitted in max-length chunks (``CharTokenizer.java``
    flushes the buffer at maxTokenLen and keeps consuming)."""
    for i in range(0, len(tok), max_len):
        piece = tok[i: i + max_len]
        out.append((piece, pos, m_start + i, m_start + i + len(piece)))
        pos += 1
    return pos


class TokenizerFactory:
    """Base: subclasses implement :meth:`run`."""

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        raise NotImplementedError  # subclass responsibility

    #: True when a token may share its position with the previous one
    #: (PathHierarchy); offset-carrying paths need unique positions
    stacks_positions = False


class WhitespaceTokenizer(TokenizerFactory):
    """Maximal runs of non-whitespace (``WhitespaceTokenizer.java:28``,
    Java ``Character.isWhitespace`` — NBSP is NOT whitespace)."""

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        out: List[Quad] = []
        pos = 0
        for m in _JAVA_WS_TOKEN.finditer(text):
            pos = _chunk(m.start(), m.group(), max_token_length, out, pos)
        return out


class LetterTokenizer(TokenizerFactory):
    """Maximal runs of Unicode letters (``LetterTokenizer.java:30``)."""

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        out: List[Quad] = []
        pos = 0
        for m in _LETTER_RUN.finditer(text):
            pos = _chunk(m.start(), m.group(), max_token_length, out, pos)
        return out


class LowerCaseTokenizer(LetterTokenizer):
    """LetterTokenizer + lowercase in one pass
    (``LowerCaseTokenizer.java:38``)."""

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        return [(t.lower(), p, s, e)
                for t, p, s, e in super().run(text, max_token_length)]


class KeywordTokenizer(TokenizerFactory):
    """The entire input as ONE token (``KeywordTokenizer.java:25``)."""

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        if not text:
            return []
        return [(text, 0, 0, len(text))]


class PathHierarchyTokenizer(TokenizerFactory):
    """``/a/b/c`` → ``/a``, ``/a/b``, ``/a/b/c`` — every prefix path, all
    at position 0 (posIncr 1,0,0,...), start offset anchored at 0
    (``PathHierarchyTokenizer.java:33``).  ``replacement`` substitutes
    the delimiter in emitted terms; ``skip`` drops that many leading
    parts.  ``reverse=True`` is ``ReversePathHierarchyTokenizer``:
    every SUFFIX path (``www.site.co.uk`` → ``www.site.co.uk``,
    ``site.co.uk``, ``co.uk``, ``uk`` for delimiter ``.``), ``skip``
    dropping trailing parts."""

    stacks_positions = True

    def __init__(self, delimiter: str = "/",
                 replacement: Optional[str] = None, skip: int = 0,
                 reverse: bool = False):
        self.delimiter = delimiter
        self.replacement = delimiter if replacement is None else replacement
        self.skip = int(skip)
        self.reverse = bool(reverse)

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        if not text:
            return []
        d = self.delimiter
        out: List[Quad] = []
        if not self.reverse:
            # boundaries: end index of each part (delimiter positions +
            # end of string); a leading delimiter belongs to the first part
            ends = [m.start() for m in re.finditer(re.escape(d), text)
                    if m.start() != 0]
            ends.append(len(text))
            for i, e in enumerate(ends):
                if i < self.skip:
                    continue
                term = text[:e].replace(d, self.replacement)
                out.append((term, 0, 0, e))
        else:
            starts = [m.end() for m in re.finditer(re.escape(d), text)
                      if m.end() != len(text)]
            starts.insert(0, 0)
            n = len(starts)
            for i, s in enumerate(starts):
                if n - 1 - i < self.skip:
                    continue
                term = text[s:].replace(d, self.replacement)
                out.append((term, 0, s, len(text)))
        return out


class PatternTokenizer(TokenizerFactory):
    """Regex tokenizer (``PatternTokenizer.java:45``): ``group=-1``
    splits on the pattern, ``group>=0`` emits that capture group of each
    match."""

    def __init__(self, pattern: str, group: int = -1):
        self.rx = re.compile(pattern)
        self.group = int(group)

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        out: List[Quad] = []
        pos = 0
        if self.group >= 0:
            for m in self.rx.finditer(text):
                t = m.group(self.group)
                if t:
                    out.append((t, pos, m.start(self.group),
                                m.end(self.group)))
                    pos += 1
            return out
        prev = 0
        for m in self.rx.finditer(text):
            if m.start() > prev:
                out.append((text[prev:m.start()], pos, prev, m.start()))
                pos += 1
            prev = m.end()
        if prev < len(text):
            out.append((text[prev:], pos, prev, len(text)))
        return out


class NGramTokenizer(TokenizerFactory):
    """Character n-grams over the whole input, per-start sizes ascending
    — ``"abcde"``, 1..2 → a, ab, b, bc, c, cd, d, de, e
    (``NGramTokenizer.java:42``, the 4.4+ stream order)."""

    def __init__(self, min_gram: int = 1, max_gram: int = 2):
        if not 0 < min_gram <= max_gram:
            raise ValueError("need 0 < min_gram <= max_gram")
        self.min_gram, self.max_gram = int(min_gram), int(max_gram)

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        out: List[Quad] = []
        pos = 0
        n = len(text)
        for s in range(n - self.min_gram + 1):
            for g in range(self.min_gram, self.max_gram + 1):
                if s + g > n:
                    break
                out.append((text[s:s + g], pos, s, s + g))
                pos += 1
        return out


class EdgeNGramTokenizer(TokenizerFactory):
    """Front-anchored grams min..max (``EdgeNGramTokenizer.java:30``):
    ``"abcde"``, 1..3 → a, ab, abc."""

    def __init__(self, min_gram: int = 1, max_gram: int = 1):
        if not 0 < min_gram <= max_gram:
            raise ValueError("need 0 < min_gram <= max_gram")
        self.min_gram, self.max_gram = int(min_gram), int(max_gram)

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        return [(text[:g], p, 0, g)
                for p, g in enumerate(range(
                    self.min_gram, min(self.max_gram, len(text)) + 1))]
