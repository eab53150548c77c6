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
    "ClassicTokenizer",
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


# ---------------------------------------------------------------------------
# ClassicTokenizer — the pre-3.1 StandardTokenizer grammar
# ---------------------------------------------------------------------------

#: Chinese/Japanese ranges the grammar tokenizes char-by-char (NOT Korean)
_CJ_CLS = ("㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
           "㌀-㍿㐀-䶿一-鿿豈-﫿"
           "･-ﾟ")
_C_LETTER = rf"(?:(?![{_CJ_CLS}])[^\W\d_])"        # [:letter:] minus CJ
_C_THAI = "฀-๙"
_C_AN = rf"(?:{_C_LETTER}|[{_C_THAI}]|\d)+"        # ALPHANUM
_C_ALPHA = rf"{_C_LETTER}+"

_C_AN_RE = re.compile(_C_AN)
_C_DIGIT_RE = re.compile(r"\d")
_C_P = "_-/.,"

#: (type, regex) in the jflex rule-priority order; NUM and CJ are handled
#: out-of-band (NUM needs true longest-match over its alternation)
_C_RULES = [
    ("<ALPHANUM>", _C_AN_RE),
    ("<APOSTROPHE>", re.compile(rf"{_C_ALPHA}(?:'{_C_ALPHA})+")),
    ("<ACRONYM>", re.compile(rf"{_C_LETTER}\.(?:{_C_LETTER}\.)+")),
    ("<COMPANY>", re.compile(rf"{_C_ALPHA}[&@]{_C_ALPHA}")),
    ("<EMAIL>", re.compile(
        rf"{_C_AN}(?:[._\-]{_C_AN})*@{_C_AN}(?:[.\-]{_C_AN})+")),
    ("<HOST>", re.compile(rf"{_C_AN}(?:\.{_C_AN})+")),
]
_C_ACRO_DEP = re.compile(rf"{_C_AN}\.(?:{_C_AN}\.)+")
_C_CJ_RE = re.compile(rf"[{_CJ_CLS}]")


def _classic_num_end(text: str, i: int) -> int:
    """Longest NUM match at ``i`` (jflex longest-match over the six
    alternatives): a chain of >=2 ALPHANUM segments joined by single
    punctuation where every other segment contains a digit — track both
    parities and keep the longest prefix either one admits."""
    segs = []  # (end, has_digit)
    pos = i
    while True:
        m = _C_AN_RE.match(text, pos)
        if m is None:
            break
        segs.append((m.end(), bool(_C_DIGIT_RE.search(m.group()))))
        pos = m.end()
        if pos < len(text) and text[pos] in _C_P \
                and _C_AN_RE.match(text, pos + 1):
            pos += 1
            continue
        break
    best = i
    odd_ok = even_ok = True
    for j, (end, hd) in enumerate(segs):
        if j % 2 == 1 and not hd:
            odd_ok = False
        if j % 2 == 0 and not hd:
            even_ok = False
        if j >= 1 and (odd_ok or even_ok):
            best = end
    return best


class ClassicTokenizer(TokenizerFactory):
    """The classic (pre-3.1) StandardTokenizer grammar
    (``lucene/analysis/common/.../standard/ClassicTokenizerImpl.jflex``,
    ``ClassicTokenizer.java:131``): ALPHANUM, APOSTROPHE (O'Reilly's),
    ACRONYM (U.S.A.), COMPANY (AT&T), EMAIL, HOST, NUM (alphanum chains
    where every other segment has a digit), CJ chars one-by-one.
    ACRONYM_DEP (dotted-alphanum with trailing dot) emits as HOST with
    the final dot dropped, exactly the reference's incrementToken.
    Over-long tokens are SKIPPED (position gap), not chunked.

    Longest match across rules, first rule winning ties — jflex
    semantics replayed with per-rule longest matches.  [:letter:] is the
    running Python build's Unicode table; the generated reference tables
    froze Unicode 3.0 (divergence only on codepoints assigned since)."""

    def run(self, text: str, max_token_length: int) -> List[Quad]:
        return [
            (t, p, s, e)
            for t, p, s, e, _ in self.run_with_types(
                text, max_token_length)
        ]

    def run_with_types(self, text: str, max_token_length: int):
        out = []
        pos_counter = 0
        i = 0
        n = len(text)
        while i < n:
            best_len, best_type, best_term_end = 0, None, 0
            for typ, rx in _C_RULES:
                m = rx.match(text, i)
                if m is not None and m.end() - i > best_len:
                    best_len = m.end() - i
                    best_type = typ
                    best_term_end = m.end()
            num_end = _classic_num_end(text, i)
            if num_end - i > best_len:
                best_len = num_end - i
                best_type = "<NUM>"
                best_term_end = num_end
            if best_len == 0 and _C_CJ_RE.match(text, i):
                best_len, best_type, best_term_end = 1, "<CJ>", i + 1
            m = _C_ACRO_DEP.match(text, i)
            if m is not None and m.end() - i > best_len:
                # ACRONYM_DEP → HOST with the trailing '.' dropped from
                # the term (end offset keeps it, as the reference does)
                best_len = m.end() - i
                best_type = "<HOST>"
                best_term_end = m.end() - 1
            if best_type is None:
                i += 1
                continue
            end = i + best_len
            if best_len <= max_token_length:
                out.append((text[i:best_term_end], pos_counter, i, end,
                            best_type))
            # a skipped over-long token still advances the position
            pos_counter += 1
            i = end
        return out
