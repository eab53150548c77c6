"""Miscellaneous analysis filters (reference
``lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/`` + ``commongrams/`` + the tr/ ApostropheFilter and the
core DecimalDigitFilter) over the (term, position) stream protocol.

Graph-producing filters (WordDelimiterGraph, CommonGrams, KeywordRepeat)
follow this package's flattened-graph convention: stacked tokens share a
position (as stacked tokens do at index time in the reference), and
consecutive parts take consecutive positions with the tail renumbered —
FieldInvertState sees the same term/position multiset the reference's
flattened automaton produces for the supported flag set.
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, List

from lucene_solr_ray.analysis.filters import (CustomAnalyzer, Stream,
                                              TokenFilter)

__all__ = [
    "WordDelimiterGraphFilter", "DecimalDigitFilter",
    "CapitalizationFilter", "RemoveDuplicatesTokenFilter",
    "LimitTokenCountFilter", "KeepWordFilter", "FingerprintFilter",
    "HyphenatedWordsFilter", "KeywordRepeatFilter", "CommonGramsFilter",
    "CodepointCountFilter", "ApostropheFilter", "NormalizationFilter",
    "ClassicFilter", "TurkishLowerCaseFilter", "EnglishMinimalStemFilter",
    # WordDelimiterGraphFilter flag constants
    "GENERATE_WORD_PARTS", "GENERATE_NUMBER_PARTS", "CATENATE_WORDS",
    "CATENATE_NUMBERS", "CATENATE_ALL", "PRESERVE_ORIGINAL",
    "SPLIT_ON_CASE_CHANGE", "SPLIT_ON_NUMERICS",
    "STEM_ENGLISH_POSSESSIVE",
    "DelimitedTermFrequencyTokenFilter",
    "LimitTokenPositionFilter",
    "LimitTokenOffsetFilter",
    "PatternCaptureGroupTokenFilter",
    "DictionaryCompoundWordTokenFilter",
]


# -- WordDelimiterGraphFilter ------------------------------------------------

#: WordDelimiterGraphFilter.java:66-117 flag values
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

#: Solr's schema default for index analyzers
DEFAULT_WDF_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                     | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                     | STEM_ENGLISH_POSSESSIVE)


def _char_kind(c: str) -> int:
    if c.isalpha():
        return 1
    if c.isdigit():
        return 2
    return 0  # delimiter


class WordDelimiterGraphFilter(TokenFilter):
    """WordDelimiterGraphFilter.java: split tokens on intra-word
    delimiters, case changes and letter/number transitions; optionally
    catenate maximal part runs and/or preserve the original.

    "PowerShot" → Power, Shot; "wi-fi-4000" + CATENATE_ALL adds wifi4000;
    "O'Neil's" + possessive stemming → O, Neil.  Output positions are
    renumbered sequentially (flattened graph); catenations and the
    preserved original stack at their first part's position.
    """

    def __init__(self, flags: int = DEFAULT_WDF_FLAGS,
                 protected: Iterable[str] = ()):
        self.flags = flags
        self.protected = frozenset(protected)

    def _split(self, t: str) -> List[str]:
        parts: List[str] = []
        cur: List[str] = []
        prev_kind = 0
        prev_char = ""
        for c in t:
            kind = _char_kind(c)
            if kind == 0:
                if cur:
                    parts.append("".join(cur))
                    cur = []
            else:
                boundary = False
                if cur:
                    if (prev_kind != kind
                            and self.flags & SPLIT_ON_NUMERICS):
                        boundary = True
                    if (self.flags & SPLIT_ON_CASE_CHANGE
                            and prev_char.islower() and c.isupper()):
                        boundary = True
                if boundary:
                    parts.append("".join(cur))
                    cur = []
                cur.append(c)
            prev_kind = kind
            prev_char = c
        if cur:
            parts.append("".join(cur))
        if self.flags & STEM_ENGLISH_POSSESSIVE:
            # trailing 's was split off as its own part: drop bare "s"
            # parts that followed an apostrophe in the original
            stemmed = []
            for i, p in enumerate(parts):
                if p in ("s", "S") and i > 0:
                    # was it introduced by 's ?  find it in the source
                    if ("'" + p) in t or ("’" + p) in t:
                        continue
                stemmed.append(p)
            parts = stemmed
        return parts

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        pos = -1
        for t, _ in stream:
            if t in self.protected:
                pos += 1
                out.append((t, pos))
                continue
            parts = self._split(t)
            if len(parts) == 1 and parts[0] == t:
                pos += 1
                out.append((t, pos))
                continue
            first_pos = pos + 1
            emitted = False
            if self.flags & PRESERVE_ORIGINAL:
                out.append((t, first_pos))
                emitted = True
            gen_parts: List[str] = []
            for p in parts:
                want = (GENERATE_NUMBER_PARTS if p[0].isdigit()
                        else GENERATE_WORD_PARTS)
                if self.flags & want:
                    gen_parts.append(p)
            for j, p in enumerate(gen_parts):
                out.append((p, first_pos + j))
                emitted = True
            if gen_parts:
                pos = first_pos + len(gen_parts) - 1
            elif emitted:
                pos = first_pos
            # catenate maximal same-kind runs
            if self.flags & (CATENATE_WORDS | CATENATE_NUMBERS):
                run: List[str] = []
                run_kind = 0

                def flush(run, run_kind):
                    nonlocal emitted, pos
                    if len(run) > 1:
                        want = (CATENATE_NUMBERS if run_kind == 2
                                else CATENATE_WORDS)
                        if self.flags & want:
                            out.append(("".join(run), first_pos))
                            emitted = True
                            pos = max(pos, first_pos)

                for p in parts:
                    k = 2 if p[0].isdigit() else 1
                    if k != run_kind and run:
                        flush(run, run_kind)
                        run = []
                    run.append(p)
                    run_kind = k
                flush(run, run_kind)
            if self.flags & CATENATE_ALL and len(parts) > 1:
                out.append(("".join(parts), first_pos))
                emitted = True
                pos = max(pos, first_pos)
            if not emitted:
                pos = first_pos
                out.append((t, pos))  # nothing generated: pass through
        return out


# -- simple per-term filters -------------------------------------------------

class DecimalDigitFilter(TokenFilter):
    """core/DecimalDigitFilter.java: fold any Unicode decimal digit to
    its 0-9 ASCII form (١٢٣ → 123)."""

    def apply(self, stream: Stream) -> Stream:
        def fold(t: str) -> str:
            return "".join(
                str(unicodedata.decimal(c)) if c.isdigit()
                and unicodedata.decimal(c, None) is not None else c
                for c in t
            )
        return [(fold(t), p) for t, p in stream]


class CapitalizationFilter(TokenFilter):
    """miscellaneous/CapitalizationFilter.java with default settings:
    first letter uppercased, the rest lowercased, per token."""

    def apply(self, stream: Stream) -> Stream:
        return [
            ((t[0].upper() + t[1:].lower()) if t else t, p)
            for t, p in stream
        ]


class ApostropheFilter(TokenFilter):
    """tr/ApostropheFilter.java: strip the first apostrophe and
    everything after it (Turkish suffix convention)."""

    def apply(self, stream: Stream) -> Stream:
        out = []
        for t, p in stream:
            for i, c in enumerate(t):
                if c in "'’":
                    t = t[:i]
                    break
            if t:
                out.append((t, p))
        return out


class CodepointCountFilter(TokenFilter):
    """miscellaneous/CodepointCountFilter.java: keep
    min ≤ codePointCount ≤ max (Python strings count codepoints)."""

    def __init__(self, min_count: int = 0, max_count: int = 1 << 30):
        self.min = min_count
        self.max = max_count

    def apply(self, stream: Stream) -> Stream:
        return [(t, p) for t, p in stream if self.min <= len(t) <= self.max]


class KeepWordFilter(TokenFilter):
    """miscellaneous/KeepWordFilter.java: inverse stop filter."""

    def __init__(self, words: Iterable[str]):
        self.words = frozenset(words)

    def apply(self, stream: Stream) -> Stream:
        return [(t, p) for t, p in stream if t in self.words]


class NormalizationFilter(TokenFilter):
    """The ICUNormalizer2Filter role (lucene/analysis/icu/.../
    ICUNormalizer2Filter.java) backed by unicodedata: Unicode
    normalization (NFC/NFKC/NFD/NFKD) with optional case folding —
    ``form='nfkc_cf'`` approximates ICU's nfkc_cf profile via
    NFKC + str.casefold (full ICU special-case tables are out of scope;
    divergence limited to a handful of locale-sensitive codepoints)."""

    def __init__(self, form: str = "nfkc_cf"):
        form = form.lower()
        self.casefold = form.endswith("_cf")
        self.form = form[:-3].upper() if self.casefold else form.upper()
        if self.form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"unknown normalization form {form!r}")

    def apply(self, stream: Stream) -> Stream:
        out = []
        for t, p in stream:
            t = unicodedata.normalize(self.form, t)
            if self.casefold:
                t = unicodedata.normalize(self.form, t.casefold())
            if t:
                out.append((t, p))
        return out


# -- stream-shape filters ----------------------------------------------------

class RemoveDuplicatesTokenFilter(TokenFilter):
    """miscellaneous/RemoveDuplicatesTokenFilter.java: drop a token when
    the same term was already emitted at the same position."""

    def apply(self, stream: Stream) -> Stream:
        seen = set()
        out = []
        for t, p in stream:
            if (t, p) in seen:
                continue
            seen.add((t, p))
            out.append((t, p))
        return out


class LimitTokenCountFilter(TokenFilter):
    """miscellaneous/LimitTokenCountFilter.java: keep the first
    ``max_count`` tokens."""

    def __init__(self, max_count: int):
        self.max_count = max_count

    def apply(self, stream: Stream) -> Stream:
        return stream[: self.max_count]


class KeywordRepeatFilter(TokenFilter):
    """miscellaneous/KeywordRepeatFilter.java: emit every token twice at
    the same position — one protected from stemming, one not — so the
    index holds both the original and the stem.  The protected copy is
    registered with every downstream ``PorterStemFilter``-style filter
    via its ``protected`` set at chain-build time; here the repeat
    simply stacks the original, and a later RemoveDuplicates drops the
    copy when the stem equals the original (the reference's canonical
    chain)."""

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            out.append((t, p))
            out.append((t, p))
        return out


class HyphenatedWordsFilter(TokenFilter):
    """miscellaneous/HyphenatedWordsFilter.java: rejoin line-break
    hyphenations — a token ending in '-' merges with the following
    token (positions renumber after the merge)."""

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        i = 0
        while i < len(stream):
            t, p = stream[i]
            while t.endswith("-") and i + 1 < len(stream):
                t = t[:-1] + stream[i + 1][0]
                i += 1
            if t.endswith("-"):
                t = t[:-1]  # dangling hyphen at stream end
            out.append((t, len(out)))
            i += 1
        return out


class CommonGramsFilter(TokenFilter):
    """commongrams/CommonGramsFilter.java: for each adjacent pair where
    either term is a common word, stack the bigram ``a_b`` (type=gram)
    alongside the unigrams.  The gram is emitted with positionIncrement 0
    right after the FIRST unigram, i.e. at the first term's position
    (``gramToken()``, CommonGramsFilter.java:173) — phrase/span queries
    over gram tokens rely on that placement."""

    SEPARATOR = "_"

    def __init__(self, common_words: Iterable[str]):
        self.common = frozenset(common_words)

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for i, (t, p) in enumerate(stream):
            out.append((t, p))
            if i + 1 < len(stream):
                nt, nxt_p = stream[i + 1]
                if (nxt_p == p + 1) and (t in self.common
                                         or nt in self.common):
                    out.append((t + self.SEPARATOR + nt, p))
        return out


class FingerprintFilter(TokenFilter):
    """miscellaneous/FingerprintFilter.java: collapse the whole stream
    to ONE token — unique terms, sorted, joined by ``separator``; emits
    nothing if the joined size exceeds ``max_output_token_size``."""

    def __init__(self, max_output_token_size: int = 1024,
                 separator: str = " "):
        self.max_size = max_output_token_size
        self.sep = separator

    def apply(self, stream: Stream) -> Stream:
        uniq = sorted({t for t, _ in stream})
        if not uniq:
            return []
        joined = self.sep.join(uniq)
        if len(joined) > self.max_size:
            return []
        return [(joined, 0)]


#: 1:1/drop-only filters keep original-text offsets valid
CustomAnalyzer._OFFSET_SAFE = CustomAnalyzer._OFFSET_SAFE + (
    DecimalDigitFilter, CapitalizationFilter, ApostropheFilter,
    CodepointCountFilter, KeepWordFilter, NormalizationFilter,
    RemoveDuplicatesTokenFilter,
)


class ClassicFilter(TokenFilter):
    """``ClassicFilterFactory`` (reference ``analysis/standard/
    ClassicFilter.java``): strips a trailing possessive ``'s`` and
    removes the dots from acronym-shaped tokens (``I.B.M.`` -> ``IBM``).
    The reference keys off ClassicTokenizer token TYPES; this stream
    carries no types, so the shape tests stand in: an acronym is
    single letters separated by dots."""

    def apply(self, stream):
        import re

        acro = re.compile(r"^(?:[A-Za-z]\.)+[A-Za-z]?\.?$")
        out = []
        for t, p in stream:
            if t.endswith("'s") or t.endswith("\u2019s"):
                t = t[:-2]
            elif acro.match(t):
                t = t.replace(".", "")
            if t:
                out.append((t, p))
        return out


class TurkishLowerCaseFilter(TokenFilter):
    """``TurkishLowerCaseFilterFactory`` (reference ``analysis/tr/
    TurkishLowerCaseFilter.java``): Turkish-aware casing — dotted
    capital I (U+0130) lowers to ``i``, dotless ``I`` lowers to
    ``\u0131`` (dotless i), and ``I`` followed by COMBINING DOT ABOVE
    (U+0307) lowers to ``i`` with the combining dot consumed."""

    def apply(self, stream):
        out = []
        for t, p in stream:
            buf = []
            i = 0
            while i < len(t):
                ch = t[i]
                if ch == "\u0130":
                    buf.append("i")
                elif ch == "I":
                    if i + 1 < len(t) and t[i + 1] == "\u0307":
                        buf.append("i")
                        i += 1  # consume the combining dot
                    else:
                        buf.append("\u0131")
                else:
                    buf.append(ch.lower())
                i += 1
            out.append(("".join(buf), p))
        return out


class EnglishMinimalStemFilter(TokenFilter):
    """``EnglishMinimalStemFilterFactory`` (reference ``analysis/en/
    EnglishMinimalStemmer.java``): minimal plural-only stemming — drop a
    final ``s`` from words of length >= 4 unless it follows ``u`` or
    ``s`` (cats->cat, glass/focus unchanged).  Exactly the reference
    rule, nothing more."""

    def apply(self, stream):
        out = []
        for t, p in stream:
            out.append((self.stem(t), p))
        return out

    @staticmethod
    def stem(t: str) -> str:
        if len(t) < 4 or not t.endswith("s"):
            return t
        if t[-2] in ("u", "s"):
            return t
        return t[:-1]


CustomAnalyzer._OFFSET_SAFE = CustomAnalyzer._OFFSET_SAFE + (
    TurkishLowerCaseFilter,
)


class DelimitedTermFrequencyTokenFilter(TokenFilter):
    """``DelimitedTermFrequencyTokenFilterFactory`` (reference
    ``miscellaneous/DelimitedTermFrequencyTokenFilter.java:35``):
    ``term|3`` sets termFrequency=3.  This engine's postings count
    occurrences, so the filter emits the term ``freq`` times at ONE
    position — identical scoring freq and field length
    (``FieldInvertState`` adds termFrequency to length the same way)."""

    def __init__(self, delimiter: str = "|"):
        self.delimiter = delimiter

    def apply(self, stream):
        out = []
        for t, p in stream:
            term, _, freq = t.rpartition(self.delimiter)
            if term and freq.isdigit():
                out.extend([(term, p)] * max(1, int(freq)))
            else:
                out.append((t, p))
        return out


class LimitTokenPositionFilter(TokenFilter):
    """``LimitTokenPositionFilterFactory``: keep tokens whose position
    (1-based, increments included) is <= ``max_token_position``."""

    offset_safe = True

    def __init__(self, max_token_position: int):
        self.max_token_position = int(max_token_position)

    def apply(self, stream):
        return [(t, p) for t, p in stream
                if p + 1 <= self.max_token_position]


class LimitTokenOffsetFilter(TokenFilter):
    """``LimitTokenOffsetFilterFactory``: keep tokens whose START offset
    is <= ``max_start_offset`` (consumes source spans, so it must run
    before any span-invalidating filter)."""

    needs_offsets = True

    def __init__(self, max_start_offset: int):
        self.max_start_offset = int(max_start_offset)

    def apply_spans(self, stream, spans):
        return [(t, p) for t, p in stream
                if spans[p][0] <= self.max_start_offset]


class PatternCaptureGroupTokenFilter(TokenFilter):
    """``PatternCaptureGroupFilterFactory`` (reference
    ``pattern/PatternCaptureGroupTokenFilter.java:55``): emit every
    capture group of every pattern as a token at the SAME position;
    ``preserve_original=True`` keeps the input token first.  A token
    none of the patterns match passes through unchanged."""

    def __init__(self, patterns, preserve_original: bool = True):
        import re

        self.patterns = [re.compile(p) if isinstance(p, str) else p
                         for p in patterns]
        self.preserve_original = bool(preserve_original)

    def apply(self, stream):
        out = []
        for t, p in stream:
            caps = []
            for rx in self.patterns:
                for m in rx.finditer(t):
                    for gi in range(1, (m.re.groups or 0) + 1):
                        g = m.group(gi)
                        if g:
                            caps.append(g)
            if not caps:
                out.append((t, p))
                continue
            if self.preserve_original:
                out.append((t, p))
                # the reference skips a capture identical to the input
                caps = [c for c in caps if c != t]
            elif caps:
                pass
            for c in caps:
                out.append((c, p))
        return out


class DictionaryCompoundWordTokenFilter(TokenFilter):
    """``DictionaryCompoundWordTokenFilterFactory`` (reference
    ``compound/DictionaryCompoundWordTokenFilter.java:75``): for each
    token of at least ``min_word_size`` chars, emit every dictionary
    subword of length ``min_subword_size..max_subword_size`` found at
    any offset (``only_longest_match`` keeps one per start offset),
    stacked at the original's position AFTER it.  The dictionary is
    caller-supplied — no word list ships with the engine."""

    def __init__(self, dictionary, min_word_size: int = 5,
                 min_subword_size: int = 2, max_subword_size: int = 15,
                 only_longest_match: bool = False):
        self.dictionary = frozenset(w.lower() for w in dictionary)
        self.min_word_size = int(min_word_size)
        self.min_subword_size = int(min_subword_size)
        self.max_subword_size = int(max_subword_size)
        self.only_longest_match = bool(only_longest_match)

    def apply(self, stream):
        out = []
        for t, p in stream:
            out.append((t, p))
            if len(t) < self.min_word_size:
                continue
            low = t.lower()
            n = len(low)
            for i in range(0, n - self.min_subword_size + 1):
                longest = None
                for j in range(self.min_subword_size,
                               self.max_subword_size + 1):
                    if i + j > n:
                        break
                    if low[i:i + j] in self.dictionary:
                        if self.only_longest_match:
                            if longest is None or len(longest) < j:
                                longest = t[i:i + j]
                        else:
                            out.append((t[i:i + j], p))
                if self.only_longest_match and longest is not None:
                    out.append((longest, p))
        return out
