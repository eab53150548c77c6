"""CJK analysis: width folding + overlapping bigrams.

Reference ``lucene/analysis/cjk/src/java/org/apache/lucene/analysis/cjk/``:

- ``CJKWidthFilter.java`` — folds fullwidth ASCII variants (U+FF01–FF5E)
  to their halfwidth forms and halfwidth katakana variants (U+FF61–FF9F)
  to fullwidth, composing dakuten/handakuten (``ﾊ`` + ``ﾞ`` → ``バ``); a
  deliberate subset of NFKC limited to width folds.
- ``CJKBigramFilter.java`` — StandardTokenizer emits Han (and hiragana)
  codepoints as single tokens and katakana/hangul as runs; this filter
  re-streams consecutive CJK characters as overlapping bigrams (the
  classic CJK indexing unit), leaving a lone CJK character as a unigram
  and optionally double-indexing unigrams alongside (``outputUnigrams``).
- ``CJKAnalyzer.java`` — StandardTokenizer → CJKWidthFilter →
  LowerCaseFilter → CJKBigramFilter → StopFilter.

Script flags mirror the reference's HAN/HIRAGANA/KATAKANA/HANGUL flag
constants: a disabled script's tokens pass through unchanged and act as
bigram boundaries, exactly like ``TestCJKBigramFilter.testHanOnly``.
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional, Tuple

from lucene_solr_ray.analysis.analyzer import ENGLISH_STOP_WORDS
from lucene_solr_ray.analysis.filters import (
    CustomAnalyzer,
    LowerCaseFilter,
    StopFilter,
    TokenFilter,
)

__all__ = ["CJKWidthFilter", "CJKBigramFilter", "CJKAnalyzer"]

Stream = List[Tuple[str, int]]

#: U+FF01–FF5E are the fullwidth forms of ASCII 0x21–0x7E
_FULLWIDTH_ASCII = {cp: cp - 0xFF00 + 0x20 for cp in range(0xFF01, 0xFF5F)}


def _fold_width(term: str) -> str:
    t = term.translate(_FULLWIDTH_ASCII)
    # halfwidth katakana + halfwidth CJK punctuation: NFKC on just those
    # runs performs the fullwidth mapping AND the voiced-mark composition
    # (FF9E/FF9F become combining U+3099/309A, then compose)
    if any(0xFF61 <= ord(c) <= 0xFF9F for c in t):
        out, run = [], []
        for c in t:
            if 0xFF61 <= ord(c) <= 0xFF9F:
                run.append(c)
            else:
                if run:
                    out.append(unicodedata.normalize("NFKC", "".join(run)))
                    run = []
                out.append(c)
        if run:
            out.append(unicodedata.normalize("NFKC", "".join(run)))
        t = "".join(out)
    return t


class CJKWidthFilter(TokenFilter):
    """``CJKWidthFilterFactory`` (CJKWidthFilter.java:34)."""

    #: 1:1 term rewrite — source spans stay valid (CustomAnalyzer offsets)
    offset_safe = True

    def apply(self, stream: Stream) -> Stream:
        return [(_fold_width(t), p) for t, p in stream]


def _script(ch: str) -> Optional[str]:
    o = ord(ch)
    if 0x3040 <= o <= 0x309F:
        return "hiragana"
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF \
            or 0x3130 <= o <= 0x318F:
        return "hangul"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF \
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2FA1F:
        return "han"
    return None


def _token_script(term: str) -> Optional[str]:
    """The token's script if every codepoint agrees (katakana runs may
    include the prolonged-sound mark U+30FC, which the block covers)."""
    scripts = {_script(c) for c in term}
    if len(scripts) == 1:
        return scripts.pop()
    return None


class CJKBigramFilter(TokenFilter):
    """``CJKBigramFilterFactory`` (CJKBigramFilter.java:48).

    Buffers characters from consecutive eligible tokens and emits
    overlapping bigrams; a buffered run of one character is emitted as a
    unigram (the reference's ``<SINGLE>`` type).  ``output_unigrams``
    additionally emits every character at the same position as the bigram
    it starts (posIncr-0 stacking, the reference's double-indexing mode).

    Run boundaries: the reference joins two tokens only when their source
    OFFSETS are contiguous (``offsetAtt.startOffset() != lastEndOffset``
    clears the buffer — CJKBigramFilter.java:179), so "한국어 텍스트"
    bigrams within each word but never across the space.  Inside a
    ``CustomAnalyzer`` chain this filter receives those spans
    (``needs_offsets``) and applies the exact rule.  Standalone
    ``apply()`` has no offsets and uses the conservative approximation:
    single-character eligible tokens at consecutive positions join
    (unspaced CJK prose — the case where Han/hiragana arrive one char per
    token), multi-character runs (katakana/hangul words) bigram only
    internally."""

    #: CustomAnalyzer passes source spans via apply_spans
    needs_offsets = True

    def __init__(self, han: bool = True, hiragana: bool = True,
                 katakana: bool = True, hangul: bool = True,
                 output_unigrams: bool = False):
        self.scripts = {
            s for s, on in (("han", han), ("hiragana", hiragana),
                            ("katakana", katakana), ("hangul", hangul))
            if on
        }
        self.output_unigrams = output_unigrams

    def apply_spans(self, stream: Stream, spans) -> Stream:
        return self._apply(stream, spans)

    def apply(self, stream: Stream) -> Stream:
        return self._apply(stream, None)

    def _apply(self, stream: Stream, spans) -> Stream:
        out: Stream = []
        buf: List[str] = []
        out_pos = -1
        prev_pos = None
        prev_end = None
        prev_multi = False

        def flush():
            nonlocal out_pos
            if not buf:
                return
            if len(buf) == 1:
                out_pos += 1
                out.append((buf[0], out_pos))
            else:
                for i in range(len(buf) - 1):
                    out_pos += 1
                    if self.output_unigrams:
                        out.append((buf[i], out_pos))
                    out.append((buf[i] + buf[i + 1], out_pos))
                if self.output_unigrams:
                    out.append((buf[-1], out_pos + 1))
                    out_pos += 1
            buf.clear()

        for term, pos in stream:
            if spans is not None:
                start, end = spans[pos]
                contiguous = prev_end is not None and start == prev_end
            else:
                start = end = None
                contiguous = (
                    prev_pos is not None and pos - prev_pos == 1
                    and not prev_multi and len(term) == 1
                )
            script = _token_script(term)
            eligible = script is not None and script in self.scripts
            if eligible:
                if buf and not contiguous:
                    flush()
                buf.extend(term)
            else:
                flush()
                out_pos += 1
                out.append((term, out_pos))
            prev_pos = pos
            prev_end = end
            prev_multi = len(term) > 1
            if spans is None and eligible and len(term) > 1:
                # a multi-char run never joins the NEXT token either
                flush()
        flush()
        return out


class CJKAnalyzer(CustomAnalyzer):
    """``CJKAnalyzer.java:44`` — width fold, lowercase, bigram, stop."""

    def __init__(self, stopwords=None, **kw):
        super().__init__(
            filters=[
                CJKWidthFilter(),
                LowerCaseFilter(),
                CJKBigramFilter(),
                StopFilter(ENGLISH_STOP_WORDS if stopwords is None
                           else set(stopwords)),
            ],
            **kw,
        )
