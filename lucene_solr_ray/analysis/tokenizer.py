"""StandardTokenizer-equivalent: UAX#29 (Unicode 6.3) word-break segmentation.

Reimplements the token grammar of the reference
``lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizerImpl.jflex`` (rules at the bottom of that file) and the
driver semantics of ``StandardTokenizer.java:140-176``:

- WORD/NUMERIC tokens per the UAX#29 rules WB5-WB13b (Unicode 6.3 property
  assignments); Hangul/Katakana runs; single-char Han/Hiragana tokens;
  Southeast-Asian (Line_Break=Complex_Context) runs; everything else ignored.
- **maxTokenLength (default 255)**: the scanner buffer equals maxTokenLength
  (``StandardTokenizer.java:88-99``, ``%buffer 255``), and ``zzRefill``
  (``StandardTokenizerImpl.java:511-551``) never grows it — so a run longer
  than the buffer is emitted as the longest *accepting* match inside a
  maxTokenLength-char window, then scanning resumes (i.e. over-long runs are
  SPLIT, not dropped).  The explicit skip branch
  (``StandardTokenizer.java:162-165``) only fires when a complete match
  exceeds maxTokenLength while fitting the buffer, which cannot happen under
  default construction; we reproduce the split behavior.

Two engines:
- an ASCII fast path using stdlib ``re`` (exact for ASCII input under
  Unicode 6.3 property assignments),
- a general path using the ``regex`` module's Word_Break property classes,
  corrected where modern Unicode differs from 6.3 for chars the corpus can
  plausibly contain (``:`` is not MidLetter in 6.3; U+202F is not
  ExtendNumLet in 6.3).

Token *types* (ALPHANUM/NUM/...) are not materialized — this engine indexes
terms as strings and types never influence postings or scores.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

try:  # the `regex` module provides \p{WordBreak=...} classes
    import regex as _rx
except ImportError:  # pragma: no cover
    _rx = None

__all__ = [
    "tokenize",
    "tokenize_with_offsets",
    "DEFAULT_MAX_TOKEN_LENGTH",
    "MAX_TOKEN_LENGTH_LIMIT",
]

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH
MAX_TOKEN_LENGTH_LIMIT = 1024 * 1024  # StandardTokenizer.MAX_TOKEN_LENGTH_LIMIT


def _word_pattern(
    al: str, heb: str, num: str, kata: str, enl: str, midl: str, midn: str,
    sq: str, dq: str, extfmt: str,
) -> str:
    """Build the WORD rule regex from character-class atoms.

    Mirrors the jflex WORD production: ExtendNumLet* ( Katakana-chain |
    (Hebrew'|-chain | Numeric-chain | ALetter-chain)+ ) (ExtendNumLet+ ...)*
    ExtendNumLet*, where every atom absorbs trailing [Format Extend]* (WB4).
    """
    e = f"(?:{extfmt})*" if extfmt else ""
    AL = f"(?:{al}{e})"
    ALH = f"(?:[{_inner(al)}{_inner(heb)}]{e})" if heb else AL
    NUM = f"(?:{num}{e})"
    KATA = f"(?:{kata}{e})" if kata else None
    ENL = f"(?:{enl}{e})"
    MIDL = f"(?:[{_inner(midl)}{_inner(sq)}]{e})"  # MidLetter|MidNumLet|SQ
    MIDN = f"(?:[{_inner(midn)}{_inner(sq)}]{e})"  # MidNum|MidNumLet|SQ
    SQ = f"(?:{sq}{e})"

    # The jflex grammar's core is a +-loop over three alternative units:
    #   HEBQ = HebrewLetterEx (SingleQuoteEx | DoubleQuoteEx HebrewLetterEx)
    #   NUMCH = NumericEx ((ENL* | MidNumEx) NumericEx)*
    #   ALCH  = HebrewOrALetterEx ((ENL* | MidLetterEx) HebrewOrALetterEx)*
    # resolved by DFA longest-match.  A backtracking regex is leftmost-first,
    # not longest: to emulate longest-match we (a) try HEBQ first and (b)
    # guard the letter chain so it refuses to swallow — across an
    # ENL*/adjacent connector, where a unit boundary is possible — a Hebrew
    # letter that would otherwise start a HEBQ unit (quote attachment).
    # Across a MidLetter connector no unit boundary is possible, so the chain
    # consumes the letter freely and the quote stays unattached (matching
    # the DFA: "vav.vav'" keeps the dot-chain and drops the quote).
    num_chain = f"{NUM}(?:(?:{ENL}*|{MIDN}){NUM})*"
    if heb:
        hebq = f"(?:{heb}{e})(?:{SQ}|(?:{dq}{e})(?:{heb}{e}))"
        guard = f"(?!{heb}{e}(?:{sq}|{dq}{e}{heb}))" if dq else f"(?!{heb}{e}{sq})"
        al_chain = f"{ALH}(?:(?:{ENL}*{guard}|{MIDL}){ALH})*"
        core = f"(?:{hebq}|{num_chain}|{al_chain})+"
    else:
        al_chain = f"{ALH}(?:(?:{ENL}*|{MIDL}){ALH})*"
        core = f"(?:{num_chain}|{al_chain})+"
    if KATA:
        group = f"(?:{KATA}(?:{ENL}*{KATA})*|{core})"
    else:
        group = f"(?:{core})"
    return f"{ENL}*{group}(?:{ENL}+{group})*{ENL}*"


def _inner(cls: str | None) -> str:
    """Strip the surrounding [ ] of a character class to allow unioning."""
    if not cls:
        return ""
    if cls.startswith("[") and cls.endswith("]"):
        return cls[1:-1]
    return cls


# ---------------------------------------------------------------------------
# ASCII fast path (stdlib re) — the reference DFA's assignments restricted to
# ASCII (validated by fuzzing against tools/ref_dfa.py, which replays the
# generated JFlex tables of StandardTokenizerImpl.java):
#   ALetter=[A-Za-z]  Numeric=[0-9]  ExtendNumLet=[_]  MidNumLet=[.]
#   SingleQuote=[']  MidNum=[,;]  MidLetter=[:]  Extend/Format=∅
# (the reference grammar keeps ":" in MidLetter — "a:b" is ONE token; "." as
# MidNumLet joins both letter and number chains: "a.b", "3.14")
# ---------------------------------------------------------------------------
_ASCII_WORD = _word_pattern(
    al="[A-Za-z]", heb=None, num="[0-9]", kata=None, enl="[_]",
    midl="[:.]", midn="[,;.]", sq="[']", dq=None, extfmt=None,
)
_ASCII_RE = re.compile(_ASCII_WORD)

# Fast path: when no joiner char (. , ; : ') sits directly between two word
# chars, the WORD grammar degenerates to runs of [A-Za-z0-9_] that contain
# at least one alphanumeric (a pure "_" run is ExtendNumLet-only — not
# accepting).  The simple pattern scans ~8x faster than the full grammar.
_JOINER_BETWEEN = re.compile(r"[0-9A-Za-z_][.,;:'][0-9A-Za-z_']")
_SIMPLE_RUN = re.compile(r"_*[0-9A-Za-z][0-9A-Za-z_]*")

# ---------------------------------------------------------------------------
# General Unicode path (regex module), 6.3-corrected where it matters.
# ---------------------------------------------------------------------------
if _rx is not None:
    _V = _rx.V1
    # ALetter in the WORD rule context must exclude scripts handled by their
    # own rules (Han/Hiragana are not ALetter; already excluded by WB data).
    _U_AL = r"\p{WordBreak=ALetter}"
    _U_HEB = r"\p{WordBreak=HebrewLetter}"
    # jflex NumericEx adds fullwidth digits from Half/Fullwidth Forms block
    _U_NUM = r"[\p{WordBreak=Numeric}０-９]"
    _U_KATA = r"\p{WordBreak=Katakana}"
    _U_ENL = r"[\p{WordBreak=ExtendNumLet}--[ ]]"  # U+202F added post-6.3
    # reference grammar: MidLetter keeps the colon family; MidNumLet ('.' &c)
    # joins both letter chains (WB6/7) and number chains (WB11/12) — validated
    # against the reference DFA via tools/ref_dfa.py
    _U_MIDL = r"[\p{WordBreak=MidLetter}\p{WordBreak=MidNumLet}:﹕：]"
    _U_MIDN = r"[\p{WordBreak=MidNum}\p{WordBreak=MidNumLet}]"
    _U_SQ = r"\p{WordBreak=SingleQuote}"
    _U_DQ = r"\p{WordBreak=DoubleQuote}"
    # ZWJ (U+200D) is WordBreak=Extend in Unicode 6.3; modern tables give it
    # its own ZWJ class — fold it back in
    _U_EXTFMT = "[\\p{WordBreak=Format}\\p{WordBreak=Extend}‍]"

    _U_WORD = _word_pattern(
        al=_U_AL, heb=_U_HEB, num=_U_NUM, kata=_U_KATA, enl=_U_ENL,
        midl=_U_MIDL, midn=_U_MIDN, sq=_U_SQ, dq=_U_DQ,
        extfmt=_U_EXTFMT,
    )
    _E = f"(?:{_U_EXTFMT})*"
    _U_HANGUL = rf"(?:[\p{{Script=Hangul}}&&[{_U_AL[0:0]}\p{{WordBreak=ALetter}}\p{{WordBreak=HebrewLetter}}]]{_E})+"
    _U_SEA = rf"(?:\p{{LineBreak=ComplexContext}}{_E})+"
    _U_HAN = rf"\p{{Script=Han}}{_E}"
    _U_HIRA = rf"\p{{Script=Hiragana}}{_E}"
    # WORD first: it is a superset of the NUMERIC/HANGUL/KATAKANA rules'
    # languages, so greedy leftmost matching == jflex longest-match.
    _U_MASTER = _rx.compile(
        f"(?:{_U_WORD})|(?:{_U_SEA})|(?:{_U_HAN})|(?:{_U_HIRA})", _V
    )
else:  # pragma: no cover
    _U_MASTER = None


def _scan(pattern, text: str, max_token_length: int) -> Iterator[Tuple[int, int]]:
    """Longest-match scan with the maxTokenLength buffer-window semantics."""
    pos, n = 0, len(text)
    search, match = pattern.search, pattern.match
    while pos < n:
        m = search(text, pos)
        if m is None:
            return
        s, e = m.span()
        if e - s <= max_token_length:
            yield s, e
            pos = e
        else:
            # longest accepting match within a maxTokenLength-char window
            mm = match(text, s, s + max_token_length)
            if mm is None or mm.end() == s:
                # no accepting match fits the window (e.g. a >255-char
                # ExtendNumLet run) — the grammar's catch-all rule skips
                # one char and rescans (window shifts with the position)
                pos = s + 1
                continue
            yield mm.start(), mm.end()
            pos = mm.end()


def tokenize(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> List[str]:
    """Tokenize per the StandardTokenizer grammar; returns raw token texts."""
    if text.isascii():
        if _JOINER_BETWEEN.search(text) is None:
            toks = _SIMPLE_RUN.findall(text)
            if not toks or len(max(toks, key=len)) <= max_token_length:
                return toks
        if len(text) <= max_token_length:
            # no token can exceed the window — plain findall
            return _ASCII_RE.findall(text)
        toks = _ASCII_RE.findall(text)
        if not any(len(t) > max_token_length for t in toks):
            return toks
        return [text[s:e] for s, e in _scan(_ASCII_RE, text, max_token_length)]
    if _U_MASTER is None:  # pragma: no cover
        raise RuntimeError("regex module required for non-ASCII input")
    return [text[s:e] for s, e in _scan(_U_MASTER, text, max_token_length)]


def tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> List[Tuple[str, int, int]]:
    """Tokens with (start, end) char offsets (offsets as in OffsetAttribute)."""
    pat = _ASCII_RE if text.isascii() else _U_MASTER
    if pat is None:  # pragma: no cover
        raise RuntimeError("regex module required for non-ASCII input")
    return [(text[s:e], s, e) for s, e in _scan(pat, text, max_token_length)]
