"""English analysis chain: possessive strip + stop filter + Porter stemmer.

Mirrors the reference's ``EnglishAnalyzer`` (``lucene/analysis/common/src/
java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:41-110``):
StandardTokenizer → EnglishPossessiveFilter → LowerCaseFilter → StopFilter
(classic 33-word English set) → SetKeywordMarkerFilter(stem exclusions) →
PorterStemFilter.

The stemmer implements M.F. Porter's 1980 algorithm ("An algorithm for
suffix stripping", Program 14(3):130-137) — the same published algorithm
the reference's ``PorterStemmer.java`` ports.  It is written from the
paper's rule tables, not translated from any implementation.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Iterable, List, Optional, Tuple

from lucene_solr_ray.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    lowercase,
)

__all__ = ["porter_stem", "EnglishAnalyzer", "strip_possessive"]

_VOWELS = set("aeiou")

_APOSTROPHES = ("'", "’", "＇")


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter: drop a trailing ``'s`` (any apostrophe
    variant, s or S) — reference
    ``analysis/en/EnglishPossessiveFilter.java:40-56``."""
    if len(token) >= 2 and token[-1] in ("s", "S") and \
            token[-2] in _APOSTROPHES:
        return token[:-2]
    return token


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonant run
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)
    )


def _ends_cvc(w: str) -> bool:
    """*o condition: ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def porter_stem(w: str) -> str:
    """The Porter (1980) stemming algorithm, steps 1a-5b."""
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0)
    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    )
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3 (m > 0)
    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4 (m > 1)
    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    )
    # longest-match order (the paper scans by suffix)
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


class EnglishAnalyzer(StandardAnalyzer):
    """tokenize → possessive-strip → lowercase → stop → stem."""

    def __init__(
        self,
        stop_words: Optional[Iterable[str]] = None,
        stem_exclusions: Iterable[str] = (),
    ) -> None:
        super().__init__(
            stop_words=ENGLISH_STOP_WORDS if stop_words is None
            else stop_words
        )
        self.stem_exclusions: FrozenSet[str] = frozenset(stem_exclusions)

    def _stem(self, t: str) -> str:
        if t in self.stem_exclusions:
            return t
        return porter_stem(t)

    def analyze(self, text: str) -> List[str]:
        from lucene_solr_ray.analysis.tokenizer import tokenize

        stop = self.stop_words
        out = []
        for tok in tokenize(text, self.max_token_length):
            lt = lowercase(strip_possessive(tok))
            if lt in stop:
                continue
            out.append(self._stem(lt))
        return out

    def analyze_with_positions(
        self, text: str
    ) -> Tuple[List[str], List[int], int]:
        from lucene_solr_ray.analysis.tokenizer import tokenize

        stop = self.stop_words
        terms: List[str] = []
        positions: List[int] = []
        for pos, tok in enumerate(tokenize(text, self.max_token_length)):
            lt = lowercase(strip_possessive(tok))
            if lt in stop:
                continue
            terms.append(self._stem(lt))
            positions.append(pos)
        return terms, positions, len(terms)

    def analyze_with_offsets(self, text: str):
        from lucene_solr_ray.analysis.tokenizer import tokenize_with_offsets

        stop = self.stop_words
        terms, positions, starts, ends = [], [], [], []
        for pos, (tok, s, e) in enumerate(
            tokenize_with_offsets(text, self.max_token_length)
        ):
            lt = lowercase(strip_possessive(tok))
            if lt in stop:
                continue
            terms.append(self._stem(lt))
            positions.append(pos)
            starts.append(s)
            ends.append(e)
        return terms, positions, starts, ends, len(terms)

    def normalize(self, text: str) -> str:
        # multi-term queries normalize WITHOUT stemming (Analyzer.normalize
        # applies only filters marked normalizing — LowerCaseFilter is,
        # PorterStemFilter is not)
        return lowercase(text)

    def spec(self) -> Dict:
        return {
            "kind": "english",
            "stop_words": sorted(self.stop_words),
        }
