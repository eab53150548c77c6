"""Snowball English stemmer (Porter2) + SnowballFilter.

Reference: ``lucene/analysis/common/src/java/org/tartarus/snowball/ext/
EnglishStemmer.java`` (generated from the public Snowball "english"
script) wrapped by ``.../analysis/snowball/SnowballFilter.java:52``.
This is an independent implementation of the published Porter2
algorithm — the suffix tables and region rules are the public spec; the
reference's generated Among-automaton code was only consulted to confirm
the tables.

Porter2 refines Porter 1980 (the existing ``PorterStemFilter``): special
R1 for gener-/commun-/arsen-, exceptional word forms, the valid-li rule,
and the short-syllable e-restoration.
"""

from __future__ import annotations

from typing import Optional

from lucene_solr_ray.analysis.filters import Stream, TokenFilter

__all__ = ["porter2_stem", "SnowballFilter"]

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_VALID_LI = set("cdeghkmnrt")

#: exceptional forms checked before the algorithm runs
_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

#: words that stop after step 1a
_EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

#: step 2 suffix → replacement (longest match wins; None = special)
_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _is_vowel(w: str, i: int) -> bool:
    # 'Y' (marked consonant y) is never a vowel
    return w[i] in _VOWELS


def _regions(w: str) -> tuple:
    """(R1, R2) start indexes — R1 after the first non-vowel following a
    vowel, with the gener-/commun-/arsen- special case."""
    r1 = len(w)
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(w)):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at(w: str, i: int) -> bool:
    """A short syllable ending at index i (the vowel position rule)."""
    if i == 0:
        # word-initial: vowel followed by non-vowel
        return (
            len(w) >= 2 and _is_vowel(w, 0) and not _is_vowel(w, 1)
        )
    return (
        i + 1 < len(w)
        and _is_vowel(w, i)
        and not _is_vowel(w, i + 1)
        and w[i + 1] not in "wx" and w[i + 1] != "Y"
        and not _is_vowel(w, i - 1)
    )


def _is_short(w: str, r1: int) -> bool:
    """Word is short: R1 is null and it ends in a short syllable."""
    if r1 < len(w):
        return False
    if len(w) >= 2 and _short_syllable_at(w, len(w) - 2):
        return True
    return len(w) == 2 and _is_vowel(w, 0) and not _is_vowel(w, 1)


def porter2_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    exc = _EXCEPTIONS1.get(w)
    if exc is not None:
        return exc
    # mark consonant y's as Y (word-initial, or after a vowel)
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _regions(w)

    # step 0: strip 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        if any(_is_vowel(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w

    # step 1b
    hit = None
    for suf in ("eedly", "eed", "ingly", "edly", "ing", "ed"):
        if w.endswith(suf):
            hit = suf
            break
    if hit in ("eed", "eedly"):
        if len(w) - len(hit) >= r1:
            w = w[: -len(hit)] + "ee"
    elif hit is not None:
        stem = w[: -len(hit)]
        if any(_is_vowel(stem, i) for i in range(len(stem))):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif _is_short(w, r1):
                w += "e"

    # step 1c: y → i after a non-vowel that is not the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    # step 2 (longest suffix; fires only when the match is in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _VALID_LI:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - 5 >= r2:
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (in R2)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1
            and not _short_syllable_at(w, len(w) - 3)
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y")


# ---------------------------------------------------------------------------
# Snowball German
# ---------------------------------------------------------------------------

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")   # valid s-ending
_DE_ST_END = frozenset("bdfghklmnt")   # valid st-ending (no r)


def _de_regions(w: str):
    """Standard R1/R2 over the marked word, then R1 adjusted so at least
    3 letters precede it (the german script's special rule)."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r2 = i + 1
            break
    return max(r1, 3), r2


def german_stem(word: str) -> str:
    """Snowball "german" (the public script; generated form
    ``org/tartarus/snowball/ext/GermanStemmer.java``): ß→ss, u/y between
    vowels marked consonant, three backward suffix steps over R1/R2,
    then umlauts folded."""
    w = word.replace("ß", "ss")
    if len(w) < 2:
        return w
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()  # mark as consonant
    w = "".join(chars)
    r1, r2 = _de_regions(w)

    def in_r1(start: int) -> bool:
        return start >= r1

    def in_r2(start: int) -> bool:
        return start >= r2

    # step 1: em ern er | e en es (+niss) | s after valid s-ending
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if suf in ("ern", "em", "er"):
            if in_r1(start):
                w = w[:start]
        elif suf == "s":
            if in_r1(start) and start >= 1 and w[start - 1] in _DE_S_END:
                w = w[:start]
        else:
            if in_r1(start):
                w = w[:start]
                if w.endswith("niss"):
                    w = w[:-1]
        break

    # step 2: en er est | st after valid st-ending with >=3 before it
    for suf in ("est", "en", "er", "st"):
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if suf == "st":
            if in_r1(start) and start >= 1 and w[start - 1] in _DE_ST_END \
                    and start - 1 >= 3:
                w = w[:start]
        else:
            if in_r1(start):
                w = w[:start]
        break

    # step 3 (d-suffixes)
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(start):
                w = w[:start]
                if w.endswith("ig") and not w.endswith("eig") \
                        and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(start) and not (start >= 1 and w[start - 1] == "e"):
                w = w[:start]
        elif suf in ("lich", "heit"):
            if in_r2(start):
                w = w[:start]
                for pre in ("er", "en"):
                    if w.endswith(pre) and in_r1(len(w) - 2):
                        w = w[:-2]
                        break
        else:  # keit
            if in_r2(start):
                w = w[:start]
                for pre in ("lich", "ig"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        break

    return (
        w.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


class SnowballFilter(TokenFilter):
    """``SnowballFilterFactory``: language="English" (Porter2) or
    "German" (the german script).  Other Snowball languages are not
    bundled — their scripts are language-specific rule packs this engine
    only adds with exact public sources."""

    def __init__(self, language: str = "English"):
        lang = language.lower()
        if lang in ("english", "porter2"):
            self._stem = porter2_stem
        elif lang == "german":
            self._stem = german_stem
        else:
            raise NotImplementedError(
                f"Snowball language {language!r} not bundled; English "
                "(Porter2) and German are"
            )

    #: term rewrite only — offsets stay valid
    offset_safe = True

    def apply(self, stream: Stream) -> Stream:
        stem = self._stem
        return [(stem(t), p) for t, p in stream]
