"""Phonetic encoders + PhoneticFilter.

The reference's phonetic analysis module
(`lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java` + `PhoneticFilterFactory.java`) delegates encoding to
Apache commons-codec.  These are clean-room implementations of the same
published algorithms (American Soundex / NARA variant with the H-W rule,
Refined Soundex, Lawrence Philips' 1990 Metaphone, Caverphone 2.0
(Hood 2004), NYSIIS, and the Kölner Phonetik (Postel 1969)) — the
factory's ``encoder=`` choices minus the table-heavy BeiderMorse.

``PhoneticFilter(encoder, inject=True)`` mirrors the reference filter:
the encoded token replaces the original, or (inject) stacks at the same
position so both index.
"""

from __future__ import annotations

import re
from typing import Callable, List

from lucene_solr_ray.analysis.filters import Stream, TokenFilter

__all__ = [
    "soundex", "refined_soundex", "metaphone", "caverphone2", "nysiis",
    "cologne_phonetic", "PhoneticFilter", "ENCODERS",
]

#: frozenset, not a string — ``"" in "AEIOU"`` is True in Python, and the
#: boundary helpers below return "" past either end of the word
_VOWELS = frozenset("AEIOU")
_FRONT = frozenset("IEY")
_SILENT_H_AFTER = frozenset("CSPTG")


def _clean(s: str) -> str:
    return "".join(c for c in s.upper() if c.isalpha() and c.isascii())


# -- American Soundex (commons-codec Soundex semantics incl. H/W rule) -------

_SOUNDEX_MAP = "01230120022455012623010202"  # A..Z


def _sdx(c: str) -> str:
    return _SOUNDEX_MAP[ord(c) - 65]


def soundex(s: str) -> str:
    """4-char American Soundex; consonants from the same code group
    separated by H or W code once (the NARA rule)."""
    s = _clean(s)
    if not s:
        return s

    def mapping_code(i: int) -> str:
        code = _sdx(s[i])
        if i > 1 and code != "0":
            hw = s[i - 1]
            if hw in "HW":
                pre = s[i - 2]
                if _sdx(pre) == code or pre in "HW":
                    return ""  # swallowed by the H/W rule
        return code

    out = [s[0], "0", "0", "0"]
    last = mapping_code(0)
    count, i = 1, 1
    while i < len(s) and count < 4:
        mapped = mapping_code(i)
        i += 1
        if mapped:
            if mapped != "0" and mapped != last:
                out[count] = mapped
                count += 1
            last = mapped
    return "".join(out)


# -- Refined Soundex ---------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"


def refined_soundex(s: str) -> str:
    """Variable-length refined Soundex: first letter + every code with
    consecutive duplicates collapsed (vowel code 0 kept once)."""
    s = _clean(s)
    if not s:
        return s
    out = [s[0]]
    last = None
    for c in s:
        code = _REFINED_MAP[ord(c) - 65]
        if code == last:
            continue
        out.append(code)
        last = code
    return "".join(out)


# -- Metaphone (Lawrence Philips 1990; commons-codec rule set) ---------------

def metaphone(s: str, max_len: int = 4) -> str:
    s = _clean(s)
    if not s:
        return ""
    if len(s) == 1:
        return s

    # initial-pair exceptions
    two = s[:2]
    if two in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif two == "WH":
        s = "W" + s[2:]
    elif s[0] == "X":
        s = "S" + s[1:]

    out: List[str] = []
    n = len(s)
    i = 0

    def at(j: int) -> str:
        return s[j] if 0 <= j < n else ""

    def region(j: int, k: int) -> str:
        return s[max(j, 0):max(k, 0)]

    while i < n and len(out) < max_len:
        c = s[i]
        # skip doubles except C
        if c != "C" and i > 0 and at(i - 1) == c:
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            # silent in terminal MB
            if not (i == n - 1 and at(i - 1) == "M"):
                out.append("B")
        elif c == "C":
            if region(i, i + 3) == "CIA":
                out.append("X")
            elif at(i + 1) == "H":
                if i == 0 and n >= 3 and at(i + 2) not in _VOWELS:
                    out.append("K")  # e.g. CHLOE-like CH + consonant
                elif at(i - 1) == "S":
                    out.append("K")  # SCH
                else:
                    out.append("X")
            elif at(i + 1) in _FRONT:
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if at(i + 1) == "G" and at(i + 2) in _FRONT:
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            silent = False
            if at(i + 1) == "H" and not (
                i + 1 == n - 1 or at(i + 2) in _VOWELS
            ):
                silent = True  # GH not at end / before vowel
            if i > 0 and (region(i, i + 2) == "GN"
                          or region(i, i + 4) == "GNED"):
                silent = True
            if not silent:
                if at(i + 1) in _FRONT:
                    out.append("J")
                else:
                    out.append("K")
        elif c == "H":
            # silent after vowel with no following vowel, or in varson
            if i > 0 and at(i - 1) in _SILENT_H_AFTER:
                pass
            elif i > 0 and at(i - 1) in _VOWELS and at(i + 1) not in _VOWELS:
                pass
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if at(i - 1) != "C":
                out.append("K")
        elif c == "P":
            out.append("F" if at(i + 1) == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if region(i, i + 2) == "SH":
                out.append("X")
            elif region(i, i + 3) in ("SIO", "SIA"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if region(i, i + 2) == "TH":
                out.append("0")
            elif region(i, i + 3) in ("TIO", "TIA"):
                out.append("X")
            elif region(i, i + 3) == "TCH":
                pass  # silent in -TCH-
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if at(i + 1) in _VOWELS:
                out.append("W")
        elif c == "X":
            out.extend(("K", "S"))
        elif c == "Y":
            if at(i + 1) in _VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_len])


# -- Caverphone 2.0 (David Hood, 2004) ---------------------------------------

_CAVER_RULES = [
    ("e$", ""),
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^trough", "trou2f"), ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"),
    ("j", "y"), ("^y3", "Y3"), ("^y", "A"), ("y", "3"),
    ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"), ("f+", "F"),
    ("m+", "M"), ("n+", "N"),
    ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"), ("w", "2"),
    ("^h", "A"), ("h", "2"),
    ("r3", "R3"), ("r$", "3"), ("r", "2"),
    ("l3", "L3"), ("l$", "3"), ("l", "2"),
    ("2", ""),
    ("3$", "A"), ("3", ""),
]


def caverphone2(s: str) -> str:
    """Caverphone 2.0: the published replace cascade, padded to 10."""
    w = "".join(c for c in s.lower() if c.isalpha() and c.isascii())
    for pat, rep in _CAVER_RULES:
        w = re.sub(pat, rep, w)
    return (w + "1" * 10)[:10]


# -- NYSIIS ------------------------------------------------------------------

def nysiis(s: str) -> str:
    """New York State Identification and Intelligence System code
    (the commons-codec strict=true 6-char variant)."""
    s = _clean(s)
    if not s:
        return s
    # initial transforms
    for a, b in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"), ("PH", "FF"),
                 ("PF", "FF"), ("SCH", "SSS")):
        if s.startswith(a):
            s = b + s[len(a):]
            break
    # terminal transforms
    for a, b in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                 ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if s.endswith(a):
            s = s[: -len(a)] + b
            break
    first = s[0]
    chars = list(s)
    i = 1
    while i < len(chars):
        rest = "".join(chars[i:])
        if rest.startswith("EV"):
            chars[i:i + 2] = ["A", "F"]
        elif chars[i] in _VOWELS:
            chars[i] = "A"
        elif chars[i] == "Q":
            chars[i] = "G"
        elif chars[i] == "Z":
            chars[i] = "S"
        elif chars[i] == "M":
            chars[i] = "N"
        elif rest.startswith("KN"):
            chars[i:i + 2] = ["N", "N"]
        elif chars[i] == "K":
            chars[i] = "C"
        elif rest.startswith("SCH"):
            chars[i:i + 3] = ["S", "S", "S"]
        elif rest.startswith("PH"):
            chars[i:i + 2] = ["F", "F"]
        elif chars[i] == "H" and (chars[i - 1] not in _VOWELS
                                  or (i + 1 < len(chars)
                                      and chars[i + 1] not in _VOWELS)):
            chars[i] = chars[i - 1]
        elif chars[i] == "W" and chars[i - 1] in _VOWELS:
            chars[i] = chars[i - 1]
        i += 1
    # duplicates collapse as the key is built (commons appends a
    # transcoded char only when it differs from the key's last char),
    # THEN the trailing trims run on the collapsed key
    key = [first]
    for c in chars[1:]:
        if key[-1] != c:
            key.append(c)
    code = "".join(key)
    if code.endswith("S") and len(code) > 1:
        code = code[:-1]
    if code.endswith("AY"):
        code = code[:-2] + "Y"
    if code.endswith("A") and len(code) > 1:
        code = code[:-1]
    return code[:6]


# -- Kölner Phonetik (Postel 1969) -------------------------------------------

_DE_PRE = str.maketrans({"ä": "a", "ö": "o", "ü": "u", "ß": "s"})


def cologne_phonetic(s: str) -> str:
    """Cologne phonetics for German: context-dependent digit code with
    adjacent duplicates merged and non-leading '0' dropped."""
    w = s.lower().translate(_DE_PRE)
    w = "".join(c for c in w if c.isalpha() and c.isascii())
    if not w:
        return ""
    n = len(w)
    codes: List[str] = []
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        if c in "aeijouy":
            code = "0"
        elif c == "b":
            code = "1"
        elif c == "p":
            code = "1" if nxt != "h" else "3"
        elif c in "dt":
            code = "8" if (nxt and nxt in "csz") else "2"
        elif c in "fvw":
            code = "3"
        elif c in "gkq":
            code = "4"
        elif c == "c":
            if i == 0:
                code = "4" if (nxt and nxt in "ahkloqrux") else "8"
            elif prev in "sz":
                code = "8"
            else:
                code = "4" if (nxt and nxt in "ahkoqux") else "8"
        elif c == "x":
            code = "8" if (prev and prev in "ckq") else "48"
        elif c == "l":
            code = "5"
        elif c in "mn":
            code = "6"
        elif c == "r":
            code = "7"
        elif c in "sz":
            code = "8"
        elif c == "h":
            code = ""
        else:
            code = ""
        codes.append(code)
    raw = "".join(codes)
    # merge adjacent duplicates
    merged = []
    for c in raw:
        if not merged or merged[-1] != c:
            merged.append(c)
    # drop '0' except leading
    return "".join(
        c for j, c in enumerate(merged) if c != "0" or j == 0
    )


ENCODERS = {
    "Soundex": soundex,
    "RefinedSoundex": refined_soundex,
    "Metaphone": metaphone,
    "Caverphone": caverphone2,
    "Nysiis": nysiis,
    "ColognePhonetic": cologne_phonetic,
}


class PhoneticFilter(TokenFilter):
    """PhoneticFilter.java: replace each token with its phonetic code,
    or (inject=True) emit the code stacked at the SAME position so both
    spellings index (posIncrement 0 in the reference)."""

    def __init__(self, encoder: str | Callable[[str], str] = "Metaphone",
                 inject: bool = True):
        self.encode = (ENCODERS[encoder] if isinstance(encoder, str)
                       else encoder)
        self.inject = inject

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            code = self.encode(t)
            if self.inject:
                out.append((t, p))
                if code and code != t:
                    out.append((code, p))
            else:
                out.append((code or t, p))
        return out
