"""Language-specific analysis: normalizers + light/minimal stemmers.

Re-expressions of the reference's per-language char-rule kernels
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/<lang>/`):

- ``GermanLightStemFilter``   — de/GermanLightStemmer.java
- ``SpanishLightStemFilter``  — es/SpanishLightStemmer.java
- ``FrenchMinimalStemFilter`` — fr/FrenchMinimalStemmer.java
- ``RussianLightStemFilter``  — ru/RussianLightStemmer.java
- ``ArabicNormalizationFilter``  — ar/ArabicNormalizer.java
- ``PersianNormalizationFilter`` — fa/PersianNormalizer.java
- ``GreekLowerCaseFilter``       — el/GreekLowerCaseFilter.java
- ``ScandinavianFoldingFilter``  — miscellaneous/ScandinavianFoldingFilter.java
- ``ElisionFilter``              — util/ElisionFilter.java (+ the French
  analyzer's DEFAULT_ARTICLES, fr/FrenchAnalyzer.java:59)

All are pure string→string token maps over the (term, position) stream
protocol of :mod:`lucene_solr_ray.analysis.filters` — each rule set is
stated as data (translation tables / suffix lists), not a char-loop
transliteration, and each is exercised by fixture tests mirroring the
reference's expected outputs.
"""

from __future__ import annotations

from typing import Iterable

from lucene_solr_ray.analysis.filters import Stream, TokenFilter

__all__ = [
    "GermanLightStemFilter", "SpanishLightStemFilter",
    "FrenchMinimalStemFilter", "RussianLightStemFilter",
    "ArabicNormalizationFilter", "PersianNormalizationFilter",
    "GreekLowerCaseFilter", "ScandinavianFoldingFilter", "ElisionFilter",
    "FRENCH_ARTICLES",
    "GermanNormalizationFilter",
    "SerbianNormalizationFilter",
]


class _MapFilter(TokenFilter):
    """A filter defined by a per-term pure function."""

    def _map(self, term: str) -> str:  # pragma: no cover
        raise NotImplementedError

    def apply(self, stream: Stream) -> Stream:
        out = []
        for t, p in stream:
            m = self._map(t)
            if m:
                out.append((m, p))
        return out


# -- German light ------------------------------------------------------------

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST_ENDING = frozenset("bdfghklmnt")


class GermanLightStemFilter(_MapFilter):
    """de/GermanLightStemmer.java: umlaut fold, then two suffix steps
    (-ern/-em/-en/-er/-es/-e/-s after a valid st-ending, then
    -est/-er/-en/-st)."""

    def _map(self, s: str) -> str:
        s = s.translate(_DE_FOLD)
        n = len(s)
        # step 1
        if n > 5 and s.endswith("ern"):
            n -= 3
        elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
            n -= 2
        elif n > 3 and s[n - 1] == "e":
            n -= 1
        elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_ENDING:
            n -= 1
        s = s[:n]
        # step 2
        if n > 5 and s.endswith("est"):
            n -= 3
        elif n > 4 and (s.endswith("er") or s.endswith("en")):
            n -= 2
        elif n > 4 and s.endswith("st") and s[n - 3] in _DE_ST_ENDING:
            n -= 2
        return s[:n]


# -- Spanish light -----------------------------------------------------------

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


class SpanishLightStemFilter(_MapFilter):
    """es/SpanishLightStemmer.java: accent fold + plural/gender clips
    (-o/-a/-e; -eses→-es; -ces→-z; -os/-as/-es→clip 2). Terms shorter
    than 5 chars pass through unchanged."""

    def _map(self, s: str) -> str:
        if len(s) < 5:
            return s
        s = s.translate(_ES_FOLD)
        last = s[-1]
        if last in "oae":
            return s[:-1]
        if last == "s":
            if s.endswith("eses"):
                return s[:-2]
            if s.endswith("ces"):
                return s[:-3] + "z"
            if s[-2] in "oae":
                return s[:-2]
        return s


# -- French minimal ----------------------------------------------------------

class FrenchMinimalStemFilter(_MapFilter):
    """fr/FrenchMinimalStemmer.java: -x (with -aux→-al), then strip one
    each of trailing s, r, e, é, and a doubled final letter.  Terms
    shorter than 6 chars pass through."""

    def _map(self, s: str) -> str:
        if len(s) < 6:
            return s
        if s[-1] == "x":
            # -aux → -al (the reference rewrites u→l THEN drops the x)
            if s[-3] == "a" and s[-2] == "u":
                return s[:-2] + "l"
            return s[:-1]
        if s[-1] == "s":
            s = s[:-1]
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "é":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2]:
            s = s[:-1]
        return s


# -- Russian light -----------------------------------------------------------

_RU_CASE_4 = ("иями", "оями")
_RU_CASE_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
              "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_CASE_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
              "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
              "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
_RU_CASE_1 = "аеиоуйыяь"


class RussianLightStemFilter(_MapFilter):
    """ru/RussianLightStemmer.java: longest-first case-suffix removal
    (guarded by remaining length) then a normalize step dropping final
    ь/и and collapsing double н."""

    def _map(self, s: str) -> str:
        n = len(s)
        if n > 6 and s.endswith(_RU_CASE_4):
            n -= 4
        elif n > 5 and s.endswith(_RU_CASE_3):
            n -= 3
        elif n > 4 and s.endswith(_RU_CASE_2):
            n -= 2
        elif n > 3 and s[n - 1] in _RU_CASE_1:
            n -= 1
        s = s[:n]
        if n > 3:
            if s[n - 1] in "ьи":
                return s[:-1]
            if s[n - 1] == "н" and s[n - 2] == "н":
                return s[:-1]
        return s


# -- Arabic / Persian normalization ------------------------------------------

#: ar/ArabicNormalizer.java — map alef variants to bare alef, dotless yeh
#: to yeh, teh marbuta to heh; DELETE tatweel and the harakat marks
_AR_TABLE = {
    0x0622: 0x0627, 0x0623: 0x0627, 0x0625: 0x0627,  # alef madda/hamza
    0x0649: 0x064A,                                   # dotless yeh → yeh
    0x0629: 0x0647,                                   # teh marbuta → heh
    0x0640: None,                                     # tatweel
    0x064B: None, 0x064C: None, 0x064D: None,         # -atan marks
    0x064E: None, 0x064F: None, 0x0650: None,         # fatha/damma/kasra
    0x0651: None, 0x0652: None,                       # shadda/sukun
}


class ArabicNormalizationFilter(_MapFilter):
    """ar/ArabicNormalizer.java (the ArabicNormalizationFilterFactory
    kernel)."""

    def _map(self, s: str) -> str:
        return s.translate(_AR_TABLE)


#: fa/PersianNormalizer.java — farsi yeh / yeh barree → arabic yeh,
#: keheh → kaf, heh+yeh / heh goal → heh; delete hamza above
_FA_TABLE = {
    0x06CC: 0x064A, 0x06D2: 0x064A,  # farsi yeh, yeh barree → yeh
    0x06A9: 0x0643,                   # keheh → kaf
    0x06C0: 0x0647, 0x06C1: 0x0647,   # heh+yeh, heh goal → heh
    0x0654: None,                     # hamza above
}


class PersianNormalizationFilter(_MapFilter):
    """fa/PersianNormalizer.java."""

    def _map(self, s: str) -> str:
        return s.translate(_FA_TABLE)


# -- Greek lowercase ---------------------------------------------------------

#: el/GreekLowerCaseFilter.java — final sigma → sigma; tonos/dialytika
#: variants → bare lowercase vowel; then plain lowercase
_EL_TABLE = {
    0x03C2: 0x03C3,                                          # final sigma
    0x0386: 0x03B1, 0x03AC: 0x03B1,                          # alpha
    0x0388: 0x03B5, 0x03AD: 0x03B5,                          # epsilon
    0x0389: 0x03B7, 0x03AE: 0x03B7,                          # eta
    0x038A: 0x03B9, 0x03AA: 0x03B9, 0x03AF: 0x03B9,
    0x03CA: 0x03B9, 0x0390: 0x03B9,                          # iota
    0x038E: 0x03C5, 0x03AB: 0x03C5, 0x03CD: 0x03C5,
    0x03CB: 0x03C5, 0x03B0: 0x03C5,                          # upsilon
    0x038C: 0x03BF, 0x03CC: 0x03BF,                          # omicron
    0x038F: 0x03C9, 0x03CE: 0x03C9,                          # omega
}


class GreekLowerCaseFilter(_MapFilter):
    """el/GreekLowerCaseFilter.java: diacritic-stripping lowercase with
    final-sigma standardization."""

    def _map(self, s: str) -> str:
        return "".join(
            chr(_EL_TABLE[cp]) if (cp := ord(c)) in _EL_TABLE
            else c.lower()
            for c in s
        )


# -- Scandinavian folding ----------------------------------------------------

_SCAN_ONE = {"å": "a", "ä": "a", "æ": "a", "Å": "A", "Ä": "A", "Æ": "A",
             "ø": "o", "ö": "o", "Ø": "O", "Ö": "O"}


class ScandinavianFoldingFilter(_MapFilter):
    """miscellaneous/ScandinavianFoldingFilter.java: å/ä/æ→a, ö/ø→o,
    and the digraph collapses aa/ae/ao→a, oe/oo→o (case-preserving,
    left-to-right single pass like the reference)."""

    def _map(self, s: str) -> str:
        out = []
        i, n = 0, len(s)
        chars = list(s)
        while i < n:
            c = chars[i]
            if c in _SCAN_ONE:
                out.append(_SCAN_ONE[c])
                i += 1
                continue
            if i + 1 < n:
                nxt = chars[i + 1]
                if c in "aA" and nxt in "aAeEoO":
                    out.append(c)
                    i += 2
                    # reference deletes ONE following char then continues
                    # scanning from the char after it
                    continue
                if c in "oO" and nxt in "eEoO":
                    out.append(c)
                    i += 2
                    continue
            out.append(c)
            i += 1
        return "".join(out)


# -- Elision -----------------------------------------------------------------

#: fr/FrenchAnalyzer.java:59 DEFAULT_ARTICLES
FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"]
)


class ElisionFilter(_MapFilter):
    """util/ElisionFilter.java: strip a leading ``article'`` prefix
    (articles matched case-insensitively; both ' and ’ apostrophes)."""

    def __init__(self, articles: Iterable[str] = FRENCH_ARTICLES):
        self.articles = frozenset(a.lower() for a in articles)

    def _map(self, s: str) -> str:
        for i, ch in enumerate(s):
            if ch in "'’":
                if s[:i].lower() in self.articles:
                    return s[i + 1:]
                return s
        return s


# -- German normalization (de/GermanNormalizationFilter.java:41) -------------


class GermanNormalizationFilter(_MapFilter):
    """The German2-snowball umlaut normalization as a standalone filter:
    ``ß``→``ss``; ``ä ö ü``→``a o u``; ``ae oe``→``a o``; ``ue``→``u``
    unless the ``u`` follows a vowel or ``q`` — replayed with the
    reference's 3-state FSM (N ordinary / V vowel-blocked / U umlaut)."""

    def _map(self, s: str) -> str:
        N, V, U = 0, 1, 2
        state = N
        out = []
        for c in s:
            if c in "ao":
                out.append(c)
                state = U
            elif c == "u":
                out.append(c)
                state = U if state == N else V
            elif c == "e":
                if state == U:
                    state = V
                    continue  # delete the e of ae/oe/ue
                out.append(c)
                state = V
            elif c in "iqy":
                out.append(c)
                state = V
            elif c == "ä":
                out.append("a")
                state = V
            elif c == "ö":
                out.append("o")
                state = V
            elif c == "ü":
                out.append("u")
                state = V
            elif c == "ß":
                out.append("ss")
                state = N
            else:
                out.append(c)
                state = N
        return "".join(out)


# -- Serbian normalization (sr/SerbianNormalizationFilter.java:37) -----------

_SR_MAP = {
    # Cyrillic → bald Latin (Gaj transliteration, diacritics folded)
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj",
    "е": "e", "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "c", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "c", "џ": "dz", "ш": "s",
    # Latin diacritics → bald Latin (đ keeps its dj digraph)
    "đ": "dj", "č": "c", "ć": "c", "ž": "z", "š": "s",
}


class SerbianNormalizationFilter(_MapFilter):
    """Serbian Cyrillic and Latin → "bald" Latin; expects lowercased
    input, ``đ``/``ђ`` become ``dj`` (the one non-folding exception)."""

    def _map(self, s: str) -> str:
        return "".join(_SR_MAP.get(c, c) for c in s)


#: all lang filters are 1:1 term rewrites (or drops): offsets stay valid
def _register_offset_safe():
    from lucene_solr_ray.analysis.filters import CustomAnalyzer

    CustomAnalyzer._OFFSET_SAFE = CustomAnalyzer._OFFSET_SAFE + (
        GermanLightStemFilter, SpanishLightStemFilter,
        FrenchMinimalStemFilter, RussianLightStemFilter,
        ArabicNormalizationFilter, PersianNormalizationFilter,
        GreekLowerCaseFilter, ScandinavianFoldingFilter, ElisionFilter,
        GermanNormalizationFilter, SerbianNormalizationFilter,
    )


_register_offset_safe()
