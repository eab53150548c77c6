"""Hunspell affix-rule engine: .aff/.dic parsing + affix stripping.

The reference ships a full Hunspell implementation
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Dictionary.java``, ``Stemmer.java``, ``HunspellStemFilter.java``) driven
by user-supplied ``.aff``/``.dic`` files.  This module implements the
same contract: parse the affix grammar (FLAG modes, SFX/PFX rule groups
with strip/affix/condition, cross-product), parse the word list with its
flag sets, and stem by affix stripping — a candidate stem is accepted
when it is in the dictionary carrying the rule's flag and the rule's
condition matches it.  Dictionaries are data, not code: tests embed a
small hand-written lexicon; production use points at real ``.aff/.dic``
files.

Feature subset (the high-traffic core): FLAG UTF-8 (single char, the
default), FLAG long (two-char flags); SFX/PFX with strip, affix,
condition; cross-product (prefix+suffix in one derivation); case
fallback (exact → lower → title-lower).  Not implemented: compounding
(COMPOUNDRULE), REP/TRY suggestion tables, two-level continuation
classes — each raises nothing but simply doesn't fire, matching how the
reference degrades when a dictionary omits them.
"""

from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

from lucene_solr_ray.analysis.filters import Stream, TokenFilter

__all__ = ["AffixRule", "HunspellDictionary", "HunspellStemFilter"]


class AffixRule:
    __slots__ = ("flag", "cross", "strip", "affix", "condition", "is_sfx")

    def __init__(self, flag: str, cross: bool, strip: str, affix: str,
                 condition: str, is_sfx: bool) -> None:
        self.flag = flag
        self.cross = cross
        self.strip = "" if strip == "0" else strip
        self.affix = "" if affix == "0" else affix
        self.is_sfx = is_sfx
        cond = condition or "."
        try:
            self.condition = (
                re.compile(cond + r"\Z") if is_sfx
                else re.compile(r"\A" + cond)
            ) if cond != "." else None
        except re.error:
            self.condition = None

    def matches_condition(self, stem: str) -> bool:
        if self.condition is None:
            return True
        return self.condition.search(stem) is not None


class HunspellDictionary:
    """Parsed .aff + .dic pair (``Dictionary.java`` role)."""

    def __init__(self, aff_text: str, dic_text: str) -> None:
        self.flag_mode = "char"
        self.sfx: Dict[str, List[AffixRule]] = {}
        self.pfx: Dict[str, List[AffixRule]] = {}
        self._parse_aff(aff_text)
        self.words: Dict[str, FrozenSet[str]] = {}
        self._parse_dic(dic_text)

    @classmethod
    def from_files(cls, aff_path: str, dic_path: str,
                   encoding: str = "utf-8") -> "HunspellDictionary":
        with open(aff_path, encoding=encoding, errors="replace") as f:
            aff = f.read()
        with open(dic_path, encoding=encoding, errors="replace") as f:
            dic = f.read()
        return cls(aff, dic)

    # -- parsing ----------------------------------------------------------

    def _parse_aff(self, text: str) -> None:
        lines = [ln.split("#", 1)[0].rstrip() for ln in text.splitlines()]
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts:
                continue
            if parts[0] == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "char"
                )
            elif parts[0] in ("SFX", "PFX") and len(parts) >= 4:
                kind, flag, cross, count = (
                    parts[0], parts[1], parts[2], parts[3]
                )
                try:
                    n = int(count)
                except ValueError:
                    continue
                rules = []
                for _ in range(n):
                    if i >= len(lines):
                        break
                    rp = lines[i].split()
                    i += 1
                    if len(rp) < 4 or rp[0] != kind:
                        continue
                    affix = rp[3].split("/", 1)[0]  # continuation ignored
                    cond = rp[4] if len(rp) > 4 else "."
                    rules.append(AffixRule(
                        flag, cross.upper() == "Y", rp[2], affix, cond,
                        is_sfx=(kind == "SFX"),
                    ))
                target = self.sfx if kind == "SFX" else self.pfx
                target.setdefault(flag, []).extend(rules)

    def _flags(self, spec: str) -> FrozenSet[str]:
        if self.flag_mode == "long":
            return frozenset(
                spec[i:i + 2] for i in range(0, len(spec) - 1, 2)
            )
        if self.flag_mode == "num":
            return frozenset(s for s in spec.split(",") if s)
        return frozenset(spec)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for ln in lines[start:]:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            if "/" in ln:
                word, spec = ln.split("/", 1)
                spec = spec.split("\t", 1)[0].split()[0] if spec else ""
                self.words[word] = self._flags(spec)
            else:
                self.words[ln.split("\t", 1)[0].split()[0]] = frozenset()

    # -- stemming (Stemmer.java) -------------------------------------------

    def _lookup(self, cand: str, flag: Optional[str]) -> bool:
        f = self.words.get(cand)
        if f is None:
            return False
        return flag is None or flag in f

    def _suffix_strips(self, word: str) -> List[Tuple[str, AffixRule]]:
        out = []
        for flag, rules in self.sfx.items():
            for r in rules:
                if not r.affix or not word.endswith(r.affix):
                    continue
                cand = word[: len(word) - len(r.affix)] + r.strip
                if not cand or not r.matches_condition(cand):
                    continue
                out.append((cand, r))
        return out

    def _prefix_strips(self, word: str) -> List[Tuple[str, AffixRule]]:
        out = []
        for flag, rules in self.pfx.items():
            for r in rules:
                if not r.affix or not word.startswith(r.affix):
                    continue
                cand = r.strip + word[len(r.affix):]
                if not cand or not r.matches_condition(cand):
                    continue
                out.append((cand, r))
        return out

    def _stem_form(self, word: str) -> List[str]:
        stems = []
        if word in self.words:
            stems.append(word)
        for cand, r in self._suffix_strips(word):
            if self._lookup(cand, r.flag):
                stems.append(cand)
        for cand, r in self._prefix_strips(word):
            if self._lookup(cand, r.flag):
                stems.append(cand)
            if not r.cross:
                continue
            # cross-product: strip a suffix off the prefix-stripped form
            for cand2, r2 in self._suffix_strips(cand):
                if r2.cross and self._lookup(cand2, r2.flag) \
                        and r.flag in self.words[cand2]:
                    stems.append(cand2)
        return stems

    def stem(self, word: str) -> List[str]:
        """All dictionary stems of ``word`` (case fallback: exact →
        lowercase → title-cased stem of the lowercase), de-duplicated in
        first-found order."""
        seen, out = set(), []
        forms = [word]
        low = word.lower()
        if low != word:
            forms.append(low)
        for form in forms:
            for s in self._stem_form(form):
                if s not in seen:
                    seen.add(s)
                    out.append(s)
        return out


class HunspellStemFilter(TokenFilter):
    """``HunspellStemFilterFactory``: replace each token with its
    dictionary stems (all at the token's position, the reference's
    posIncr=0 stacking); tokens with no stem pass through unchanged;
    ``longest_only`` keeps a single longest stem."""

    def __init__(self, dictionary: HunspellDictionary,
                 dedup: bool = True, longest_only: bool = False) -> None:
        self.dict = dictionary
        self.dedup = dedup
        self.longest_only = longest_only

    def apply(self, stream: Stream) -> Stream:
        out: Stream = []
        for t, p in stream:
            stems = self.dict.stem(t)
            if not stems:
                out.append((t, p))
                continue
            if self.longest_only:
                stems = [max(stems, key=len)]
            emitted = set()
            for s in stems:
                if self.dedup and s in emitted:
                    continue
                emitted.add(s)
                out.append((s, p))
        return out
