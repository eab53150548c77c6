"""DEV-ONLY: simulate the reference StandardTokenizerImpl DFA for validation.

Parses the packed JFlex tables out of the read-only reference file
``/root/reference/lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizerImpl.java`` at runtime and replays ``getNextToken`` with
longest-match semantics plus the StandardTokenizer buffer-window behavior
(buffer == maxTokenLength, never grown).

This module is a *test oracle generator* only: it is used to emit golden
conformance fixtures (tests/fixtures/) and to fuzz-compare our reimplemented
tokenizer.  Nothing in the production package imports it, and it reads the
reference tables at runtime rather than embedding them.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Tuple

REF = Path(
    "/root/reference/lucene/core/src/java/org/apache/lucene/analysis/standard/"
    "StandardTokenizerImpl.java"
)

_OCT = re.compile(r"\\([0-7]{1,3})")
_UNI = re.compile(r"\\u([0-9a-fA-F]{4})")


def _decode_java_string(lit: str) -> str:
    out = []
    i = 0
    while i < len(lit):
        c = lit[i]
        if c == "\\":
            m = _UNI.match(lit, i)
            if m:
                out.append(chr(int(m.group(1), 16)))
                i = m.end()
                continue
            m = _OCT.match(lit, i)
            if m:
                out.append(chr(int(m.group(1), 8)))
                i = m.end()
                continue
            raise ValueError(f"unhandled escape at {lit[i:i+6]!r}")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _extract_packed(src: str, name: str) -> str:
    # matches: private static final String NAME = "..." + "..." ... ;
    m = re.search(
        rf"String {re.escape(name)}\s*=\s*(.*?);", src, re.S
    )
    if not m:
        raise ValueError(f"missing {name}")
    pieces = re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1))
    return "".join(_decode_java_string(p) for p in pieces)


def _unpack_pairs(packed: str) -> List[int]:
    out: List[int] = []
    i = 0
    while i < len(packed):
        count = ord(packed[i]); value = ord(packed[i + 1]); i += 2
        out.extend([value] * count)
    return out


class RefTokenizer:
    def __init__(self, path: Path = REF):
        src = path.read_text()
        cmap_packed = _extract_packed(src, "ZZ_CMAP_PACKED")
        self.cmap = [0] * 0x110000
        i = j = 0
        while i < 2836:
            count = ord(cmap_packed[i]); value = ord(cmap_packed[i + 1]); i += 2
            for _ in range(count):
                self.cmap[j] = value; j += 1
        self.action = _unpack_pairs(_extract_packed(src, "ZZ_ACTION_PACKED_0"))
        rm = _extract_packed(src, "ZZ_ROWMAP_PACKED_0")
        self.rowmap = [
            (ord(rm[k]) << 16) | ord(rm[k + 1]) for k in range(0, len(rm), 2)
        ]
        trans_packed = _extract_packed(src, "ZZ_TRANS_PACKED_0")
        self.trans = [v - 1 for v in _unpack_pairs(trans_packed)]
        self.attr = _unpack_pairs(_extract_packed(src, "ZZ_ATTRIBUTE_PACKED_0"))

    def _next(self, cps: List[int], start: int, end_read: int) -> Tuple[int, int, int]:
        """Longest match from `start` reading at most up to `end_read`.

        Returns (action, match_start, match_end) where action is the jflex
        rule action (2=WORD,3=HANGUL,4=NUM,5=KATAKANA,6=IDEO,7=HIRA,8=SEA,
        1=ignore) or 0 for EOF.
        """
        state = 0
        zz_action = -1
        marked = start
        pos = start
        attrs = self.attr[state]
        if attrs & 1:
            zz_action = state
        while True:
            if pos < end_read:
                cp = cps[pos]; pos += 1
            else:
                break
            nxt = self.trans[self.rowmap[state] + self.cmap[cp]]
            if nxt == -1:
                break
            state = nxt
            attrs = self.attr[state]
            if attrs & 1:
                zz_action = state
                marked = pos
                if attrs & 8:
                    break
        if zz_action < 0:
            return (0, start, start)  # EOF / no match possible
        return (self.action[zz_action], start, marked)

    def tokenize_with_types(
        self, text: str, max_token_length: int = 255
    ) -> List[Tuple[str, int, int, int]]:
        """Replicates StandardTokenizer.incrementToken over the whole input.

        The scanner buffer holds `max_token_length` chars beyond the current
        token start (StandardTokenizer buffer == maxTokenLength); matches are
        therefore capped at the longest accepting prefix of that window.
        Over-long matches are never produced, so the `yylength() >
        maxTokenLength` skip branch never fires under default construction.
        NOTE: the reference buffer is UTF-16 units; we use codepoints, which
        is identical for BMP-only input (true of all fixtures).
        """
        cps = [ord(c) for c in text]
        n = len(cps)
        out = []
        pos = 0
        while pos < n:
            end_read = min(n, pos + max_token_length)
            action, s, e = self._next(cps, pos, end_read)
            if e == s:  # EOF-ish: no chars consumed => stop
                if action == 0 and s >= n:
                    break
                pos += 1
                continue
            pos = e
            if action != 1:  # 1 == ignore
                out.append((text[s:e], s, e, action))
        return out

    def tokenize(self, text: str, max_token_length: int = 255) -> List[str]:
        return [t for t, _, _, _ in self.tokenize_with_types(text, max_token_length)]


if __name__ == "__main__":
    rt = RefTokenizer()
    for case in [
        "foo bar baz",
        "fooBar camelCase",
        "foo.bar(baz)",
        "3.14 0xFF 1,000 1_2.3",
        "don't a:b std::foo",
        "foo_bar __init__ a__b",
        "a.b.c a..b end.",
        "x" * 300,
        ("ab." * 100) + "cd",
        "",
    ]:
        print(repr(case[:50]), "->", rt.tokenize(case))


# ---------------------------------------------------------------------------
# ClassicTokenizerImpl oracle (same dev-only role)
# ---------------------------------------------------------------------------

CLASSIC_REF = Path(
    "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
    "analysis/standard/ClassicTokenizerImpl.java"
)

#: jflex action -> ClassicTokenizer type constant
CLASSIC_ACTION_TYPES = {
    2: "<ALPHANUM>", 3: "<CJ>", 4: "<HOST>", 5: "<NUM>",
    6: "<APOSTROPHE>", 7: "<COMPANY>", 8: "<ACRONYM_DEP>",
    9: "<ACRONYM>", 10: "<EMAIL>",
}


class RefClassicTokenizer(RefTokenizer):
    """Replays ClassicTokenizerImpl's packed DFA.  Unlike the Standard
    scanner (buffer == maxTokenLength), Classic keeps a 4096 buffer and
    SKIPS tokens longer than maxTokenLength (position gap), and rewrites
    ACRONYM_DEP to HOST minus the trailing dot
    (``ClassicTokenizer.java:148-151``)."""

    def __init__(self, path: Path = CLASSIC_REF):
        src = path.read_text()
        # cmap packed length is generator-dependent: parse it from the
        # unpack loop rather than hardcoding
        m = re.search(r"while \(i < (\d+)\)", src)
        cmap_len = int(m.group(1))
        cmap_packed = _extract_packed(src, "ZZ_CMAP_PACKED")
        self.cmap = [0] * 0x110000
        i = j = 0
        while i < cmap_len:
            count = ord(cmap_packed[i]); value = ord(cmap_packed[i + 1])
            i += 2
            for _ in range(count):
                self.cmap[j] = value; j += 1
        self.action = _unpack_pairs(_extract_packed(src, "ZZ_ACTION_PACKED_0"))
        rm = _extract_packed(src, "ZZ_ROWMAP_PACKED_0")
        self.rowmap = [
            (ord(rm[k]) << 16) | ord(rm[k + 1]) for k in range(0, len(rm), 2)
        ]
        self.trans = [v - 1 for v in _unpack_pairs(
            _extract_packed(src, "ZZ_TRANS_PACKED_0"))]
        self.attr = _unpack_pairs(_extract_packed(src, "ZZ_ATTRIBUTE_PACKED_0"))

    def tokenize_with_types(
        self, text: str, max_token_length: int = 255
    ) -> List[Tuple[str, int, int, str]]:
        """Returns (term, start, end, type) after the ACRONYM_DEP rewrite
        and the too-long skip; the 4096 scan window is the full input for
        these fixture-scale strings."""
        cps = [ord(c) for c in text]
        n = len(cps)
        out = []
        pos = 0
        while pos < n:
            end_read = min(n, pos + 4096)
            action, s, e = self._next(cps, pos, end_read)
            if e == s:
                if action == 0 and s >= n:
                    break
                pos += 1
                continue
            pos = e
            if action == 1:  # ignore rule
                continue
            if e - s > max_token_length:
                continue  # skipped (position gap in the reference)
            typ = CLASSIC_ACTION_TYPES[action]
            if typ == "<ACRONYM_DEP>":
                out.append((text[s:e - 1], s, e, "<HOST>"))
            else:
                out.append((text[s:e], s, e, typ))
        return out
