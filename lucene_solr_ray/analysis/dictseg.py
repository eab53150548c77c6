"""Dictionary-driven Viterbi segmentation (the kuromoji / nori role).

The reference's Japanese/Korean/Chinese analyzers (``lucene/analysis/
kuromoji/.../JapaneseTokenizer.java``, ``nori/.../KoreanTokenizer.java``,
``smartcn``) segment unspaced text with a Viterbi search over a weighted
word lattice built from a dictionary of (surface form, cost).  This
module implements that lattice search; the dictionary is DATA the caller
supplies (the reference ships MeCab-derived binaries; tests here embed a
small hand-written lexicon).  Connection costs between part-of-speech
classes are out of scope — the unigram-cost lattice is the same shape
and degrades exactly like the reference does with a flat connection
matrix.

Lower cost wins; ties prefer the LONGER token (the reference's lattice
breaks ties toward fewer, longer tokens via its cost tables)."""

from __future__ import annotations

from typing import Dict, List, Tuple

from lucene_solr_ray.analysis.filters import Stream

__all__ = ["ViterbiSegmenter"]


class ViterbiSegmenter:
    def __init__(self, lexicon: Dict[str, float],
                 unk_cost: float = 10.0) -> None:
        if not lexicon:
            raise ValueError("empty lexicon")
        self.lexicon = dict(lexicon)
        self.unk_cost = float(unk_cost)
        self.max_len = max(len(w) for w in self.lexicon)
        # first-char index prunes the inner loop
        self._by_first: Dict[str, List[str]] = {}
        for w in self.lexicon:
            self._by_first.setdefault(w[0], []).append(w)
        for ws in self._by_first.values():
            ws.sort(key=len, reverse=True)

    def segment(self, text: str) -> List[Tuple[str, int]]:
        """Minimal-cost segmentation: [(token, char_start), ...].
        Unknown characters become single-char tokens at ``unk_cost``."""
        n = len(text)
        if n == 0:
            return []
        INF = float("inf")
        best = [INF] * (n + 1)
        back: List[Tuple[int, str]] = [(-1, "")] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == INF:
                continue
            found = False
            for w in self._by_first.get(text[i], ()):
                if text.startswith(w, i):
                    found = True
                    j = i + len(w)
                    c = best[i] + self.lexicon[w]
                    # strict < keeps the FIRST (longest, from the sorted
                    # index) word on ties
                    if c < best[j] or (
                        c == best[j] and len(w) > len(back[j][1])
                    ):
                        best[j] = c
                        back[j] = (i, w)
            # unknown single char is always a fallback edge so every
            # input segments
            j = i + 1
            c = best[i] + self.unk_cost
            if c < best[j]:
                best[j] = c
                back[j] = (i, text[i])
            del found
        out: List[Tuple[str, int]] = []
        j = n
        while j > 0:
            i, w = back[j]
            out.append((w, i))
            j = i
        out.reverse()
        return out

    def tokens(self, text: str) -> Stream:
        """Token stream [(term, ordinal position), ...] for analyzer
        chains (positions are token ordinals, as the tokenizer emits)."""
        return [(w, k) for k, (w, _s) in enumerate(self.segment(text))]
