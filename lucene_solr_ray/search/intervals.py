"""Minimal-interval proximity algebra — the modern Lucene intervals API.

Reference: ``lucene/sandbox/src/java/org/apache/lucene/search/intervals/
Intervals.java`` (factory surface), ``IntervalFunction.java`` (BLOCK /
ORDERED / UNORDERED / UNORDERED_NO_OVERLAP / CONTAINING / CONTAINED_BY),
``DifferenceIntervalFunction.java`` (NON_OVERLAPPING / NOT_WITHIN /
NOT_CONTAINING), ``LowpassIntervalsSource.java`` (maxwidth) and
``DisjunctionIntervalsSource.java`` (or).  The reference iterates
intervals lazily per document; ours evaluates the SAME advance rules
eagerly over each candidate document's position lists (per-doc position
counts are small — the laziness there is a per-segment streaming detail,
not a semantic one), so interval streams are exactly what the reference's
iterators would emit, including their non-strictly-minimal corner cases.

``IntervalQuery`` scores a matching doc with
``freq = Σ 1/(end − start + 1)`` over the emitted intervals
(``IntervalScorer.java:73``) and a similarity scorer built from the
summed stats of every DISTINCT leaf term (``IntervalQuery.
buildSimScorer:77-92``) — the same shape as our span scoring.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

__all__ = ["Intervals", "IntervalsSource"]

#: sentinel matching IntervalIterator.NO_MORE_INTERVALS
_NO = 1 << 30

Interval = Tuple[int, int]


class _It:
    """Pointer over an eager interval list with the reference iterator's
    before-first (-1) / exhausted (NO_MORE) start/end protocol."""

    __slots__ = ("ivs", "i")

    def __init__(self, ivs: List[Interval]):
        self.ivs = ivs
        self.i = -1

    @property
    def start(self) -> int:
        if self.i < 0:
            return -1
        if self.i >= len(self.ivs):
            return _NO
        return self.ivs[self.i][0]

    @property
    def end(self) -> int:
        if self.i < 0:
            return -1
        if self.i >= len(self.ivs):
            return _NO
        return self.ivs[self.i][1]

    def next(self) -> int:
        self.i += 1
        return self.start


# ---------------------------------------------------------------------------
# combinator algorithms (ports of the reference iterator advance rules)
# ---------------------------------------------------------------------------


def _block(lists: List[List[Interval]]) -> List[Interval]:
    """BLOCK: sub-intervals exactly adjacent (phrase of sources)."""
    if any(not l for l in lists):
        return []
    subs = [_It(l) for l in lists]
    out: List[Interval] = []
    while True:
        if subs[0].next() == _NO:
            return out
        i = 1
        dead = False
        while i < len(subs):
            while subs[i].start <= subs[i - 1].end:
                if subs[i].next() == _NO:
                    return out
            if subs[i].start == subs[i - 1].end + 1:
                i += 1
            else:
                if subs[0].next() == _NO:
                    dead = True
                    break
                i = 1
        if dead:
            return out
        out.append((subs[0].start, subs[-1].end))


def _next_ordered(subs: List[_It]) -> Interval:
    start = end = _NO
    b = 1 << 40
    i = 1
    while True:
        while True:
            if subs[i - 1].end >= b:
                return (start, end)
            if i == len(subs) or subs[i].start > subs[i - 1].end:
                break
            while True:
                if subs[i].end >= b or subs[i].next() == _NO:
                    return (start, end)
                if subs[i].start > subs[i - 1].end:
                    break
            i += 1
        start = subs[0].start
        end = subs[-1].end
        b = subs[-1].start
        i = 1
        if subs[0].next() == _NO:
            return (start, end)


def _ordered(lists: List[List[Interval]]) -> List[Interval]:
    """ORDERED: sub-intervals in order, non-overlapping chains."""
    if any(not l for l in lists):
        return []
    subs = [_It(l) for l in lists]
    subs[0].next()  # the reference reset() pre-advances the first sub
    out: List[Interval] = []
    while True:
        s, e = _next_ordered(subs)
        if s == _NO:
            return out
        out.append((s, e))


def _unordered(lists: List[List[Interval]],
               allow_overlaps: bool = True) -> List[Interval]:
    """UNORDERED / UNORDERED_NO_OVERLAP: minimal windows covering one
    interval from each source."""
    import heapq

    if any(not l for l in lists):
        return []
    subs = [_It(l) for l in lists]
    queue: list = []  # (start, -end, tiebreak, it)
    state = {"queueEnd": -1, "start": -1, "end": -1}

    def push(it: _It) -> None:
        heapq.heappush(queue, (it.start, -it.end, id(it), it))
        state["queueEnd"] = max(state["queueEnd"], it.end)

    def has_overlaps(cand: _It) -> bool:
        for (_, _, _, it) in queue:
            if it.start < cand.start:
                if it.end >= cand.start:
                    return True
                continue
            if it.start == cand.start:
                return True
            if it.start <= cand.end:
                return True
        return False

    # reset
    for it in subs:
        if it.next() == _NO:
            break
        if not allow_overlaps:
            dead = False
            while has_overlaps(it):
                if it.next() == _NO:
                    dead = True
                    break
            if dead:
                break
        push(it)

    def next_interval() -> int:
        while len(queue) == len(subs) and queue[0][3].start == state["start"]:
            it = heapq.heappop(queue)[3]
            if it.next() != _NO:
                if not allow_overlaps:
                    while has_overlaps(it):
                        if it.next() == _NO:
                            return _NO
                push(it)
        if len(queue) < len(subs):
            return _NO
        while True:
            state["start"] = queue[0][3].start
            state["end"] = state["queueEnd"]
            if queue[0][3].end == state["end"]:
                return state["start"]
            it = heapq.heappop(queue)[3]
            if it.next() != _NO:
                if not allow_overlaps:
                    bail = False
                    while has_overlaps(it):
                        if it.next() == _NO:
                            bail = True
                            break
                    if bail:
                        return state["start"]
                push(it)
            if not (len(queue) == len(subs)
                    and state["end"] == state["queueEnd"]):
                break
        return state["start"]

    out: List[Interval] = []
    while True:
        s = next_interval()
        if s == _NO:
            return out
        out.append((state["start"], state["end"]))


def _or(lists: List[List[Interval]]) -> List[Interval]:
    """Disjunction: emit by (end asc, start desc), advancing every source
    whose current interval CONTAINS the emitted one."""
    import heapq

    h: list = []
    for l in lists:
        it = _It(l)
        if it.next() != _NO:
            heapq.heappush(h, (it.end, -it.start, id(it), it))
    out: List[Interval] = []
    current: Optional[Interval] = None
    while h:
        if current is None:
            top = h[0][3]
            current = (top.start, top.end)
            out.append(current)
            continue
        s, e = current
        while h and h[0][3].start <= s and h[0][3].end >= e:
            it = heapq.heappop(h)[3]
            if it.next() != _NO:
                heapq.heappush(h, (it.end, -it.start, id(it), it))
        if not h:
            break
        top = h[0][3]
        current = (top.start, top.end)
        out.append(current)
    return out


def _containing(big: List[Interval], small: List[Interval]) -> List[Interval]:
    a, b = _It(big), _It(small)
    if not big or not small:
        return []
    b.next()
    out: List[Interval] = []
    while a.next() != _NO:
        while b.start < a.start and b.end < a.end:
            if b.next() == _NO:
                return out
        if a.start <= b.start and a.end >= b.end:
            out.append((a.start, a.end))
    return out


def _contained_by(small: List[Interval], big: List[Interval]) -> List[Interval]:
    a, b = _It(small), _It(big)
    if not small or not big:
        return []
    b.next()
    out: List[Interval] = []
    while a.next() != _NO:
        while b.end < a.end:
            if b.next() == _NO:
                return out
        if b.start <= a.start:
            out.append((a.start, a.end))
    return out


def _non_overlapping(minuend: List[Interval],
                     subtrahend: List[Interval]) -> List[Interval]:
    a, b = _It(minuend), _It(subtrahend)
    if not minuend:
        return []
    if not subtrahend:
        return list(minuend)
    b.next()
    out: List[Interval] = []
    while a.next() != _NO:
        bdead = False
        while b.end < a.start:
            if b.next() == _NO:
                bdead = True
                break
        if bdead or b.start > a.end:
            out.append((a.start, a.end))
        if bdead:
            while a.next() != _NO:
                out.append((a.start, a.end))
            return out
    return out


def _not_containing(minuend: List[Interval],
                    subtrahend: List[Interval]) -> List[Interval]:
    a, b = _It(minuend), _It(subtrahend)
    if not minuend:
        return []
    if not subtrahend:
        return list(minuend)
    b.next()
    out: List[Interval] = []
    while a.next() != _NO:
        bdead = False
        while b.start < a.start and b.end < a.end:
            if b.next() == _NO:
                bdead = True
                break
        if bdead or b.start > a.end:
            out.append((a.start, a.end))
        if bdead:
            while a.next() != _NO:
                out.append((a.start, a.end))
            return out
    return out


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


class IntervalsSource:
    """Base: ``leaves()`` = the source's SCORING terms; ``eval(pos)`` =
    interval list for one doc given {term: sorted positions};
    ``requires()`` = terms a matching doc MUST contain (candidate
    pruning); ``position_terms()`` = every term whose positions eval
    needs — a superset of leaves() for subtractive sources, whose
    subtrahend filters matches without contributing to scoring (the
    reference's DifferenceIntervalsSource scores minuend terms only but
    still reads the subtrahend's positions)."""

    def position_terms(self) -> List[str]:
        return self.leaves()

    def min_positions(self) -> int:
        """Minimum number of token positions a match occupies — the gap
        count's denominator (exact for term/phrase constituents; OR takes
        the minimum, matching the reference's width lower bound)."""
        return 1

    def leaves(self) -> List[str]:
        raise NotImplementedError

    def requires(self) -> List[List[str]]:
        """CNF-ish: list of alternatives-lists; a candidate doc must
        contain ≥1 term from each alternatives-list."""
        raise NotImplementedError

    def eval(self, pos) -> List[Interval]:
        raise NotImplementedError


@dataclass(frozen=True)
class _Term(IntervalsSource):
    term: str

    def leaves(self):
        return [self.term]

    def requires(self):
        return [[self.term]]

    def eval(self, pos):
        pl = pos.get(self.term)
        return [(int(p), int(p)) for p in pl] if pl is not None else []


@dataclass(frozen=True)
class _Combi(IntervalsSource):
    subs: Tuple[IntervalsSource, ...]
    kind: str  # block | ordered | unordered | unordered_no_overlap | or

    def leaves(self):
        return [t for s in self.subs for t in s.leaves()]

    def position_terms(self):
        return [t for s in self.subs for t in s.position_terms()]

    def min_positions(self):
        if self.kind == "or":
            return min(s.min_positions() for s in self.subs)
        return sum(s.min_positions() for s in self.subs)

    def requires(self):
        if self.kind == "or":
            # any alternative suffices
            return [[t for s in self.subs for t in s.leaves()]]
        return [r for s in self.subs for r in s.requires()]

    def eval(self, pos):
        lists = [s.eval(pos) for s in self.subs]
        if self.kind == "block":
            return _block(lists)
        if self.kind == "ordered":
            return _ordered(lists)
        if self.kind == "unordered":
            return _unordered(lists, True)
        if self.kind == "unordered_no_overlap":
            return _unordered(lists, False)
        return _or(lists)


@dataclass(frozen=True)
class _Filtered(IntervalsSource):
    a: IntervalsSource
    b: Optional[IntervalsSource]
    kind: str  # maxwidth | containing | contained_by | non_overlapping |
    #            not_containing | not_within
    arg: int = 0

    def leaves(self):
        out = list(self.a.leaves())
        if self.b is not None and self.kind in ("containing", "contained_by"):
            out += self.b.leaves()
        return out

    def position_terms(self):
        out = list(self.a.position_terms())
        if self.b is not None:
            out += self.b.position_terms()
        return out

    def min_positions(self):
        return self.a.min_positions()

    def requires(self):
        req = list(self.a.requires())
        if self.b is not None and self.kind in ("containing", "contained_by"):
            req += self.b.requires()
        return req

    def eval(self, pos):
        ia = self.a.eval(pos)
        if self.kind == "maxwidth":
            return [
                (s, e) for s, e in ia if (e - s) + 1 <= self.arg
            ]
        if self.kind == "maxgaps":
            w = self.a.min_positions()
            return [
                (s, e) for s, e in ia if (e - s + 1) - w <= self.arg
            ]
        ib = self.b.eval(pos)
        if self.kind == "containing":
            return _containing(ia, ib)
        if self.kind == "contained_by":
            return _contained_by(ia, ib)
        if self.kind == "non_overlapping":
            return _non_overlapping(ia, ib)
        if self.kind == "not_within":
            # minuend intervals with no subtrahend interval within
            # ``positions`` of them (reference NotWithinFunction widens
            # the subtrahend by ``positions`` on both sides, then
            # NON_OVERLAPPING)
            widened = [
                (max(0, s - self.arg), e + self.arg) for s, e in ib
            ]
            return _non_overlapping(ia, widened)
        if self.kind == "not_containing":
            return _not_containing(ia, ib)
        if self.kind == "before":
            # intervals of a ending before the start of SOME b interval
            if not ib:
                return []
            last_ok = max(s for s, _ in ib) - 1
            return [(s, e) for s, e in ia if e <= last_ok]
        if self.kind == "after":
            if not ib:
                return []
            first_ok = min(e for _, e in ib) + 1
            return [(s, e) for s, e in ia if s >= first_ok]
        raise ValueError(self.kind)


class Intervals:
    """Factory surface mirroring ``Intervals.java``."""

    @staticmethod
    def term(t: str) -> IntervalsSource:
        return _Term(t)

    @staticmethod
    def phrase(*subs) -> IntervalsSource:
        return _Combi(tuple(Intervals._coerce(s) for s in subs), "block")

    @staticmethod
    def ordered(*subs) -> IntervalsSource:
        return _Combi(tuple(Intervals._coerce(s) for s in subs), "ordered")

    @staticmethod
    def unordered(*subs, allow_overlaps: bool = True) -> IntervalsSource:
        kind = "unordered" if allow_overlaps else "unordered_no_overlap"
        return _Combi(tuple(Intervals._coerce(s) for s in subs), kind)

    @staticmethod
    def or_(*subs) -> IntervalsSource:
        return _Combi(tuple(Intervals._coerce(s) for s in subs), "or")

    @staticmethod
    def maxwidth(width: int, sub) -> IntervalsSource:
        return _Filtered(Intervals._coerce(sub), None, "maxwidth", width)

    @staticmethod
    def containing(big, small) -> IntervalsSource:
        return _Filtered(Intervals._coerce(big), Intervals._coerce(small),
                         "containing")

    @staticmethod
    def contained_by(small, big) -> IntervalsSource:
        return _Filtered(Intervals._coerce(small), Intervals._coerce(big),
                         "contained_by")

    @staticmethod
    def non_overlapping(minuend, subtrahend) -> IntervalsSource:
        return _Filtered(Intervals._coerce(minuend),
                         Intervals._coerce(subtrahend), "non_overlapping")

    @staticmethod
    def not_within(minuend, positions: int, subtrahend) -> IntervalsSource:
        return _Filtered(Intervals._coerce(minuend),
                         Intervals._coerce(subtrahend), "not_within",
                         positions)

    @staticmethod
    def not_containing(minuend, subtrahend) -> IntervalsSource:
        return _Filtered(Intervals._coerce(minuend),
                         Intervals._coerce(subtrahend), "not_containing")

    @staticmethod
    def before(source, reference) -> IntervalsSource:
        """Intervals of ``source`` that end before the start of some
        interval of ``reference`` (Intervals.before)."""
        return _Filtered(Intervals._coerce(source),
                         Intervals._coerce(reference), "before")

    @staticmethod
    def after(source, reference) -> IntervalsSource:
        return _Filtered(Intervals._coerce(source),
                         Intervals._coerce(reference), "after")

    @staticmethod
    def maxgaps(gaps: int, sub) -> IntervalsSource:
        """Intervals with at most ``gaps`` interleaved non-matching
        positions (Intervals.maxgaps); the width baseline is the
        constituent minimum, exact for term/phrase subs."""
        return _Filtered(Intervals._coerce(sub), None, "maxgaps", gaps)

    @staticmethod
    def _coerce(s) -> IntervalsSource:
        return _Term(s) if isinstance(s, str) else s
