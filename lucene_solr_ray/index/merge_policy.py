"""TieredMergePolicy port — a pure function: manifest → merge specs.

Reimplements the selection logic of the reference
``lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:312-620``:

- defaults ``maxMergeAtOnce=10``, ``maxMergedSegmentBytes=5GB``,
  ``floorSegmentBytes=2MB``, ``segsPerTier=10`` (``:96-103``);
- the budget ``allowedSegCount`` comes from the tier geometry: levels of
  ``segsPerTier`` segments, each tier ``maxMergeAtOnce``× larger, floored
  at ``floorSegmentBytes`` (``:378-395``);
- while over budget, candidate windows of up to ``maxMergeAtOnce``
  consecutive segments (size-sorted desc) are scored by
  ``skew · size^0.05 · nonDelRatio³`` and the LEAST score wins
  (``:566-609``; no deletes in this engine → nonDelRatio = 1);
- merges whose total would exceed ``maxMergedSegmentBytes`` are trimmed,
  and only one "over-size" merge runs at a time (``:435,545``).

Deterministic: same segment sizes in, same specs out.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = ["TieredMergePolicy", "MergeSpec", "segment_size_bytes"]

MB = 1024 * 1024
GB = 1024 * MB


@dataclass(frozen=True)
class MergeSpec:
    segment_ids: Tuple[int, ...]
    total_bytes: int


def segment_size_bytes(seg_dir: str) -> int:
    total = 0
    for fn in ("postings.parquet", "docmeta.parquet"):
        p = os.path.join(seg_dir, fn)
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total


@dataclass
class TieredMergePolicy:
    max_merge_at_once: int = 10
    max_merged_segment_bytes: int = 5 * GB
    floor_segment_bytes: int = 2 * MB
    segs_per_tier: float = 10.0

    def _floored(self, size: int) -> int:
        return max(size, self.floor_segment_bytes)

    def allowed_seg_count(self, sizes: Sequence[int]) -> int:
        """Tier geometry budget (reference ``:378-395``)."""
        total = sum(self._floored(s) for s in sizes)
        level_size = self.floor_segment_bytes
        allowed = 0.0
        while True:
            seg_count_level = total / level_size
            if seg_count_level < self.segs_per_tier:
                allowed += math.ceil(seg_count_level)
                break
            allowed += self.segs_per_tier
            total -= int(self.segs_per_tier * level_size)
            level_size *= self.max_merge_at_once
        return max(int(allowed), 1)

    def find_merges(
        self, segments: Dict[int, int], merging: Optional[set] = None
    ) -> List[MergeSpec]:
        """segments: segment_id → byte size. Returns the merges to run now
        (call again after they commit — the reference loops the same way)."""
        merging = set(merging or ())
        eligible = [
            (sid, size) for sid, size in segments.items() if sid not in merging
        ]
        eligible.sort(key=lambda x: (-x[1], x[0]))  # size desc, id asc
        sizes = [s for _, s in eligible]
        allowed = self.allowed_seg_count([s for s in segments.values()])
        specs: List[MergeSpec] = []
        too_large_picked = False
        while len(eligible) - sum(len(s.segment_ids) - 1 for s in specs) > allowed:
            best: Optional[Tuple[float, int, List[Tuple[int, int]]]] = None
            for start in range(len(eligible)):
                window: List[Tuple[int, int]] = []
                total = 0
                hit_too_large = False
                for sid, size in eligible[start:]:
                    if len(window) >= self.max_merge_at_once:
                        break
                    if total + size > self.max_merged_segment_bytes:
                        hit_too_large = True
                        continue  # trim over-size candidates (":435")
                    window.append((sid, size))
                    total += size
                if len(window) < 2:
                    continue
                if hit_too_large and too_large_picked:
                    continue  # one over-size merge at a time (":545")
                # skew · size^0.05 (nonDelRatio == 1): smaller is better
                floored = [self._floored(s) for _, s in window]
                skew = floored[0] / max(sum(floored), 1)
                score = skew * (total ** 0.05)
                if best is None or score < best[0]:
                    best = (score, total, window)
            if best is None:
                break
            _, total, window = best
            ids = tuple(sid for sid, _ in window)
            specs.append(MergeSpec(ids, total))
            if total > self.max_merged_segment_bytes // 2:
                too_large_picked = True
            chosen = set(ids)
            eligible = [(sid, s) for sid, s in eligible if sid not in chosen]
        return specs


class LogByteSizeMergePolicy:
    """The reference's other stock policy (``index/
    LogByteSizeMergePolicy.java`` via ``LogMergePolicy.java:430-520``):
    segments bucket into LEVELS by log(size)/log(mergeFactor); any level
    holding ``merge_factor`` segments merges them oldest-first.  Simpler
    and more aggressive than Tiered — the classic choice for append-only
    time-series indexes."""

    def __init__(self, merge_factor: int = 10,
                 min_merge_mb: float = 1.6,
                 max_merge_mb: float = 2048.0):
        self.merge_factor = merge_factor
        self.min_merge_bytes = int(min_merge_mb * 1024 * 1024)
        self.max_merge_bytes = int(max_merge_mb * 1024 * 1024)

    def find_merges(self, sizes: "Dict[int, int]") -> List[MergeSpec]:
        import math

        eligible = [
            (sid, sz) for sid, sz in sorted(sizes.items())
            if sz <= self.max_merge_bytes
        ]
        if len(eligible) < self.merge_factor:
            return []
        lf = math.log(self.merge_factor)

        def level(sz: int) -> int:
            s = max(sz, self.min_merge_bytes)
            return int(math.floor(math.log(s) / lf))

        buckets: Dict[int, List[Tuple[int, int]]] = {}
        for sid, sz in eligible:
            buckets.setdefault(level(sz), []).append((sid, sz))
        specs: List[MergeSpec] = []
        for lvl in sorted(buckets, reverse=True):
            members = buckets[lvl]
            while len(members) >= self.merge_factor:
                batch = members[: self.merge_factor]
                members = members[self.merge_factor:]
                specs.append(
                    MergeSpec(
                        segment_ids=tuple(sid for sid, _ in batch),
                        total_bytes=sum(sz for _, sz in batch),
                    )
                )
        return specs
