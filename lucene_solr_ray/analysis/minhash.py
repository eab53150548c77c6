"""MinHashFilter: index-time LSH fingerprints over a (shingled) stream.

Reference ``lucene/analysis/common/src/java/org/apache/lucene/analysis/
minhash/MinHashFilter.java:47`` (used by Solr's MinHash query parsing
for similarity search): hash every incoming token (typically a 5-word
shingle) with MurmurHash3 x64 128, derive ``hash_count`` variants by
ordered combination with the hash of the variant index, bucket the
128-bit space into ``bucket_count`` ranges by the top 32 bits, and keep
the ``hash_set_size`` smallest values per (variant, bucket).  At end of
stream the surviving minima are emitted as tokens, all stacked at one
position; ``with_rotation`` (the default when ``hash_set_size == 1``
in Solr configs) fills empty buckets with the next non-empty bucket's
minimum, exactly the reference's wrap-around loop.

MurmurHash3 x64 128 follows Austin Appleby's public-domain reference
(verified by the SMHasher verification self-test, 0x6384BA69); input
bytes are the token's UTF-16LE encoding, as the reference hashes.

One deliberate surface deviation: the reference packs the selected
128-bit values into raw UTF-16 code units (which may be unpaired
surrogates — unrepresentable in UTF-8 parquet columns); this engine
emits the same values as fixed-width HEX strings.  Token EQUALITY — the
only property LSH uses — is preserved bit-for-bit.
"""

from __future__ import annotations

import bisect
from typing import List, Tuple

from lucene_solr_ray.analysis.filters import TokenFilter

__all__ = ["MinHashFilter", "murmur3_x64_128"]

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_x64_128(key: bytes, seed: int = 0) -> Tuple[int, int]:
    """(h1, h2) as unsigned 64-bit ints — Appleby's MurmurHash3_x64_128."""
    n = len(key)
    h1 = h2 = seed & 0xFFFFFFFF
    nblocks = n // 16
    for b in range(nblocks):
        o = b * 16
        k1 = int.from_bytes(key[o:o + 8], "little")
        k2 = int.from_bytes(key[o + 8:o + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = key[nblocks * 16:]
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        if len(tail) > 8:
            k2 = (k2 * _C2) & _M
            k2 = _rotl(k2, 33)
            k2 = (k2 * _C1) & _M
            h2 ^= k2
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def _int_hash(i: int) -> Tuple[int, int]:
    return murmur3_x64_128(i.to_bytes(4, "big"))


def _combine_ordered(a: Tuple[int, int], b: Tuple[int, int]):
    # Guava combineOrdered over both 64-bit halves, starting from (0, 0)
    v1 = (a[0] * 37 + b[0]) & _M  # result = 0*37 + a, then *37 + b
    v2 = (a[1] * 37 + b[1]) & _M
    return v1, v2


class MinHashFilter(TokenFilter):
    """See module docstring.  ``apply`` consumes the whole stream and
    returns the minhash tokens (all at position 0, matching the
    reference's posIncr 1,0,0,... emission)."""

    def __init__(self, hash_count: int = 1, bucket_count: int = 512,
                 hash_set_size: int = 1, with_rotation: bool = None):
        if min(hash_count, bucket_count, hash_set_size) <= 0:
            raise ValueError("hash/bucket/set sizes must be positive")
        self.hash_count = int(hash_count)
        self.bucket_count = int(bucket_count)
        self.hash_set_size = int(hash_set_size)
        #: Solr's factory defaults withRotation to (bucketCount > 1)
        #: when unset
        self.with_rotation = (bucket_count > 1) if with_rotation is None \
            else bool(with_rotation)
        self.bucket_size = (1 << 32) // self.bucket_count
        if (1 << 32) % self.bucket_count != 0:
            self.bucket_size += 1
        self._int_hashes = [_int_hash(i) for i in range(self.hash_count)]

    def apply(self, stream):
        # buckets[i][j] = ascending unique (v2, v1) pairs, capped
        buckets: List[List[List[Tuple[int, int]]]] = [
            [[] for _ in range(self.bucket_count)]
            for _ in range(self.hash_count)
        ]

        def add(minset: List[Tuple[int, int]], item: Tuple[int, int]):
            # FixedSizeTreeSet.add: reject when full and item >= last
            if len(minset) >= self.hash_set_size:
                if item >= minset[-1]:
                    return
                minset.pop()
            if item not in minset:
                bisect.insort(minset, item)

        for t, _p in stream:
            h = murmur3_x64_128(t.encode("utf-16-le"))
            for i in range(self.hash_count):
                v1, v2 = _combine_ordered(h, self._int_hashes[i])
                b = (v2 >> 32) // self.bucket_size
                # sort key: unsigned (val2, val1) — the LongPair order
                add(buckets[i][int(b)], (v2, v1))

        if not any(bs for row in buckets for bs in row):
            return []

        if self.with_rotation and self.hash_set_size == 1:
            for i in range(self.hash_count):
                row = buckets[i]
                for j in range(self.bucket_count):
                    if not row[j]:
                        for off in range(1, self.bucket_count):
                            src = row[(j + off) % self.bucket_count]
                            if src:
                                row[j].append(src[0])
                                break

        out = []
        for i in range(self.hash_count):
            for j in range(self.bucket_count):
                for v2, v1 in buckets[i][j]:
                    if self.hash_count > 1:
                        term = (f"{i:08x}{v2:016x}{v1 >> 32:08x}")
                    else:
                        term = f"{v2:016x}{v1:016x}"
                    out.append((term, 0))
        return out
