"""Lossy byte encodings of positive integers, matching Lucene's SmallFloat.

Semantics mirror the reference ``lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:100-169`` (``longToInt4`` / ``int4ToLong`` / ``intToByte4`` /
``byte4ToInt``): values below ``NUM_FREE_VALUES`` (24) are stored exactly; the
remaining byte space is a 4-significant-bit order-preserving float-like code.
Lengths 0..39 round-trip exactly; above that the encoding is lossy.

Used for the per-document field-length "norm" byte consumed by BM25
(``BM25Similarity.computeNorm``, reference ``BM25Similarity.java:160-170``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "int_to_byte4_np",
    "BYTE4_DECODE_TABLE",
]


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)  # == 231
_NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to one byte (0..255). Exact for i <= 39."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode a byte (0..255) produced by :func:`int_to_byte4`."""
    i = b & 0xFF
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _int4_to_long(i - _NUM_FREE_VALUES)


#: decode table: BYTE4_DECODE_TABLE[b] == byte4_to_int(b); dtype int64.
BYTE4_DECODE_TABLE: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.int64
)


def int_to_byte4_np(x: np.ndarray) -> np.ndarray:
    """Vectorized :func:`int_to_byte4` over a non-negative integer array."""
    x = np.asarray(x, dtype=np.int64)
    if x.size and x.min() < 0:
        raise ValueError("Only supports positive values")
    out = np.empty(x.shape, dtype=np.uint8)
    small = x < _NUM_FREE_VALUES
    out[small] = x[small].astype(np.uint8)
    v = x[~small] - _NUM_FREE_VALUES
    # bit_length via frexp (exact for v < 2**53; field lengths are << that)
    num_bits = np.frexp(v.astype(np.float64))[1]
    sub = num_bits < 4
    enc = np.empty(v.shape, dtype=np.int64)
    enc[sub] = v[sub]
    shift = num_bits[~sub] - 4
    enc[~sub] = ((v[~sub] >> shift) & 0x07) | ((shift + 1) << 3)
    out[~small] = (_NUM_FREE_VALUES + enc).astype(np.uint8)
    return out
