"""SmallFloat norm-byte encoding — golden pairs + invariants.

Golden values per the reference ``lucene/core/src/java/org/apache/lucene/
util/SmallFloat.java:100-169`` semantics: exact below 40, 4-significant-bit
lossy above (order-preserving).
"""

import numpy as np
import pytest

from lucene_solr_ray.analysis.smallfloat import (
    BYTE4_DECODE_TABLE,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_np,
)

GOLDEN = [
    # (length, norm_byte, decoded_len)
    (0, 0, 0),
    (1, 1, 1),
    (23, 23, 23),
    (24, 24, 24),
    (39, 39, 39),
    (40, 40, 40),
    (41, 40, 40),
    (255, 70, 248),
    (1000, 87, 984),
    (1 << 20, 167, 983064),
]


@pytest.mark.parametrize("length,byte,decoded", GOLDEN)
def test_golden(length, byte, decoded):
    assert int_to_byte4(length) == byte
    assert byte4_to_int(byte) == decoded


def test_exact_below_40():
    for i in range(40):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_monotone_and_idempotent():
    prev = -1
    for i in range(100000):
        b = int_to_byte4(i)
        assert b >= prev  # order-preserving
        prev = b
        d = byte4_to_int(b)
        assert d <= i
        assert int_to_byte4(d) == b  # decode is a fixpoint


def test_vectorized_matches_scalar():
    xs = np.concatenate(
        [np.arange(5000), np.array([1 << 10, 1 << 20, (1 << 31) - 1])]
    )
    got = int_to_byte4_np(xs)
    want = np.array([int_to_byte4(int(x)) for x in xs], dtype=np.uint8)
    assert (got == want).all()


def test_decode_table():
    assert BYTE4_DECODE_TABLE.shape == (256,)
    assert BYTE4_DECODE_TABLE[255] == byte4_to_int(255)


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
