"""MinHashFilter (reference ``analysis/minhash/MinHashFilter.java:47``)
+ the public MurmurHash3 x64 128."""

import pytest

from lucene_solr_ray.analysis.minhash import MinHashFilter, murmur3_x64_128


def test_murmur3_smhasher_verification():
    """The canonical SMHasher VerificationTest for MurmurHash3_x64_128:
    expected value 0x6384BA69 — bit-exactness with the public reference
    (and hence the Lucene port)."""
    buf = b""
    for i in range(256):
        h1, h2 = murmur3_x64_128(bytes(range(i)), seed=256 - i)
        buf += h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    h1, _ = murmur3_x64_128(buf, seed=0)
    assert h1 & 0xFFFFFFFF == 0x6384BA69
    assert murmur3_x64_128(b"") == (0, 0)


def _shingles(text, n=3):
    w = text.split()
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def test_minhash_filter_semantics():
    f = MinHashFilter(hash_count=1, bucket_count=8, hash_set_size=1)
    text = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    stream = [(t, i) for i, t in enumerate(_shingles(text))]
    out = f.apply(stream)
    # rotation fills every bucket when any token exists
    assert len(out) == 8
    # all stacked at one position; fixed-width hex terms
    assert all(p == 0 for _, p in out)
    assert all(len(t) == 32 for t, _ in out)
    # deterministic
    assert f.apply(stream) == out
    # near-identical shingle sets share most buckets (the LSH property)
    text2 = text.replace("tonight", "today")
    out2 = f.apply([(t, i) for i, t in enumerate(_shingles(text2))])
    same = sum(a == b for (a, _), (b, _) in zip(out, out2))
    assert same >= 5
    # disjoint text shares (almost) none
    other = MinHashFilter(hash_count=1, bucket_count=8).apply(
        [(t, i) for i, t in enumerate(_shingles(
            "alpha beta gamma delta epsilon zeta eta theta iota"))])
    diff = sum(a == b for (a, _), (b, _) in zip(out, other))
    assert diff <= 2


def test_minhash_filter_variants():
    stream = [("one two three", 0), ("two three four", 1)]
    # hash_count > 1: variant index prefixes the term (8 hex chars)
    f = MinHashFilter(hash_count=4, bucket_count=1, hash_set_size=1,
                      with_rotation=False)
    out = f.apply(stream)
    assert len(out) == 4
    assert [t[:8] for t, _ in out] == [
        "00000000", "00000001", "00000002", "00000003"]
    # hash_set_size keeps the k smallest per bucket, ascending
    g = MinHashFilter(hash_count=1, bucket_count=1, hash_set_size=2,
                      with_rotation=False)
    got = [t for t, _ in g.apply(stream)]
    assert len(got) == 2 and got == sorted(got)
    # empty stream → no tokens
    assert f.apply([]) == []
    with pytest.raises(ValueError):
        MinHashFilter(hash_count=0)
