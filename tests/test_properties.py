"""Hypothesis property tests — the reference's randomized-testing style
(``RandomPostingsTester``, ``BaseSimilarityTestCase`` fuzzing) driven by a
real property-based engine.

All properties run on pure kernels (no Ray): codec round-trips, SmallFloat
monotonicity, tokenizer window laws, BM25 bounds, checkTopScores.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis.smallfloat import byte4_to_int, int_to_byte4
from lucene_solr_ray.analysis.tokenizer import tokenize
from lucene_solr_ray.index.postings_codec import (
    concat_postings,
    decode_postings,
    encode_postings,
)
from lucene_solr_ray.search.similarity import BM25Similarity


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 1 << 20), min_size=1, max_size=500, unique=True),
    st.data(),
)
def test_codec_round_trip(ords, data):
    ords = np.sort(np.asarray(ords, dtype=np.int64))
    freqs = np.asarray(
        data.draw(
            st.lists(st.integers(1, 1 << 20), min_size=len(ords),
                     max_size=len(ords))
        ),
        dtype=np.int64,
    )
    norms = np.asarray(
        data.draw(
            st.lists(st.integers(0, 255), min_size=len(ords),
                     max_size=len(ords))
        ),
        dtype=np.uint8,
    )
    blob = encode_postings(ords, freqs, norms)
    o, f = decode_postings(blob)
    np.testing.assert_array_equal(o, ords)
    np.testing.assert_array_equal(f, freqs)


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.lists(st.integers(0, 5000), min_size=1, max_size=200, unique=True),
    min_size=1, max_size=4,
))
def test_concat_equals_decode_concat(segments):
    parts, want = [], []
    base = 0
    for seg in segments:
        ords = np.sort(np.asarray(seg, dtype=np.int64))
        freqs = np.ones(len(ords), dtype=np.int64)
        norms = np.zeros(len(ords), dtype=np.uint8)
        parts.append((encode_postings(ords, freqs, norms), base))
        want.append(ords + base)
        base += 5001
    o, _ = decode_postings(concat_postings(parts))
    np.testing.assert_array_equal(o, np.concatenate(want))


@settings(max_examples=500, deadline=None)
@given(st.integers(0, (1 << 31) - 1), st.integers(0, (1 << 31) - 1))
def test_smallfloat_order_preserving(a, b):
    ea, eb = int_to_byte4(a), int_to_byte4(b)
    if a <= b:
        assert ea <= eb
    da = byte4_to_int(ea)
    assert da <= a and int_to_byte4(da) == ea


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab_9. '-x", max_size=300), st.integers(4, 64))
def test_tokenizer_window_law(text, max_len):
    """No emitted token exceeds the window; tokens cover disjoint spans;
    every token is non-empty and contains at least one alnum."""
    toks = tokenize(text, max_token_length=max_len)
    for t in toks:
        assert 0 < len(t) <= max_len
        assert any(c.isalnum() or not c.isascii() for c in t)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(1, 1000), st.integers(1, 1000), st.floats(1.0, 1000.0),
    st.integers(0, 255),
)
def test_bm25_bounds(df, extra, freq, norm):
    doc_count = df + extra
    sim = BM25Similarity()
    sc = sim.scorer(1.0, doc_count, doc_count * 10, df)
    s = sc.score(np.array([freq]), np.array([norm], dtype=np.uint8))[0]
    assert 0.0 <= s <= sc.max_score()
    # monotone in freq
    s2 = sc.score(np.array([freq + 1.0]), np.array([norm], dtype=np.uint8))[0]
    assert s2 >= s
