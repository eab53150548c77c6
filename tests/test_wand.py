"""checkTopScores property: the pruned (block-max WAND/MaxScore) path must
return exactly the same top-k (docs AND float32 scores) as the exhaustive
COMPLETE-mode scorer — the reference's key pruning oracle
(``lucene/test-framework/.../CheckHits.java:576-640``, used by
``TestBlockMaxConjunction.java:43-81`` and ``TestWANDScorer``).

Corpora follow the reference's randomized-index style: docs drawn from a
small integer vocabulary to force shared terms and deep posting lists
(``TestBlockMaxConjunction.java:43-60``)."""

import random

import numpy as np
import pytest

from lucene_solr_ray.index.segment import build_segment_tables
from lucene_solr_ray.search.parser import parse
from lucene_solr_ray.search.scorer import GlobalStats, topk_segment
from lucene_solr_ray.search.similarity import BM25Similarity


class _MemReader:
    """SegmentReader protocol over in-memory tables (no files)."""

    def __init__(self, seg):
        import numpy as np

        self._seg = seg
        self.norms = seg.docmeta.column("norm").to_numpy()
        self.doc_ids = seg.docmeta.column("doc_id").to_numpy()
        self.ndocs = len(self.norms)
        t = seg.postings
        self._row = {x: i for i, x in enumerate(t.column("term").to_pylist())}
        self._blocks = t.column("blocks")
        self._df = t.column("df").to_numpy()

    def postings_blob(self, term):
        r = self._row.get(term)
        return None if r is None else self._blocks[r].as_py()

    def postings(self, term):
        from lucene_solr_ray.index.postings_codec import decode_postings

        blob = self.postings_blob(term)
        return None if blob is None else decode_postings(blob)

    def positions(self, term):
        import numpy as np

        r = self._row.get(term)
        if r is None:
            return None
        ords, freqs = self.postings(term)
        blob = self._seg.postings.column("positions")[r].as_py() or b""
        vals = np.frombuffer(blob, dtype="<i4")
        offs = np.concatenate([[0], np.cumsum(freqs, dtype=np.int64)])

        def posfn(i):
            return vals[offs[i]: offs[i + 1]]

        return ords, posfn


def _make_corpus(rng: random.Random, n_docs: int, vocab_n: int):
    vocab = [f"t{i}" for i in range(vocab_n)]
    texts = []
    for _ in range(n_docs):
        n = rng.randint(0, 60)
        # zipf-ish skew: low ids much more frequent
        toks = [vocab[min(int(rng.expovariate(0.3)), vocab_n - 1)]
                for _ in range(n)]
        texts.append(" ".join(toks))
    return texts


def _stats(seg, reader):
    st = GlobalStats(
        doc_count=seg.stats["doc_count"],
        sum_total_term_freq=seg.stats["sum_total_term_freq"],
    )
    t = seg.postings
    for term, df, ttf in zip(
        t.column("term").to_pylist(),
        t.column("df").to_pylist(),
        t.column("ttf").to_pylist(),
    ):
        st.df[term] = df
        st.ttf[term] = ttf
    return st


QUERIES = [
    "t0", "t1", "t5 OR t9", "t0 OR t1 OR t2 OR t3",
    "t0 AND t1", "t0 AND t1 AND t2", "t2 OR t40", "t3^2 OR t7",
    "t0 AND t30", '"t0 t1"', '"t1 t2"', '"t0 t40"',
]


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("k", [1, 10])
def test_check_top_scores(seed, k):
    rng = random.Random(seed)
    texts = _make_corpus(rng, 400, 50)
    seg = build_segment_tables(list(range(400)), texts)
    reader = _MemReader(seg)
    stats = _stats(seg, reader)
    sim = BM25Similarity()
    for qs in QUERIES:
        q = parse(qs)
        o_ex, s_ex = topk_segment(reader, q, stats, k, sim, pruning=False)
        o_pr, s_pr = topk_segment(reader, q, stats, k, sim, pruning=True)
        assert list(o_ex) == list(o_pr), (qs, k, list(o_ex), list(o_pr))
        np.testing.assert_array_equal(s_ex, s_pr, err_msg=f"{qs} k={k}")
        assert s_pr.dtype == np.float32


def test_pruned_skips_are_exercised():
    """Deep posting lists + small k: the pruned path must actually skip
    windows (sanity that the threshold machinery engages)."""
    rng = random.Random(9)
    texts = _make_corpus(rng, 3000, 10)
    seg = build_segment_tables(list(range(3000)), texts)
    reader = _MemReader(seg)
    stats = _stats(seg, reader)
    q = parse("t0 OR t1")
    o_ex, s_ex = topk_segment(reader, q, stats, 5, pruning=False)
    o_pr, s_pr = topk_segment(reader, q, stats, 5, pruning=True)
    assert list(o_ex) == list(o_pr)
    np.testing.assert_array_equal(s_ex, s_pr)


def test_missing_required_term_short_circuits():
    seg = build_segment_tables([0, 1], ["a b", "a c"])
    reader = _MemReader(seg)
    stats = _stats(seg, reader)
    o, s = topk_segment(reader, parse("a AND zzz"), stats, 10, pruning=True)
    assert len(o) == 0
