"""Build → query round-trip vs an independent brute-force oracle.

Mirrors the reference's test strategy (SURVEY §5): the distributed pipeline
must agree doc-for-doc and float32-score-for-score with a driver-side
exhaustive rescoring that shares only the similarity/analysis kernels.
"""

import math

import numpy as np
import pytest

from lucene_solr_ray.analysis.analyzer import StandardAnalyzer
from lucene_solr_ray.analysis.smallfloat import byte4_to_int, int_to_byte4
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.manifest import read_latest_manifest


@pytest.fixture(scope="module")
def built_index(ray_session, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    manifest = build_index(
        f"{sf_dir}/documents.parquet",
        out,
        text_col="text",
        id_col="doc_id",
        docs_per_segment=150,
    )
    return out, manifest


@pytest.fixture(scope="module")
def corpus(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def brute_force_topk(doc_ids, texts, query_terms, k, mode="or"):
    """Dense python BM25 oracle (no segment machinery)."""
    a = StandardAnalyzer()
    tfs = [a.term_freqs(t) for t in texts]
    dls = [sum(tf.values()) for tf in tfs]
    N = len(texts)
    sttf = sum(dls)
    avgdl = np.float32(float(sttf) / N)
    k1, b = np.float32(1.2), np.float32(0.75)
    hits = []
    for i in range(N):
        per_term = []
        for term in query_terms:
            f = tfs[i].get(term, 0)
            per_term.append(f)
        if mode == "and" and not all(per_term):
            continue
        if mode == "or" and not any(per_term):
            continue
        acc = 0.0  # float64 accumulation of float32 clause scores
        for term, f in zip(query_terms, per_term):
            if f == 0:
                continue
            df = sum(1 for tf in tfs if term in tf)
            idf = np.float32(math.log(1 + (N - df + 0.5) / (df + 0.5)))
            dl = np.float32(byte4_to_int(int_to_byte4(dls[i])))
            cache = np.float32(
                k1 * ((np.float32(1) - b) + b * dl / avgdl)
            )
            w = np.float32(np.float32(k1 + np.float32(1)) * idf)
            acc += float(w * np.float32(f / (f + float(cache))))
        hits.append((np.float32(acc), i, doc_ids[i]))
    hits.sort(key=lambda h: (-h[0], h[1]))
    return hits[:k]


@pytest.mark.parametrize(
    "qstr,terms,mode",
    [
        ("merge", ["merge"], "or"),
        ("fast OR slow", ["fast", "slow"], "or"),
        ("merge AND sort", ["merge", "sort"], "and"),
        ("merge AND sort AND window", ["merge", "sort", "window"], "and"),
    ],
)
def test_topk_matches_bruteforce(built_index, corpus, qstr, terms, mode):
    from lucene_solr_ray.search.searcher import Index

    out, _ = built_index
    doc_ids, texts = corpus
    got = Index(out).search({0: qstr}, k=10).to_pandas()
    want = brute_force_topk(doc_ids, texts, terms, 10, mode)
    assert list(got["doc_id"]) == [w[2] for w in want]
    np.testing.assert_array_equal(
        got["score"].to_numpy(),
        np.array([w[0] for w in want], dtype=np.float32),
    )


def test_manifest_stats(built_index, corpus):
    out, manifest = built_index
    doc_ids, texts = corpus
    a = StandardAnalyzer()
    assert manifest["doc_count"] == len(texts)
    assert manifest["sum_total_term_freq"] == sum(
        sum(a.term_freqs(t).values()) for t in texts
    )
    assert len(manifest["segments"]) >= 2  # multiple segments (row-group snapped)


def test_nonexistent_term_empty(built_index, ray_session):
    from lucene_solr_ray.search.searcher import Index

    out, _ = built_index
    got = Index(out).search({7: "zzzqqqxyzzy"}, k=10)
    assert got.num_rows == 0


def test_phrase_query(built_index, corpus):
    from lucene_solr_ray.search.searcher import Index

    out, _ = built_index
    doc_ids, texts = corpus
    got = Index(out).search({0: '"batch batch"'}, k=500).to_pandas()
    # oracle: docs where "batch batch" occurs adjacently
    a = StandardAnalyzer()
    want_docs = set()
    for d, t in zip(doc_ids, texts):
        toks = a.analyze(t)
        if any(x == y == "batch" for x, y in zip(toks, toks[1:])):
            want_docs.add(d)
    assert set(got["doc_id"]) == want_docs


def test_prefix_query_matches_terms(built_index, corpus):
    from lucene_solr_ray.search.searcher import Index

    out, _ = built_index
    doc_ids, texts = corpus
    got = Index(out).search({0: "mer*"}, k=500).to_pandas()
    a = StandardAnalyzer()
    want = {
        d
        for d, t in zip(doc_ids, texts)
        if any(tok.startswith("mer") for tok in a.analyze(t))
    }
    assert set(got["doc_id"]) == want
    # constant-score rewrite: every score == 1.0
    assert (got["score"] == 1.0).all()


def test_resume_skips_built_segments(built_index, sf_dir, ray_session):
    out, manifest = built_index
    import os
    import time

    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "postings.parquet"))
        for d in os.listdir(out)
        if d.startswith("seg_")
    }
    m2 = build_index(
        f"{sf_dir}/documents.parquet",
        out,
        text_col="text",
        id_col="doc_id",
        docs_per_segment=150,
    )
    assert m2["generation"] == manifest["generation"] + 1
    assert m2["doc_count"] == manifest["doc_count"]
    for d, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "postings.parquet")) == mt


def test_sha256_invariant(built_index, corpus):
    """Per-row invariant: content_sha256 in docmeta == sha256 of input."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    out, _ = built_index
    doc_ids, texts = corpus
    want = {d: hashlib.sha256(t.encode()).digest() for d, t in zip(doc_ids, texts)}
    seen = 0
    for d in sorted(os.listdir(out)):
        if not d.startswith("seg_"):
            continue
        t = pq.read_table(os.path.join(out, d, "docmeta.parquet"))
        for did, sha in zip(
            t.column("doc_id").to_pylist(), t.column("content_sha256").to_pylist()
        ):
            assert want[did] == sha
            seen += 1
    assert seen == len(texts)


def test_stored_cols_ride_docmeta(ray_session, sf_dir, tmp_path):
    """Docstore columns (stored fields) persist alongside docmeta and come
    back through the two-phase fetch."""
    import os

    import pyarrow.parquet as pq

    from lucene_solr_ray.search.fetch import fetch_from_corpus
    from lucene_solr_ray.search.searcher import Index

    out = str(tmp_path / "stored")
    build_index(
        f"{sf_dir}/documents.parquet", out,
        text_col="text", id_col="doc_id", stored_cols=["lang", "source"],
        docs_per_segment=200,
    )
    seg = sorted(d for d in os.listdir(out) if d.startswith("seg_"))[0]
    dm = pq.read_table(os.path.join(out, seg, "docmeta.parquet"))
    assert {"lang", "source"} <= set(dm.schema.names)

    # fetch winners' stored fields straight from the segment docmeta files
    res = Index(out).search({0: "merge"}, k=3)
    import pyarrow.dataset as pads

    side = pads.dataset(
        [os.path.join(out, d, "docmeta.parquet")
         for d in sorted(os.listdir(out)) if d.startswith("seg_")],
        format="parquet",
    ).to_table(columns=["doc_id", "lang"])
    joined = res.join(side, keys="doc_id")
    assert joined.num_rows == 3
    assert all(v is not None for v in joined.column("lang").to_pylist())


def test_sloppy_phrase_matches_positional_oracle(built_index, corpus):
    """Sloppy phrases: the matched-doc set equals a positional brute
    oracle; exact-phrase docs rank above slop-only docs (sloppyWeight)."""
    from lucene_solr_ray.search.searcher import Index

    out, _ = built_index
    doc_ids, texts = corpus
    got = Index(out).search({0: '"fast key"~2'}, k=500).to_pandas()
    a = StandardAnalyzer()
    want = set()
    for d, t in zip(doc_ids, texts):
        toks = a.analyze(t)
        pf = [i for i, w in enumerate(toks) if w == "fast"]
        pk = [i for i, w in enumerate(toks) if w == "key"]
        if any(abs((k - 1) - f) <= 2 and f != k for f in pf for k in pk):
            want.add(d)
    assert set(got["doc_id"]) == want
    exact = set(
        Index(out).search({0: '"fast key"'}, k=500).to_pandas()["doc_id"]
    )
    assert exact <= set(got["doc_id"])
