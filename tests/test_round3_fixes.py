"""Round-3 regression tests for the advisor findings (ADVICE.md):

1. embedding_near_dups must find cross-block pairs whose ids are NOT
   ordered by block-file order;
2. search.memory star-exports both MemoryIndex and term_vector;
3. update_documents commits ONE manifest generation (atomic two-step);
4. span scoring counts each DISTINCT term's idf once (SpanWeight's
   Map<Term,TermStates> — duplicated leaf terms don't double idf);
5. ShingleFilter never joins tokens across a position hole (stop-word
   gap), matching the reference's filler-token behavior.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.searcher import Index


def test_embedding_neardups_unordered_ids(ray_session, tmp_path):
    """Pair (90, 5) lands in two different blocks with ids reversed
    relative to block order — it must still be emitted (canonicalized)."""
    import ray.data

    from lucene_solr_ray.functions.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    n, dim = 40, 8
    M = rng.normal(size=(n, dim))
    # ids descending so block order is the REVERSE of id order
    ids = np.arange(n)[::-1].copy()
    # make rows 0 and n-1 nearly identical → pair ids (39, 0) hmm: row 0
    # has id 39, row n-1 has id 0; cross-block with id_a from the LATER
    # block smaller than id_b from the earlier block
    M[n - 1] = M[0] + rng.normal(scale=1e-3, size=dim)
    ds = ray.data.from_arrow(
        pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in M]),
        })
    )
    out = embedding_near_dups(
        ds, "embedding", "vec_id", threshold=0.999, block=16,
        scratch_dir=str(tmp_path / "nd"),
    ).to_pandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (0, 39) in pairs
    # canonical ordering everywhere
    assert (out.id_a < out.id_b).all()


def test_memory_index_exports():
    import lucene_solr_ray.search.memory as mem

    assert set(mem.__all__) == {"MemoryIndex", "term_vector"}
    for name in mem.__all__:
        assert hasattr(mem, name)


def test_update_documents_single_generation(ray_session, tmp_path):
    from lucene_solr_ray.index.deletes import update_documents
    from lucene_solr_ray.index.manifest import read_latest_manifest

    texts = [f"alpha doc number {i} common" for i in range(20)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array(texts)}), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id",
                docs_per_segment=10)
    gen0 = read_latest_manifest(out)["generation"]
    update_documents(out, [3, 7], ["zz fresh three", "zz fresh seven"])
    m = read_latest_manifest(out)
    # exactly ONE new manifest generation carries delete + add
    assert m["generation"] == gen0 + 1
    idx = Index(out)
    hits = idx.search({0: "zz"}, k=10).to_pandas()
    assert sorted(hits.doc_id) == [3, 7]
    stale = idx.search({0: "three"}, k=10).to_pandas()
    assert 3 in set(stale.doc_id)


def test_span_duplicate_term_idf_counted_once(ray_session, tmp_path):
    """SpanNear("red","red") and a same-freq distinct-pair control differ
    only in idf; with per-distinct-term idf the duplicated-term query must
    score EXACTLY like a hand-computed single-idf score."""
    from lucene_solr_ray.search.query import SpanNearQuery

    texts = ["red red pad pad", "red pad red pad", "pad pad pad pad"]
    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)}), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id")
    idx = Index(out)
    q = SpanNearQuery(("red", "red"), slop=0, in_order=True)
    hits = idx.search_parsed([(0, q, 10)]).to_pandas()
    assert list(hits.doc_id) == [0]

    # independent oracle: BM25 with idf(red) counted ONCE
    from lucene_solr_ray.analysis.smallfloat import int_to_byte4
    from lucene_solr_ray.search.similarity import BM25Similarity

    sim = BM25Similarity()
    stats, _ = idx.collect_stats(["red"])
    doc_count, sttf = stats.collection_for(None)
    idf = sim.out_dtype(sim.idf_value(stats.df["red"], doc_count))
    sc = sim.scorer_from_idf(1.0, idf, doc_count, sttf)
    # doc 0: one adjacent ("red","red") span, gaps=0 → freq 1/(1+0)=1
    norm = np.asarray([int_to_byte4(4)], dtype=np.uint8)  # 4 tokens
    want = sc.score(np.asarray([1.0]), norm)[0]
    assert hits.score.iloc[0] == np.float32(want)


def test_shingle_respects_position_holes():
    from lucene_solr_ray.analysis.filters import ShingleFilter

    sh = ShingleFilter(min_size=2, max_size=3, output_unigrams=False)
    # 'the' at position 1 was stop-dropped → hole between quick(0), fox(2)
    holey = [("quick", 0), ("fox", 2), ("jumps", 3)]
    shingles = [t for t, _ in sh.apply(holey)]
    assert "quick fox" not in shingles
    assert "quick fox jumps" not in shingles
    assert "fox jumps" in shingles
    # contiguous tokens still shingle normally
    cont = [("quick", 0), ("brown", 1), ("fox", 2)]
    got = [t for t, _ in sh.apply(cont)]
    assert got == ["quick brown", "quick brown fox", "brown fox"]
