"""In-place numeric DocValues updates — reference contract per
``IndexWriter.updateNumericDocValue`` (IndexWriter.java:1683) +
``DocValuesFieldUpdates``: sidecar overlays, last-write-wins generations,
no updates to deleted docs, merge bakes values in and drops sidecars."""

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.deletes import delete_doc_ids
from lucene_solr_ray.index.docvalues import (
    dvu_fields,
    read_docmeta_column,
    segment_dv_overlay,
    update_numeric_docvalue,
    update_numeric_docvalues_by_id,
)
from lucene_solr_ray.index.manifest import commit_manifest, read_latest_manifest
from lucene_solr_ray.index.merge import merge_segments
from lucene_solr_ray.search.searcher import Index, search_by_field

WORDS = ["merge", "sort", "window", "batch", "key", "fast", "slow", "scan"]


def _mk_corpus(tmp_path, n=120, seed=3):
    rng = random.Random(seed)
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 12)))
        for _ in range(n)
    ]
    prio = [rng.randint(0, 500) for _ in range(n)]
    p = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts),
                  "prio": pa.array(prio, pa.int64())}),
        p,
    )
    return p, texts, prio


@pytest.fixture()
def built(ray_session, tmp_path):
    corpus, texts, prio = _mk_corpus(tmp_path)
    out = str(tmp_path / "idx")
    build_index(corpus, out, text_col="text", id_col="doc_id",
                stored_cols=["prio"], docs_per_segment=30)
    return out, texts, prio


def _expected(texts, vals, term, k):
    """Brute-force (doc_id, value) ranking for docs containing ``term``."""
    hits = [(i, vals[i]) for i, t in enumerate(texts) if term in t.split()]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def test_update_by_term_sort_reads_overlay(built):
    out, texts, prio = built
    update_numeric_docvalue(out, "merge", "prio", 7)
    vals = [7 if "merge" in t.split() else p for t, p in zip(texts, prio)]
    got = search_by_field(Index(out), {0: "batch"}, "prio",
                          descending=True, k=15).to_pandas()
    exp = _expected(texts, vals, "batch", 15)
    assert list(got.doc_id) == [d for d, _ in exp]
    assert [int(v) for v in got.sort_value] == [v for _, v in exp]


def test_last_write_wins_and_generations(built):
    out, texts, prio = built
    update_numeric_docvalue(out, "merge", "prio", 7)
    update_numeric_docvalue(out, "sort", "prio", 9000)
    vals = [
        9000 if "sort" in t.split()
        else (7 if "merge" in t.split() else p)
        for t, p in zip(texts, prio)
    ]
    idx = Index(out)
    for d in idx.seg_dirs:
        got, overlaid = read_docmeta_column(d, "prio")
        ids = pq.read_table(
            os.path.join(d, "docmeta.parquet"), columns=["doc_id"]
        ).column("doc_id").to_numpy()
        assert overlaid
        np.testing.assert_array_equal(
            got.astype(np.int64), np.asarray([vals[i] for i in ids])
        )
        # two updates touched this segment iff both terms occur in it;
        # generation is monotone and recorded in the manifest
        assert dvu_fields(d).get("prio", 0) >= 1
    m = read_latest_manifest(out)
    assert any(s.get("dv_gens", {}).get("prio") for s in m["segments"])


def test_update_by_id_values(built):
    out, texts, prio = built
    upd = {i: i * 3 + 1 for i in range(0, 120, 7)}
    update_numeric_docvalues_by_id(out, "prio", upd)
    idx = Index(out)
    for d in idx.seg_dirs:
        got, _ = read_docmeta_column(d, "prio")
        ids = pq.read_table(
            os.path.join(d, "docmeta.parquet"), columns=["doc_id"]
        ).column("doc_id").to_numpy()
        exp = [upd.get(int(i), prio[int(i)]) for i in ids]
        np.testing.assert_array_equal(got.astype(np.int64), exp)


def test_deleted_docs_not_updated(built):
    out, texts, prio = built
    delete_doc_ids(out, [5, 6, 7])
    update_numeric_docvalues_by_id(out, "prio", {5: 1, 6: 1, 50: 42})
    idx = Index(out)
    touched = set()
    for d in idx.seg_dirs:
        ov = segment_dv_overlay(d, "prio")
        if ov is None:
            continue
        ids = pq.read_table(
            os.path.join(d, "docmeta.parquet"), columns=["doc_id"]
        ).column("doc_id").to_numpy()
        touched.update(int(ids[o]) for o in ov[0])
    assert touched == {50}


def test_merge_bakes_overlays_and_drops_sidecars(built):
    out, texts, prio = built
    update_numeric_docvalue(out, "merge", "prio", 7)
    update_numeric_docvalue(out, "sort", "prio", 9000)
    before = search_by_field(Index(out), {0: "batch"}, "prio",
                             descending=True, k=15)
    m = read_latest_manifest(out)
    ids = [s["segment_id"] for s in m["segments"]]
    meta = merge_segments(out, ids, max(ids) + 1)
    commit_manifest(out, [meta])
    idx = Index(out)
    assert len(idx.seg_dirs) == 1
    assert dvu_fields(idx.seg_dirs[0]) == {}  # baked in, no sidecars
    _, overlaid = read_docmeta_column(idx.seg_dirs[0], "prio")
    assert not overlaid
    after = search_by_field(idx, {0: "batch"}, "prio",
                            descending=True, k=15)
    assert before.equals(after)


def test_overlay_disables_index_sort_early_exit(ray_session, tmp_path):
    corpus, texts, prio = _mk_corpus(tmp_path, seed=9)
    out = str(tmp_path / "isort")
    build_index(corpus, out, text_col="text", id_col="doc_id",
                stored_cols=["prio"], docs_per_segment=30,
                index_sort=("prio", True))
    # rewrite values so physical order no longer matches value order
    update_numeric_docvalue(out, "window", "prio", 10_000)
    vals = [10_000 if "window" in t.split() else p
            for t, p in zip(texts, prio)]
    got = search_by_field(Index(out), {0: "batch"}, "prio",
                          descending=True, k=10).to_pandas()
    exp = _expected(texts, vals, "batch", 10)
    assert list(got.doc_id) == [d for d, _ in exp]
    assert [int(v) for v in got.sort_value] == [v for _, v in exp]
