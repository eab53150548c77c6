"""Rank identity under re-partitioning: the same corpus indexed with
different segmentation (the sandbox proxy for different cluster sizes)
must return IDENTICAL top-k docs and float32 scores.

This is the north rule's N-vs-4N requirement: global stats are summed
before scoring (ExactStatsCache semantics) and ties break on the global
doc_id, so results cannot depend on how documents were sharded."""

import numpy as np
import pytest

from lucene_solr_ray.index.build import build_index


QUERIES = {
    0: "merge",
    1: "fast OR slow",
    2: "merge AND sort",
    3: "(fast OR slow) AND merge",
    4: '"batch batch"',
    5: "the",
    6: "mer*",
}


@pytest.mark.usefixtures("ray_session")
def test_topk_identical_across_segmentations(sf_dir, tmp_path):
    from lucene_solr_ray.search.searcher import Index

    results = []
    for docs_per_segment in (80, 500):  # many small vs one big segment
        out = str(tmp_path / f"idx_{docs_per_segment}")
        m = build_index(
            f"{sf_dir}/documents.parquet", out,
            text_col="text", id_col="doc_id",
            docs_per_segment=docs_per_segment,
        )
        results.append(
            (len(m["segments"]), Index(out).search(QUERIES, k=10).to_pandas())
        )
    (n1, a), (n2, b) = results
    assert n1 != n2  # genuinely different parallelism/partitioning
    assert list(a["qid"]) == list(b["qid"])
    assert list(a["doc_id"]) == list(b["doc_id"])
    np.testing.assert_array_equal(
        a["score"].to_numpy(), b["score"].to_numpy()
    )
