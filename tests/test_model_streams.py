"""ModelStream / ClassifyStream / ExecutorStream / ScoreNodesStream tests.

Reference semantics under test: ClassifyStream.java:140-176 scoring,
ModelStream's latest-iteration fetch, ExecutorStream's fire-and-forget
bounded pool, ScoreNodesStream.java:243 tf-idf node scoring.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def model_dir(tmp_path):
    from lucene_solr_ray.stages.model import save_model

    d = str(tmp_path / "models")
    save_model(d, "m1", ["a", "b"], [0.1, 0.2, 0.3], iteration=0)
    save_model(d, "m1", ["a", "b"], [1.0, 2.0, -1.0], [1.5, 0.5],
               iteration=7)
    save_model(d, "other", ["x"], [9.0, 9.0], iteration=99)
    return d


def test_model_stream_fetches_latest_iteration(ray_session, model_dir):
    from lucene_solr_ray.stages.model import load_model, model_stream

    m = load_model(model_dir, "m1")
    assert m["iteration_i"] == 7
    assert m["weights_ds"] == [1.0, 2.0, -1.0]
    assert m["idfs_ds"] == [1.5, 0.5]
    # the Dataset wrapper carries the same single tuple
    rows = model_stream(model_dir, "m1").take_all()
    assert len(rows) == 1 and rows[0]["iteration_i"] == 7


def test_load_model_missing_raises(model_dir):
    from lucene_solr_ray.stages.model import load_model

    with pytest.raises(FileNotFoundError):
        load_model(model_dir, "nope")


def test_classify_stream_reference_formula(ray_session, model_dir):
    """Hand-computed ClassifyStream scoring: tf=1+ln(count),
    feature=idf*tf, total=w0+Σ feature*w, prob=sigmoid,
    score=total/sqrt(termCount over ALL tokens)."""
    import ray.data

    from lucene_solr_ray.stages.model import classify_stream, load_model

    model = load_model(model_dir, "m1")
    ds = ray.data.from_items(
        [
            {"doc_id": 0, "text": "a a b c"},     # a×2, b×1, 4 tokens
            {"doc_id": 1, "text": ""},            # empty → bias only
            {"doc_id": 2, "text": "c c c"},       # no model terms
        ]
    )
    out = classify_stream(ds, model, "text").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    tf_a = 1 + math.log(2.0)
    total0 = 1.0 + 1.5 * tf_a * 2.0 + 0.5 * 1.0 * (-1.0)
    assert out.loc[0, "probability_d"] == pytest.approx(
        1 / (1 + math.exp(-total0)))
    assert out.loc[0, "score_d"] == pytest.approx(total0 / math.sqrt(4))
    assert out.loc[1, "probability_d"] == pytest.approx(
        1 / (1 + math.exp(-1.0)))
    assert out.loc[1, "score_d"] == pytest.approx(1.0)  # denom clamps to 1
    assert out.loc[2, "score_d"] == pytest.approx(1.0 / math.sqrt(3))


def test_classify_stream_actor_pool_matches_inline(ray_session, model_dir):
    import ray.data

    from lucene_solr_ray.stages.model import classify_stream, load_model

    model = load_model(model_dir, "m1")
    ds = ray.data.from_items(
        [{"doc_id": i, "text": "a b" if i % 2 else "b b a"}
         for i in range(20)]
    )
    inline = classify_stream(ds, model, "text").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pooled = classify_stream(ds, model, "text", concurrency=2).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(inline, pooled)


def test_executor_stream_runs_all_and_survives_failures(ray_session):
    import ray.data

    from lucene_solr_ray.stages.plumbing import executor_stream

    ran = []

    def compile_fn(expr):
        def _go():
            if expr == "boom":
                raise RuntimeError("compile error")
            ran.append(expr)
        return _go

    exprs = ray.data.from_items(
        [{"expr_s": "e1"}, {"expr_s": "boom"}, {"expr_s": "e2"}]
    )
    out = executor_stream(exprs, compile_fn, threads=2).to_pandas()
    assert sorted(ran) == ["e1", "e2"]
    assert len(out) == 3
    bad = out[out["expr_s"] == "boom"].iloc[0]
    assert not bad["ok"] and "compile error" in bad["error"]
    assert out[out["expr_s"] != "boom"]["ok"].all()


def test_score_nodes_reference_formula(ray_session):
    """nodeScore = (ln(termFreq)+1) * (ln((numDocs+1)/(docFreq+1))+1)
    against a hand-built 10-doc collection."""
    import ray.data

    from lucene_solr_ray.stages.graph import score_nodes

    docs = ray.data.from_items(
        [{"tag": "p1"}] * 2 + [{"tag": "p2"}] * 6 + [{"tag": "p3"}] * 2
    ).repartition(3)
    nodes = pd.DataFrame(
        {"node": ["p1", "p2", "missing"], "ancestors": [4, 2, 3]}
    )
    out = score_nodes(nodes, docs, "tag")
    assert len(out) == 3
    assert (out["numDocs"] == 10).all()
    by = out.set_index("node")
    assert by.loc["p1", "docFreq"] == 2
    assert by.loc["p2", "docFreq"] == 6
    assert by.loc["missing", "docFreq"] == 0

    def expect(tf, df):
        return (math.log(tf) + 1.0) * (math.log(11 / (df + 1.0)) + 1.0)

    assert by.loc["p1", "nodeScore"] == pytest.approx(expect(4, 2))
    assert by.loc["p2", "nodeScore"] == pytest.approx(expect(2, 6))
    assert by.loc["missing", "nodeScore"] == pytest.approx(expect(3, 0))
    # sorted highest score first
    assert list(out["nodeScore"]) == sorted(out["nodeScore"], reverse=True)


def test_score_nodes_gate_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from lucene_solr_ray.pipelines.relational import (SCORE_NODES_SQL,
                                                      score_nodes_parts)

    got = score_nodes_parts(sf_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = con.execute(SCORE_NODES_SQL).df()
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict()).reset_index(drop=True),
        check_exact=False, rtol=0, atol=1.000001e-6,
    )


def test_classify_stream_gate_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from lucene_solr_ray.pipelines.training import (CLASSIFY_STREAM_SQL,
                                                    classify_stream_docs)

    got = classify_stream_docs(sf_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(CLASSIFY_STREAM_SQL).df()
    assert len(got) == len(want) == 500
    np.testing.assert_array_equal(got["doc_id"], want["doc_id"])
    np.testing.assert_allclose(
        got["probability_d"], want["probability_d"], atol=2e-6)
    np.testing.assert_allclose(got["score_d"], want["score_d"], atol=2e-6)
