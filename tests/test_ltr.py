"""LTR re-ranking (solr/contrib/ltr): model math, normalizers, feature
extraction, and the two-pass rescore protocol.

Reference semantics under test:
  LTRRescorer.java:102-146  — re-rank only the first-pass top window,
    ties broken by ascending docid
  LinearModel.java:113-119  — dot product of normalized features
  MultipleAdditiveTreesModel.java:113,260-262 — threshold+1e-6 split,
    unknown feature scores 0
  NeuralNetworkModel.java   — dense layers, final width must be 1
  MinMaxNormalizer.java / StandardNormalizer.java — delta/std validation
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.search.ltr import (
    FieldLengthFeature,
    FieldValueFeature,
    LinearModel,
    MinMaxNormalizer,
    MultipleAdditiveTreesModel,
    NeuralNetworkModel,
    OriginalScoreFeature,
    SolrFeature,
    StandardNormalizer,
    ValueFeature,
    ltr_rescore,
)


def test_linear_model_score_and_validation():
    m = np.array([[1.0, 2.0], [3.0, 4.0]])
    model = LinearModel({"a": 0.5, "b": 2.0})
    np.testing.assert_allclose(
        model.score(m, ["a", "b"]), [0.5 + 4.0, 1.5 + 8.0]
    )
    with pytest.raises(ValueError, match="lacks weight"):
        model.validate(["a", "b", "c"])
    with pytest.raises(ValueError, match="any weights"):
        LinearModel({}).validate(["x"])


def test_trees_split_slack_and_unknown_feature():
    # value exactly at threshold+1e-6 goes LEFT (ref adds the slack)
    model = MultipleAdditiveTreesModel((
        {"weight": 1.0,
         "root": {"feature": "f", "threshold": 1.0,
                  "left": {"value": 10.0}, "right": {"value": 20.0}}},
    ))
    m = np.array([[1.0 + 1e-6], [1.0 + 1e-3]])
    np.testing.assert_allclose(model.score(m, ["f"]), [10.0, 20.0])
    # unknown feature name in a node scores 0 for that tree
    model2 = MultipleAdditiveTreesModel((
        {"weight": 3.0,
         "root": {"feature": "nope", "threshold": 0.0,
                  "left": {"value": 1.0}, "right": {"value": 2.0}}},
    ))
    np.testing.assert_allclose(model2.score(m, ["f"]), [0.0, 0.0])
    with pytest.raises(ValueError, match="missing"):
        MultipleAdditiveTreesModel(
            ({"weight": 1.0, "root": {"feature": "f", "threshold": 1.0,
                                      "left": {"value": 1.0}}},)
        ).validate(["f"])


def test_neural_network_model():
    # relu layer then identity output: score = max(f0+f1, 0) * 2
    model = NeuralNetworkModel((
        {"matrix": [[1.0, 1.0]], "bias": [0.0], "activation": "relu"},
        {"matrix": [[2.0]], "bias": [0.0]},
    ))
    model.validate(["a", "b"])
    m = np.array([[1.0, 2.0], [-3.0, 1.0]])
    np.testing.assert_allclose(model.score(m, ["a", "b"]), [6.0, 0.0])
    with pytest.raises(ValueError, match="single value"):
        NeuralNetworkModel(
            ({"matrix": [[1.0], [2.0]], "bias": [0.0, 0.0]},)
        ).validate(["a"])


def test_normalizer_validation():
    with pytest.raises(ValueError):
        MinMaxNormalizer(2.0, 2.0)
    with pytest.raises(ValueError):
        StandardNormalizer(0.0, 0.0)
    np.testing.assert_allclose(
        MinMaxNormalizer(0.0, 10.0).normalize(np.array([5.0])), [0.5]
    )
    np.testing.assert_allclose(
        StandardNormalizer(1.0, 2.0).normalize(np.array([5.0])), [2.0]
    )


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import Index

    tmp = tmp_path_factory.mktemp("ltr_idx")
    texts = [
        "merge sort fast",                       # matches both terms
        "merge merge merge only",                # high tf on merge
        "sort routine",                          # sort only
        "merge sort merge sort batch",           # both + batch feature hits
        "unrelated words entirely here",         # no match
        "batch merge pipeline sort stage",       # both + batch
    ]
    p = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array(
                [len(t) for t in texts], pa.int64()
            ),
        }),
        p,
    )
    out = str(tmp / "idx")
    build_index(p, out, text_col="text", id_col="doc_id",
                docs_per_segment=3,
                numeric_fields={"n_chars": "n_chars"})
    return Index(out)


def test_rescore_original_score_identity(small_index):
    """With a single OriginalScoreFeature and weight 1, the re-ranked
    order equals the first-pass order and score == first_pass."""
    t = ltr_rescore(
        small_index, "merge sort",
        LinearModel({"orig": 1.0}), [OriginalScoreFeature("orig")],
        k=5, window=10,
    ).to_pandas()
    assert len(t) == 5
    np.testing.assert_allclose(t["score"], t["first_pass"])
    # first_pass descending, docid-ascending tiebreak
    assert list(t["first_pass"]) == sorted(t["first_pass"], reverse=True)


def test_rescore_features_and_window(small_index):
    """SolrFeature default for non-matching docs, ValueFeature efi,
    FieldValueFeature from points, and the window cut."""
    feats = [
        OriginalScoreFeature("orig"),
        SolrFeature("fb", q="batch", default=-1.0),
        ValueFeature("c", efi_key="boost", default=0.0),
        FieldValueFeature("nc", field="n_chars", default=-5.0),
    ]
    t = ltr_rescore(
        small_index, "merge sort",
        LinearModel({"orig": 0.0, "fb": 1.0, "c": 1.0, "nc": 0.0}),
        feats, k=10, window=10, efi={"boost": 2.0},
    ).to_pandas()
    ids = set(t["doc_id"])
    assert ids == {0, 1, 2, 3, 5}  # every doc matching merge OR sort
    # docs without 'batch' get default (-1) + efi 2.0 = 1.0;
    # docs 3 and 5 contain 'batch' so their fb score > 0 → score > 2.0
    by_id = t.set_index("doc_id")["score"]
    assert by_id[3] > 2.0 and by_id[5] > 2.0
    assert abs(by_id[0] - 1.0) < 1e-9
    # window=2 keeps only the top-2 first-pass docs
    t2 = ltr_rescore(
        small_index, "merge sort",
        LinearModel({"orig": 1.0}), [OriginalScoreFeature("orig")],
        k=10, window=2,
    ).to_pandas()
    assert len(t2) == 2


def test_rescore_field_length_is_smallfloat_decoded(small_index):
    """FieldLengthFeature returns the LOSSY SmallFloat round-trip length
    (FieldLengthFeature.java:88-91), not the exact token count."""
    from lucene_solr_ray.analysis.smallfloat import (
        BYTE4_DECODE_TABLE,
        int_to_byte4,
    )

    t = ltr_rescore(
        small_index, "merge",
        LinearModel({"len": 1.0}), [FieldLengthFeature("len")],
        k=10, window=10,
    ).to_pandas()
    lens = {0: 3, 1: 4, 3: 5, 5: 5}
    for _, row in t.iterrows():
        exact = lens[row["doc_id"]]
        assert row["score"] == BYTE4_DECODE_TABLE[int_to_byte4(exact)]


def test_rescore_empty_result(small_index):
    t = ltr_rescore(
        small_index, "zzzznothing",
        LinearModel({"orig": 1.0}), [OriginalScoreFeature("orig")],
        k=5,
    )
    assert len(t) == 0
    assert t.schema.field("rank").type == pa.int64()
