"""End-to-end pipelines: embed_graph + the three evaluation facades, matching
the reference's registry-driven sweep test pattern (SURVEY.md §4)."""
import dataclasses

import numpy as np
import pytest

from embiggen_tpu import (
    edge_label_prediction_evaluation,
    edge_prediction_evaluation,
    embed_graph,
    node_label_prediction_evaluation,
)
from embiggen_tpu.graph import karate_club
from embiggen_tpu.models.edge_prediction import PerceptronEdgePrediction


@pytest.fixture(scope="module")
def karate():
    return karate_club()


@pytest.fixture(scope="module")
def typed_karate(karate):
    labels = karate.get_single_label_node_type_ids()
    etypes = (labels[karate.sources] != labels[karate.col_idx]).astype(np.int32)
    return dataclasses.replace(karate, edge_types=etypes)


def test_embed_graph_by_name(karate):
    result = embed_graph(
        karate, "Node2Vec SkipGram", smoke_test=True, random_state=4
    )
    assert result.get_node_embedding_from_index(0).shape == (34, 5)


def test_embed_graph_dataset_name():
    result = embed_graph(
        "KarateClub", "First-order LINE", smoke_test=True, random_state=4
    )
    assert result.get_node_embedding_from_index(0).shape == (34, 5)


def test_edge_prediction_evaluation_perceptron(karate):
    df = edge_prediction_evaluation(
        holdouts_number=2,
        models=PerceptronEdgePrediction(
            edge_features=["Degree", "AdamicAdar", "JaccardCoefficient"],
            number_of_epochs=50,
            random_state=0,
        ),
        graphs=karate,
        evaluation_schema="Connected Monte Carlo",
        random_state=3,
    )
    # rows = holdouts × {train, test} × unbalances × models
    assert len(df) == 2 * 2 * 1 * 1
    assert set(df["evaluation_mode"]) == {"train", "test"}
    assert (df["auroc"] > 0.5).all()
    assert {"auprc", "f1_score", "holdout_number", "fit_time"} <= set(df.columns)


def test_edge_prediction_evaluation_sklearn_with_embedding_features(karate):
    from embiggen_tpu.models.embedders import SkipGram

    df = edge_prediction_evaluation(
        holdouts_number=1,
        models="Decision Tree Classifier",
        graphs=karate,
        node_features=SkipGram.into_smoke_test(random_state=5),
        evaluation_schema="Monte Carlo",
        random_state=3,
    )
    assert len(df) == 2
    assert df["library_name"].iloc[0] == "scikit-learn"


def test_node_label_prediction_evaluation(karate):
    df = node_label_prediction_evaluation(
        holdouts_number=2,
        models="Random Forest Classifier",
        graphs=karate,
        node_features=[np.eye(34, dtype=np.float32)],
        evaluation_schema="Stratified Monte Carlo",
        random_state=3,
    )
    assert len(df) == 4
    assert (df["accuracy"] >= 0).all()


def test_edge_label_prediction_evaluation(typed_karate):
    df = edge_label_prediction_evaluation(
        holdouts_number=1,
        models="Decision Tree Classifier",
        graphs=typed_karate,
        node_features=[np.eye(34, dtype=np.float32)],
        evaluation_schema="Stratified Monte Carlo",
        random_state=3,
    )
    assert len(df) == 2
    assert {"train", "test"} == set(df["evaluation_mode"])


def test_gcn_in_pipeline_smoke(karate):
    df = edge_prediction_evaluation(
        holdouts_number=1,
        models="Kipf GCN",
        graphs=karate,
        smoke_test=True,
        evaluation_schema="Monte Carlo",
        random_state=3,
    )
    assert len(df) == 2


def test_deferred_embedding_feature_refit_per_holdout(karate):
    """Stochastic embedding features must be re-fit on the train graph of
    each holdout (holdout-bias avoidance, reference
    abstract_classifier_model.py:693-709)."""
    from embiggen_tpu.models.embedders import SkipGram

    model = SkipGram.into_smoke_test(random_state=5)
    from embiggen_tpu.models.classifier import AbstractClassifierModel

    normalized = AbstractClassifierModel(
        random_state=1
    ).normalize_node_features(
        karate, [model], skip_evaluation_biased_feature=True
    )
    # deferred: still a model, not an ndarray
    assert normalized[0] is model
    fitted = AbstractClassifierModel.fit_deferred_features(normalized, karate)
    assert isinstance(fitted[0], np.ndarray)


def test_perceptron_bipartite_clique(karate):
    model = PerceptronEdgePrediction(
        edge_features=["Degree"], number_of_epochs=10, random_state=0
    )
    model.fit(karate)
    bi = model.predict_proba_bipartite_graph_from_edge_node_ids(
        np.array([0, 1, 2]), np.array([30, 31, 32, 33])
    )
    assert bi.shape == (3, 4)
    cl = model.predict_proba_clique_graph_from_node_ids(np.arange(5))
    assert cl.shape == (5, 5)
    assert ((bi >= 0) & (bi <= 1)).all()


def test_subgraph_of_interest_evaluation(er_graph):
    """Edge-prediction evaluation restricted to a subgraph of interest (one
    node-type pair): positives come only from the subgraph's edges,
    negatives from the subgraph's node/degree distribution — reference
    `abstract_classifier_model.py:2135,2405-2561`,
    `edge_prediction_model.py:138-141`."""
    from embiggen_tpu.graph.sampling import sample_negative_graph
    from embiggen_tpu.pipelines.evaluation import _align_subgraph

    g = er_graph
    nt = g.get_single_label_node_type_ids()
    src_t, dst_t = nt[g.sources], nt[g.col_idx]
    mask = ((src_t == 0) & (dst_t == 1)) | ((src_t == 1) & (dst_t == 0))
    sub = g.filter_edges(mask, name="type0-type1")
    assert 0 < sub.number_of_directed_edges < g.number_of_directed_edges

    df = edge_prediction_evaluation(
        holdouts_number=2,
        models=PerceptronEdgePrediction(
            edge_features=["Degree", "AdamicAdar"],
            number_of_epochs=30,
            random_state=0,
        ),
        graphs=g,
        evaluation_schema="Connected Monte Carlo",
        random_state=3,
        subgraph_of_interest=sub,
    )
    assert len(df) == 2 * 2
    # train + test positives of each holdout == the subgraph arcs surviving
    # the split (never more than the subgraph itself).
    for _, hold in df.groupby("holdout_number"):
        total_pos = hold["size_of_positive_set"].sum()
        assert 0 < total_pos <= sub.number_of_directed_edges
    assert np.isfinite(df["auprc"]).all()

    # The evaluation negatives ride the subgraph's degree distribution:
    # every sampled endpoint is active in the subgraph.
    neg = sample_negative_graph(
        sub, number_of_negative_samples=64, random_state=7, support=g
    )
    active = np.nonzero(np.asarray(sub.degrees) > 0)[0]
    assert np.isin(neg.sources, active).all()
    assert np.isin(neg.col_idx, active).all()
    # ... and avoid the FULL graph's edges.
    assert not g.has_edges_fast(neg.sources, neg.col_idx).any()

    # A subgraph with its own node dictionary is aligned by names.
    keep_names = [
        str(n) for n in np.asarray(g.get_node_names())[np.isin(nt, (0, 1))]
    ]
    sub_remapped = g.filter_from_names(node_names_to_keep=keep_names)
    aligned = _align_subgraph(g, sub_remapped)
    assert aligned.number_of_nodes == g.number_of_nodes
    assert aligned.number_of_directed_edges == sub_remapped.number_of_directed_edges
    # Every aligned arc is a real arc of the full graph.
    assert g.has_edges_fast(aligned.sources, aligned.col_idx).all()


def test_subgraph_of_interest_empty_raises(er_graph):
    g = er_graph
    # A subgraph whose edges never survive the split restriction: empty.
    sub = g.filter_edges(np.zeros(g.number_of_directed_edges, bool))
    with pytest.raises(ValueError, match="no edges left"):
        edge_prediction_evaluation(
            holdouts_number=1,
            models=PerceptronEdgePrediction(
                edge_features=["Degree"], number_of_epochs=5, random_state=0
            ),
            graphs=g,
            random_state=3,
            subgraph_of_interest=sub,
        )


def test_subgraph_use_as_support_and_model_level_evaluate(er_graph):
    """`use_subgraph_as_support=True` fits with the restricted train as its
    own support (reference `use_subgraph_as_support`,
    `abstract_classifier_model.py:2271-2284`); the model-level
    `evaluate()` verb forwards subgraph kwargs too."""
    g = er_graph
    nt = g.get_single_label_node_type_ids()
    mask = ((nt[g.sources] == 0) & (nt[g.col_idx] == 1)) | (
        (nt[g.sources] == 1) & (nt[g.col_idx] == 0)
    )
    sub = g.filter_edges(mask, name="type01")

    model = PerceptronEdgePrediction(
        edge_features=["Degree"], number_of_epochs=20, random_state=0
    )
    df = model.evaluate(
        g,
        evaluation_schema="Connected Monte Carlo",
        holdouts_number=1,
        random_state=3,
        subgraph_of_interest=sub,
        use_subgraph_as_support=True,
    )
    assert len(df) == 2
    assert (df["size_of_positive_set"] <= sub.number_of_directed_edges).all()
    assert np.isfinite(df["auprc"]).all()
