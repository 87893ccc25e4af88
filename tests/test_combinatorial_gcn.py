"""Combinatorial feature plumbing: node + node-type + edge + edge-type
features consumed simultaneously by the edge GCN, plus the uses-or-raises
guarantee — no feature kwarg is ever silently dropped (reference
`tests/test_combinatorial_gcn_edge_prediction.py`,
`abstract_classifier_model.py:693-709`)."""
import numpy as np
import pytest

from embiggen_tpu.models.gcn import (
    GCNEdgeLabelPrediction,
    GCNEdgePrediction,
    KipfGCNNodeLabelPrediction,
)


def _feat(rng, n, d):
    return rng.normal(size=(n, d)).astype(np.float32)


def test_combinatorial_gcn_edge_prediction(er_graph):
    rng = np.random.default_rng(0)
    g = er_graph
    model = GCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=3, batch_size=64,
        use_node_type_embedding=True, node_type_embedding_size=4,
        use_edge_type_embedding=True, edge_type_embedding_size=4,
        random_state=0,
    )
    node_features = _feat(rng, g.number_of_nodes, 6)
    node_type_features = _feat(rng, g.number_of_node_types, 5)
    edge_type_features = _feat(rng, g.number_of_edge_types, 3)
    edge_features = _feat(rng, g.number_of_directed_edges, 4)
    model.fit(
        g,
        node_features=node_features,
        node_type_features=node_type_features,
        edge_type_features=edge_type_features,
        edge_features=edge_features,
    )
    scores = model.predict_proba(g)
    assert scores.shape[0] == g.number_of_directed_edges
    assert np.isfinite(scores).all()
    # The input dimension actually grew by every feature class: static spec
    # includes node features (6) + type-averaged node-type features (5).
    assert model._spec.static.shape[1] == 11
    assert len(model._static_edge_feats) == 1
    assert len(model._edge_type_feat_tables) == 1

    # Pair-level scoring must accept arbitrary (src, dst), including
    # non-edges (unknown edge id -> zeros feature row / unknown type).
    s = model.predict_proba_from_edge_node_ids(
        np.array([0, 1, 2]), np.array([3, 4, 5])
    )
    assert s.shape == (3,) and np.isfinite(s).all()


def test_node_type_feature_shape_validation(er_graph):
    model = GCNEdgePrediction(units=[4], epochs=1, random_state=0)
    with pytest.raises(ValueError, match="rows"):
        model.fit(
            er_graph,
            node_type_features=np.zeros((er_graph.number_of_node_types + 2, 3)),
        )
    with pytest.raises(ValueError, match="NaN"):
        bad = np.full((er_graph.number_of_edge_types, 3), np.nan)
        model.fit(er_graph, edge_type_features=bad)


def test_unsupported_feature_kwargs_raise(er_graph, karate):
    # Node-label task: node types are the target -> all three rejected
    # (reference `node_label_prediction_model.py:305-316`).
    m = KipfGCNNodeLabelPrediction(units=[4], epochs=1)
    for kwarg in ("node_type_features", "edge_type_features", "edge_features"):
        with pytest.raises(ValueError, match="does not support"):
            m.fit(er_graph, **{kwarg: np.zeros((3, 2), np.float32)})

    # Edge-label task: edge types are the target -> edge_type_features
    # rejected (reference `edge_label_prediction_model.py:294-297`).
    m2 = GCNEdgeLabelPrediction(units=[4], epochs=1)
    with pytest.raises(ValueError, match="does not support"):
        m2.fit(er_graph, edge_type_features=np.zeros((3, 2), np.float32))

    # Sklearn-like adapters do not consume type features yet -> must raise,
    # not drop.
    from embiggen_tpu.models.registry import get_model_from_library

    m3 = get_model_from_library(
        "Random Forest Classifier", task_name="Edge Prediction"
    )()
    with pytest.raises(ValueError, match="does not support"):
        m3.fit(
            karate,
            node_features=np.zeros((34, 4), np.float32),
            edge_type_features=np.zeros((2, 2), np.float32),
        )


def test_typeless_graph_rejects_type_features():
    from embiggen_tpu.graph import Graph

    g = Graph.from_edge_arrays(
        np.array([0, 1, 2, 3]), np.array([1, 2, 3, 0]), directed=False
    )
    model = GCNEdgePrediction(units=[4], epochs=1)
    with pytest.raises(ValueError, match="no node types"):
        model.fit(g, node_type_features=np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError, match="no edge types"):
        model.fit(g, edge_type_features=np.zeros((2, 2), np.float32))


def test_combinatorial_edge_label_gcn(er_graph):
    rng = np.random.default_rng(1)
    g = er_graph
    model = GCNEdgeLabelPrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=3, batch_size=64,
        random_state=0,
    )
    model.fit(
        g,
        node_features=_feat(rng, g.number_of_nodes, 6),
        node_type_features=_feat(rng, g.number_of_node_types, 5),
        edge_features=_feat(rng, g.number_of_directed_edges, 4),
    )
    proba = model.predict_proba(g)
    assert proba.shape == (g.number_of_directed_edges, g.number_of_edge_types)
    assert np.isfinite(proba).all()


def test_edge_gcn_use_edge_metrics(er_graph):
    """`use_edge_metrics` appends the 4 on-device topological heuristics to
    the edge representation (reference `abstract_edge_gcn.py:78,319-341`),
    composing with every other feature class."""
    rng = np.random.default_rng(2)
    g = er_graph
    model = GCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=3, batch_size=64,
        use_edge_metrics=True,
        use_edge_type_embedding=True, edge_type_embedding_size=4,
        random_state=0,
    )
    model.fit(
        g,
        node_features=_feat(rng, g.number_of_nodes, 6),
        edge_features=_feat(rng, g.number_of_directed_edges, 4),
    )
    assert model.parameters()["use_edge_metrics"] is True
    scores = model.predict_proba(g)
    assert scores.shape[0] == g.number_of_directed_edges
    assert np.isfinite(scores).all()
    # Head input dim grew by exactly N_EDGE_METRICS vs the same model
    # without metrics.
    from embiggen_tpu.ops.edge_metrics import N_EDGE_METRICS

    base = GCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=1, batch_size=64,
        use_edge_type_embedding=True, edge_type_embedding_size=4,
        random_state=0,
    )
    base.fit(
        g,
        node_features=_feat(rng, g.number_of_nodes, 6),
        edge_features=_feat(rng, g.number_of_directed_edges, 4),
    )
    dim_with = model._params["head"][0]["w"].shape[0]
    dim_without = base._params["head"][0]["w"].shape[0]
    assert dim_with == dim_without + N_EDGE_METRICS
    # Non-edge pairs score too (metrics are defined for any pair).
    s = model.predict_proba_from_edge_node_ids(
        np.array([0, 5, 9]), np.array([7, 2, 11])
    )
    assert s.shape == (3,) and np.isfinite(s).all()


def test_edge_label_gcn_use_edge_metrics(er_graph):
    rng = np.random.default_rng(3)
    g = er_graph
    model = GCNEdgeLabelPrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=2, batch_size=64,
        use_edge_metrics=True, random_state=0,
    )
    model.fit(g, node_features=_feat(rng, g.number_of_nodes, 6))
    proba = model.predict_proba(g)
    assert proba.shape == (g.number_of_directed_edges, g.number_of_edge_types)
    assert np.isfinite(proba).all()


def test_sklearn_adapters_use_edge_metrics(er_graph):
    """Sklearn-like adapters append support-graph metric columns to X
    (reference `sklearn_like_edge_prediction_adapter.py:26,215-230`)."""
    from embiggen_tpu.models.edge_label_prediction.sklearn_like import (
        SklearnEdgeLabelPredictionAdapter,
    )
    from embiggen_tpu.models.edge_prediction.sklearn_like import (
        SklearnEdgePredictionAdapter,
    )
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(4)
    g = er_graph
    feats = _feat(rng, g.number_of_nodes, 8)

    m = SklearnEdgePredictionAdapter(
        model_instance=LogisticRegression(max_iter=200),
        edge_embedding_methods="Hadamard",
        use_edge_metrics=True,
        random_state=0,
    )
    m.fit(g, node_features=feats)
    assert m.parameters()["use_edge_metrics"] is True
    # 8 Hadamard dims + 4 metric columns reached the estimator.
    assert m._model_instance.n_features_in_ == 8 + 4
    p = m.predict_proba_from_edge_node_ids(
        np.array([0, 1, 2]), np.array([3, 4, 5])
    )
    assert p.shape == (3,) and np.isfinite(p).all()

    ml = SklearnEdgeLabelPredictionAdapter(
        model_instance=LogisticRegression(max_iter=200),
        edge_embedding_methods="Hadamard",
        use_edge_metrics=True,
        random_state=0,
    )
    ml.fit(g, node_features=feats)
    assert ml._model_instance.n_features_in_ == 8 + 4
    proba = ml.predict_proba(g)
    assert proba.shape == (g.number_of_directed_edges, g.number_of_edge_types)
    assert np.isfinite(proba).all()
