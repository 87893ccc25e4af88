"""GCN models: node-label, edge prediction, edge-label — end-to-end quality."""
import numpy as np
import pytest

from embiggen_tpu.graph import (
    connected_holdout,
    karate_club,
    sample_negative_graph,
)
from embiggen_tpu.models.gcn import (
    GNNNodeLabelPrediction,
    GraphSAGENodeLabelPrediction,
    KipfGCNEdgeLabelPrediction,
    KipfGCNEdgePrediction,
    KipfGCNNodeLabelPrediction,
)
from embiggen_tpu.ops.metrics import binary_auroc


@pytest.fixture(scope="module")
def karate():
    return karate_club()


def test_kipf_gcn_node_label(karate):
    model = KipfGCNNodeLabelPrediction(
        units=[16], head_units=[16], epochs=100, learning_rate=0.05,
        use_node_embedding=True, node_embedding_size=16, dropout_rate=0.2,
        random_state=0,
    )
    model.fit(karate)
    proba = model.predict_proba(karate)
    assert proba.shape == (34, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-4)
    preds = model.predict(karate)
    labels = karate.get_single_label_node_type_ids()
    acc = (preds == labels).mean()
    assert acc > 0.85, f"train accuracy too low: {acc}"


def test_graphsage_node_label(karate):
    model = GraphSAGENodeLabelPrediction(
        units=[16], head_units=[16], epochs=60, learning_rate=0.05,
        use_node_embedding=True, node_embedding_size=16, dropout_rate=0.2,
        random_state=0,
    )
    model.fit(karate)
    acc = (model.predict(karate) == karate.get_single_label_node_type_ids()).mean()
    assert acc > 0.8


def test_gnn_node_label(karate):
    model = GNNNodeLabelPrediction(
        head_units=[16], epochs=120, learning_rate=0.05,
        node_embedding_size=16, dropout_rate=0.0, random_state=0,
    )
    model.fit(karate)
    acc = (model.predict(karate) == karate.get_single_label_node_type_ids()).mean()
    assert acc > 0.8


def test_gcn_edge_prediction(karate):
    train, test = connected_holdout(karate, train_size=0.8, random_state=0)
    model = KipfGCNEdgePrediction(
        units=[16], tower_units=[16], head_units=[8],
        epochs=400, learning_rate=0.05, batch_size=64,
        use_node_embedding=True, node_embedding_size=16, dropout_rate=0.1,
        early_stopping_patience=50, random_state=0,
    )
    model.fit(train, support=train)
    neg = sample_negative_graph(karate, test.number_of_edges, random_state=1)
    pos_scores = model.predict_proba(test)
    neg_scores = model.predict_proba(neg)
    labels = np.concatenate(
        [np.ones(len(pos_scores)), np.zeros(len(neg_scores))]
    )
    auroc = binary_auroc(labels, np.concatenate([pos_scores, neg_scores]))
    assert auroc > 0.7, f"edge prediction AUROC too low: {auroc}"


def test_gcn_edge_label(karate):
    # Synthesize edge types: intra-community edges type 0, inter type 1.
    import dataclasses

    labels = karate.get_single_label_node_type_ids()
    etypes = (
        labels[karate.sources] != labels[karate.col_idx]
    ).astype(np.int32)
    g = dataclasses.replace(karate, edge_types=etypes)
    model = KipfGCNEdgeLabelPrediction(
        units=[16], tower_units=[16], head_units=[8],
        epochs=120, learning_rate=0.02, batch_size=256,
        use_node_embedding=True, node_embedding_size=16, dropout_rate=0.1,
        random_state=0,
    )
    model.fit(g)
    proba = model.predict_proba(g)
    assert proba.shape == (g.number_of_directed_edges, 2)
    acc = (proba.argmax(1) == etypes).mean()
    assert acc > 0.8, f"edge-label accuracy too low: {acc}"


def test_gcn_smoke_params(karate):
    model = KipfGCNNodeLabelPrediction.into_smoke_test(random_state=1)
    model.fit(karate)
    assert model.predict_proba(karate).shape == (34, 2)


def test_registry_tasks():
    from embiggen_tpu.models.registry import MODELS_LIBRARY

    assert "Kipf GCN" in MODELS_LIBRARY["Node Label Prediction"]
    assert "Kipf GCN" in MODELS_LIBRARY["Edge Prediction"]
    assert "GraphSAGE" in MODELS_LIBRARY["Edge Label Prediction"]
    assert "GNN" in MODELS_LIBRARY["Edge Prediction"]


def test_unfitted_raises(karate):
    model = KipfGCNNodeLabelPrediction.into_smoke_test(random_state=1)
    with pytest.raises(ValueError, match="fitted"):
        model.predict(karate)


def test_kernel_cache_shared_across_models(karate):
    """VERDICT r4 item 3: two models evaluated on the same train split
    build (and share) the relaid-out kernel ONCE — the cache is keyed on
    graph CONTENT, so a distinct-but-identical graph object also hits."""
    import dataclasses

    from embiggen_tpu.models.gcn import core as gcn_core
    from embiggen_tpu.models.gcn.edge import KipfGCNEdgePrediction
    from embiggen_tpu.models.gcn.node_label import KipfGCNNodeLabelPrediction

    gcn_core._KERNEL_CACHE.clear()
    m1 = KipfGCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=1, batch_size=32,
        random_state=0,
    )
    m1.fit(karate)
    assert len(gcn_core._KERNEL_CACHE) == 1
    (k1,) = gcn_core._KERNEL_CACHE.values()
    m2 = KipfGCNNodeLabelPrediction(
        units=[8], head_units=[8], epochs=1, random_state=0
    )
    m2.fit(karate)
    # Same content + same kernel name (Symmetric Normalized Laplacian):
    # the second model reuses the first model's PaddedKernel object.
    assert len(gcn_core._KERNEL_CACHE) == 1
    assert next(iter(gcn_core._KERNEL_CACHE.values())) is k1
    # A fresh graph object with identical arcs also hits (content key).
    clone = dataclasses.replace(karate)
    m3 = KipfGCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=1, batch_size=32,
        random_state=0,
    )
    m3.fit(clone)
    assert len(gcn_core._KERNEL_CACHE) == 1


def test_beheaded_edge_model(karate):
    """A fitted edge GCN works as an edge-feature extractor (reference
    `into_beheaded_edge_model`, `abstract_edge_gcn.py:908-927`): the
    pre-head edge representation is exposed via transform_edges /
    transform_edges_from_edge_node_ids and feeds a sklearn estimator."""
    from embiggen_tpu.graph.sampling import sample_negative_graph
    from embiggen_tpu.models.gcn import KipfGCNEdgePrediction
    from sklearn.linear_model import LogisticRegression

    g = karate
    model = KipfGCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8], epochs=5, batch_size=64,
        random_state=0,
    )
    model.fit(g)
    res = model.transform_edges(g)
    reps = res.edge_embeddings[0]
    expected_dim = model._params["head"][0]["w"].shape[0]
    assert reps.shape == (g.number_of_directed_edges, expected_dim)
    assert np.isfinite(np.asarray(reps)).all()

    # Arbitrary pairs (incl. non-edges) embed too.
    pair_reps = model.transform_edges_from_edge_node_ids(
        np.array([0, 1, 2]), np.array([33, 32, 30])
    )
    assert pair_reps.shape == (3, expected_dim)

    # Extracted features train a downstream sklearn classifier.
    neg = sample_negative_graph(
        g, number_of_negative_samples=g.number_of_edges, random_state=0
    )
    x_pos = np.asarray(reps)
    x_neg = model.transform_edges_from_edge_node_ids(
        neg.sources, neg.col_idx
    )
    x = np.concatenate([x_pos, x_neg])
    y = np.concatenate([np.ones(len(x_pos)), np.zeros(len(x_neg))])
    clf = LogisticRegression(max_iter=300).fit(x, y)
    auroc = binary_auroc(y, clf.predict_proba(x)[:, 1])
    assert auroc > 0.6


def test_multigraph_singleton_kernel_policy():
    """Multigraph policy drop/warn/raise + duplicate-arc dedup + singleton
    warning in the propagation kernels (reference
    `abstract_gcn.py:97-118,228`)."""
    import warnings

    from embiggen_tpu.graph import Graph
    from embiggen_tpu.graph.laplacians import (
        kernel_coo,
        validate_convolution_graph,
    )
    from embiggen_tpu.models.gcn import KipfGCNEdgePrediction

    # Parallel arc 0->1 (x2) plus a triangle; node 4 is a singleton.
    src = np.array([0, 0, 0, 1, 1, 2, 2, 3])
    dst = np.array([1, 1, 2, 0, 2, 0, 1, 0])
    g = Graph.from_edge_arrays(
        src, dst, n_nodes=5, directed=True, deduplicate=False,
        weights=np.ones(len(src), np.float32),
    )
    assert g.is_multigraph()

    # Dedup: the parallel arc contributes ONCE to the kernel.
    rows, cols, vals = kernel_coo(g, "Weights")
    assert len(rows) == 7
    pair_count = np.sum((rows == 0) & (cols == 1))
    assert pair_count == 1

    with pytest.warns(UserWarning, match="deduplicated|singleton"):
        validate_convolution_graph(g, "warn")
    with pytest.raises(ValueError, match="multigraph"):
        validate_convolution_graph(g, "raise")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # "drop" stays silent about the multigraph; the singleton still
        # warns, so filter it specifically.
        warnings.filterwarnings("ignore", message=".*singleton.*")
        validate_convolution_graph(g, "drop")
    with pytest.raises(ValueError, match="handling_multi_graph"):
        validate_convolution_graph(g, "explode")

    # The policy rides the model param into build_kernels.
    model = KipfGCNEdgePrediction(
        units=[4], tower_units=[4], head_units=[4], epochs=1, batch_size=16,
        handling_multi_graph="raise", random_state=0,
    )
    assert model.parameters()["handling_multi_graph"] == "raise"
    # fit wraps in the enriched RuntimeError (classifier.py:308).
    with pytest.raises(RuntimeError, match="multigraph"):
        model.fit(g)

    # warn policy trains through (parallel arcs deduplicated).
    model2 = KipfGCNEdgePrediction(
        units=[4], tower_units=[4], head_units=[4], epochs=1, batch_size=16,
        handling_multi_graph="warn", random_state=0,
    )
    with pytest.warns(UserWarning):
        model2.fit(g)
    assert np.isfinite(model2.predict_proba(g)).all()
