"""LINE + siamese family: training quality on karate club / typed graphs."""
import dataclasses

import numpy as np
import pytest

from embiggen_tpu.graph import karate_club
from embiggen_tpu.models.embedders import (
    FirstOrderLINE,
    SecondOrderLINE,
    StructuredEmbedding,
    TransE,
    TransH,
    Unstructured,
)


@pytest.fixture(scope="module")
def karate():
    return karate_club()


@pytest.fixture(scope="module")
def typed_karate(karate):
    labels = karate.get_single_label_node_type_ids()
    etypes = (labels[karate.sources] != labels[karate.col_idx]).astype(np.int32)
    return dataclasses.replace(karate, edge_types=etypes)


def _sep(emb, labels):
    emb = np.asarray(emb, float)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    sim = emb @ emb.T
    same = labels[:, None] == labels[None, :]
    od = ~np.eye(len(labels), dtype=bool)
    return sim[same & od].mean() - sim[~same].mean()


def _edge_auc(emb, graph, seed=0):
    """AUROC of dot-product scores: real edges vs random non-edges."""
    from embiggen_tpu.graph import sample_negative_graph
    from embiggen_tpu.ops.metrics import binary_auroc

    emb = np.asarray(emb, float)
    neg = sample_negative_graph(graph, graph.number_of_edges, random_state=seed)
    pos_s = (emb[graph.sources] * emb[graph.col_idx]).sum(1)
    neg_s = (emb[neg.sources] * emb[neg.col_idx]).sum(1)
    labels = np.concatenate([np.ones(len(pos_s)), np.zeros(len(neg_s))])
    return binary_auroc(labels, np.concatenate([pos_s, neg_s]))


def test_first_order_line(karate):
    model = FirstOrderLINE(
        embedding_size=16, epochs=600, batch_size=156,
        learning_rate=0.3, learning_rate_decay=0.995, random_state=0,
        early_stopping_patience=10**6,
        learning_rate_plateau_patience=10**6,
    )
    result = model.fit_transform(karate)
    emb = result.get_node_embedding_from_index(0)
    auc = _edge_auc(emb, karate)
    assert auc > 0.8, f"LINE1 link AUROC too low: {auc}"


def test_second_order_line(karate):
    model = SecondOrderLINE(
        embedding_size=16, epochs=600, batch_size=156,
        learning_rate=0.3, learning_rate_decay=0.995, random_state=0,
        early_stopping_patience=10**6,
        learning_rate_plateau_patience=10**6,
    )
    result = model.fit_transform(karate)
    assert len(result.node_embeddings) == 2
    labels = karate.get_single_label_node_type_ids()
    sep = _sep(result.node_embeddings[0], labels)
    assert np.isfinite(np.asarray(result.node_embeddings[0])).all()


def test_unstructured(karate):
    model = Unstructured(
        embedding_size=16, epochs=200, batch_size=156,
        learning_rate=0.05, learning_rate_decay=0.995, random_state=0,
        early_stopping_patience=10**6,
        learning_rate_plateau_patience=10**6,
    )
    result = model.fit_transform(karate)
    emb = np.asarray(result.get_node_embedding_from_index(0))
    # margin loss pulls connected nodes together: distance-based link AUROC
    from embiggen_tpu.graph import sample_negative_graph
    from embiggen_tpu.ops.metrics import binary_auroc

    neg = sample_negative_graph(karate, karate.number_of_edges, random_state=3)
    pos_d = -((emb[karate.sources] - emb[karate.col_idx]) ** 2).sum(1)
    neg_d = -((emb[neg.sources] - emb[neg.col_idx]) ** 2).sum(1)
    labels = np.concatenate([np.ones(len(pos_d)), np.zeros(len(neg_d))])
    auc = binary_auroc(labels, np.concatenate([pos_d, neg_d]))
    assert auc > 0.75, f"Unstructured distance AUROC too low: {auc}"


def test_transe(typed_karate):
    model = TransE(
        embedding_size=16, epochs=200, batch_size=156,
        learning_rate=0.05, learning_rate_decay=0.995, random_state=0,
        early_stopping_patience=10**6,
        learning_rate_plateau_patience=10**6,
    )
    result = model.fit_transform(typed_karate)
    assert len(result.edge_type_embeddings) == 1
    assert result.edge_type_embeddings[0].shape == (2, 16)
    assert np.isfinite(np.asarray(result.node_embeddings[0])).all()


def test_transe_requires_edge_types(karate):
    model = TransE.into_smoke_test(random_state=0)
    with pytest.raises(ValueError, match="edge types"):
        model.fit_transform(karate)


def test_transh_and_structured(typed_karate):
    for cls in (TransH, StructuredEmbedding):
        model = cls(
            embedding_size=8, epochs=10, batch_size=64,
            learning_rate=0.05, random_state=0,
        )
        result = model.fit_transform(typed_karate)
        emb = np.asarray(result.get_node_embedding_from_index(0))
        assert emb.shape == (34, 8)
        assert np.isfinite(emb).all()


def test_registry_contains_family():
    from embiggen_tpu.models.registry import MODELS_LIBRARY

    embedders = MODELS_LIBRARY["Node Embedding"]
    for name in (
        "First-order LINE", "Second-order LINE", "TransE", "TransH",
        "Unstructured", "Structured Embedding",
    ):
        assert name in embedders, name
