"""Visualizer smoke: full fit_and_plot_all run (reference
`tests/test_visualizations.py` pattern)."""
import dataclasses

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from embiggen_tpu.graph import karate_club
from embiggen_tpu.visualizations import GraphVisualizer


@pytest.fixture(scope="module")
def typed_weighted_karate():
    g = karate_club()
    rng = np.random.default_rng(0)
    labels = g.get_single_label_node_type_ids()
    etypes = (labels[g.sources] != labels[g.col_idx]).astype(np.int32)
    weights = np.ones(g.number_of_directed_edges, np.float32)
    return dataclasses.replace(g, edge_types=etypes, weights=weights)


@pytest.fixture(scope="module")
def features(typed_weighted_karate):
    from embiggen_tpu.models.embedders import DegreeSPINE

    return DegreeSPINE(embedding_size=10).fit_transform(typed_weighted_karate)


def test_fit_and_plot_all(typed_weighted_karate, features):
    viz = GraphVisualizer(
        typed_weighted_karate, decomposition_method="PCA", random_state=0
    )
    figures = viz.fit_and_plot_all(features)
    assert len(figures) == 9
    import matplotlib.pyplot as plt

    plt.close("all")


def test_tsne_and_3d(typed_weighted_karate, features):
    viz = GraphVisualizer(
        typed_weighted_karate, decomposition_method="TSNE",
        n_components=3, random_state=0,
    )
    viz.fit_nodes(features)
    fig, ax = viz.plot_node_degrees()
    assert viz._node_decomposition.shape == (34, 3)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_invalid_config(typed_weighted_karate):
    with pytest.raises(ValueError, match="decomposition"):
        GraphVisualizer(typed_weighted_karate, decomposition_method="UMAP2")
    with pytest.raises(ValueError, match="n_components"):
        GraphVisualizer(typed_weighted_karate, n_components=4)
    viz = GraphVisualizer(typed_weighted_karate)
    with pytest.raises(ValueError, match="fit_nodes"):
        viz.plot_nodes()


def test_graph_analysis_methods(typed_weighted_karate):
    g = typed_weighted_karate
    comp, n = g.connected_components()
    assert n == 1
    assert g.is_connected()
    dot = g.to_dot()
    assert dot.startswith("graph {") and dot.count("--") == 78
    sub = g.filter_from_names(node_names_to_remove=[g.get_node_names()[0]])
    assert sub.number_of_nodes == 33
