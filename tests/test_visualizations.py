"""Visualizer smoke: full fit_and_plot_all run (reference
`tests/test_visualizations.py` pattern) + method-surface parity with the
reference's 34 `plot_*` methods, separability commentary, and the rotating
3D video export."""
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


# The reference's plot-method surface (graph_visualizer.py, 34 plot_*
# methods); each must exist here with the same name.
REFERENCE_PLOT_METHODS = [
    "plot_edge_segments",
    "plot_nodes",
    "plot_edges",
    "plot_positive_and_negative_edges",
    "plot_positive_and_negative_adamic_adar_histogram",
    "plot_positive_and_negative_edges_adamic_adar",
    "plot_positive_and_negative_preferential_attachment_histogram",
    "plot_positive_and_negative_edges_preferential_attachment",
    "plot_positive_and_negative_jaccard_coefficient_histogram",
    "plot_positive_and_negative_edges_jaccard_coefficient",
    "plot_positive_and_negative_resource_allocation_index_histogram",
    "plot_positive_and_negative_edges_resource_allocation_index",
    "plot_node_types",
    "plot_node_ontologies",
    "plot_connected_components",
    "plot_node_degrees",
    "plot_node_triangles",
    "plot_node_squares",
    "plot_approximated_closeness_centrality",
    "plot_approximated_harmonic_centrality",
    "plot_edge_types",
    "plot_edge_weights",
    "plot_positive_and_negative_edges_euclidean_distance_histogram",
    "plot_positive_and_negative_edges_euclidean_distance",
    "plot_positive_and_negative_edges_cosine_similarity_histogram",
    "plot_positive_and_negative_edges_cosine_similarity",
    "plot_dot",
    "plot_node_degree_distribution",
    "plot_triangle_distribution",
    "plot_square_distribution",
    "plot_approximated_harmonic_centrality_distribution",
    "plot_approximated_closeness_centrality_distribution",
    "plot_edge_weight_distribution",
]


def test_plot_method_surface_parity():
    for name in REFERENCE_PLOT_METHODS:
        assert callable(getattr(GraphVisualizer, name, None)), name
    n_methods = sum(
        1 for name in dir(GraphVisualizer) if name.startswith("plot_")
    )
    assert n_methods >= 30, n_methods


def test_fit_and_plot_all(typed_weighted_karate, features):
    viz = GraphVisualizer(
        typed_weighted_karate, decomposition_method="PCA", random_state=0
    )
    import warnings

    with warnings.catch_warnings():
        # fit_and_plot_all must not leak into pyplot's open-figure manager.
        warnings.simplefilter("error", RuntimeWarning)
        figures = viz.fit_and_plot_all(features)
    assert len(figures) >= 30
    assert all(fig is not None for fig, _ in figures)
    # commentary covers node types, pos/neg edges and edge types on this graph
    comments = viz.get_separability_comments()
    assert len(comments) >= 2
    assert any("separable" in c for c in comments)
    import matplotlib.pyplot as plt

    assert len(plt.get_fignums()) == 0
    # closed figures must still render
    import io

    figures[0][0].savefig(io.BytesIO(), format="png")


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


def test_rotating_video(typed_weighted_karate, features, tmp_path):
    viz = GraphVisualizer(
        typed_weighted_karate, decomposition_method="PCA",
        n_components=3, random_state=0,
    )
    viz.fit_nodes(features)
    out = viz.plot_nodes_rotating_video(
        str(tmp_path / "nodes"), duration_seconds=0.5, fps=4
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0
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
    with pytest.raises(ValueError, match="fit_negative_and_positive"):
        viz.plot_dot()


def test_graph_analysis_methods(typed_weighted_karate):
    g = typed_weighted_karate
    comp, n = g.connected_components()
    assert n == 1
    assert g.is_connected()
    dot = g.to_dot()
    assert dot.startswith("graph {") and dot.count("--") == 78
    sub = g.filter_from_names(node_names_to_remove=[g.get_node_names()[0]])
    assert sub.number_of_nodes == 33


def test_node_structure_metrics(typed_weighted_karate):
    from embiggen_tpu.graph.metrics import (
        approximated_closeness_centrality,
        approximated_harmonic_centrality,
        square_counts,
        triangle_counts,
    )

    g = typed_weighted_karate
    tri = triangle_counts(g)
    assert tri.sum() / 3 == 45  # karate club has 45 triangles
    assert square_counts(g)[0] == 63  # brute-force verified
    cc = approximated_closeness_centrality(g)
    hc = approximated_harmonic_centrality(g)
    assert cc.shape == (34,) and (cc > 0).all()
    assert hc.shape == (34,) and (hc > 0).all()
    # hub (node 33) more central than a leaf
    assert cc[33] > cc[11]
