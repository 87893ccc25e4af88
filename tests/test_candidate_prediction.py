"""Candidate-set prediction surface: the 16 bipartite/clique helpers of the
reference (`edge_prediction_model.py:457-1875`) with bounded-memory chunked
inference."""
import numpy as np
import pytest

from embiggen_tpu.models.edge_prediction import (
    AbstractEdgePredictionModel,
    PerceptronEdgePrediction,
)

HELPER_NAMES = [
    f"{verb}_{shape}_graph_from_{source}"
    for verb in ("predict", "predict_proba")
    for shape, sources in (
        ("bipartite", ("edge_node_ids", "edge_node_names",
                       "edge_node_prefixes", "edge_node_types")),
        ("clique", ("node_ids", "node_names", "node_prefixes",
                    "node_type_names")),
    )
    for source in sources
]


def test_helper_surface_parity():
    """All 16 reference helper names exist on the abstract task model."""
    assert len(HELPER_NAMES) == 16
    for name in HELPER_NAMES:
        assert hasattr(AbstractEdgePredictionModel, name), name


@pytest.fixture(scope="module")
def fitted(request):
    er_graph = request.getfixturevalue("er_graph")
    model = PerceptronEdgePrediction(
        number_of_epochs=5, random_state=0
    )
    model.fit(er_graph)
    return er_graph, model


def test_bipartite_matrix_and_dataframe(fitted):
    g, model = fitted
    src = np.array([0, 1, 2])
    dst = np.array([3, 4, 5, 6])
    mat = model.predict_proba_bipartite_graph_from_edge_node_ids(src, dst)
    assert mat.shape == (3, 4) and np.isfinite(mat).all()
    # consistency with direct pair scoring
    direct = model.predict_proba_from_edge_node_ids(
        np.repeat(src, 4).astype(np.int32), np.tile(dst, 3).astype(np.int32)
    ).reshape(3, 4)
    np.testing.assert_allclose(mat, direct, rtol=1e-5)
    df = model.predict_proba_bipartite_graph_from_edge_node_ids(
        src, dst, graph=g, return_predictions_dataframe=True
    )
    assert list(df.index) == list(g.get_node_names()[src])
    hard = model.predict_bipartite_graph_from_edge_node_ids(src, dst)
    assert hard.dtype == bool
    np.testing.assert_array_equal(hard, mat > 0.5)


def test_chunked_product_crosses_chunk_boundary(fitted):
    """A product larger than the chunk size must tile correctly, including
    the padded tail chunk."""
    g, model = fitted
    old = AbstractEdgePredictionModel.PREDICTION_CHUNK_SIZE
    try:
        AbstractEdgePredictionModel.PREDICTION_CHUNK_SIZE = 64
        src = np.arange(11)
        dst = np.arange(23)
        mat = model.predict_proba_bipartite_graph_from_edge_node_ids(src, dst)
    finally:
        AbstractEdgePredictionModel.PREDICTION_CHUNK_SIZE = old
    full = model.predict_proba_bipartite_graph_from_edge_node_ids(src, dst)
    np.testing.assert_allclose(mat, full, rtol=1e-5)


def test_prefix_and_type_selectors(fitted):
    g, model = fitted
    ids = g.get_node_ids_from_prefixes(["node_1"])
    assert len(ids) > 0
    assert all(str(n).startswith("node_1") for n in g.get_node_names()[ids])
    t = g.get_node_type_names()[0]
    tids = g.get_node_ids_from_node_type_names([t])
    assert len(tids) > 0
    mat = model.predict_proba_clique_graph_from_node_type_names(g, [t])
    assert mat.shape == (len(tids), len(tids))
    with pytest.raises(ValueError, match="Unknown node type"):
        g.get_node_ids_from_node_type_names(["nope"])


def test_clique_variants_consistent(fitted):
    g, model = fitted
    names = list(g.get_node_names()[:6])
    by_ids = model.predict_proba_clique_graph_from_node_ids(np.arange(6))
    by_names = model.predict_proba_clique_graph_from_node_names(g, names)
    np.testing.assert_allclose(by_ids, by_names, rtol=1e-6)
    hard = model.predict_clique_graph_from_node_names(g, names)
    np.testing.assert_array_equal(hard, by_names > 0.5)
