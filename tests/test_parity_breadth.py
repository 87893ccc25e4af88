"""Breadth-parity tests: DAG-based HOPE metrics and the full 13-wrapper
sklearn surface (reference `edge_prediction_sklearn/*.py`,
`hope.py:33-46`)."""
import numpy as np
import pytest

from embiggen_tpu.graph import Graph, karate_club
from embiggen_tpu.models.registry import MODELS_LIBRARY


def _toy_dag():
    # 0 is the root; arcs child -> parent.
    src = np.array([1, 2, 3, 4, 5, 6])
    dst = np.array([0, 0, 1, 1, 2, 2])
    return Graph.from_edge_arrays(
        src, dst, n_nodes=7, directed=True,
        node_names=[f"t{i}" for i in range(7)], name="toy_dag",
    )


def test_hope_dag_similarity_matrices():
    from embiggen_tpu.models.embedders.spectral import (
        _dag_similarity_matrix,
    )

    dag = _toy_dag()
    size = _dag_similarity_matrix(dag, "Ancestors size").toarray()
    # ancestors(3) = {3,1,0}; ancestors(4) = {4,1,0} -> intersection {1,0}
    assert size[3, 4] == 2
    # cross-branch pairs share only the root
    assert size[3, 5] == 1
    assert size[3, 3] == 3

    jac = _dag_similarity_matrix(dag, "Ancestors Jaccard").toarray()
    assert jac[3, 3] == pytest.approx(1.0)
    assert jac[3, 4] == pytest.approx(2 / 4)
    assert jac[3, 5] == pytest.approx(1 / 5)

    res = _dag_similarity_matrix(dag, "Resnik").toarray()
    # siblings under node 1 share MICA node 1; cross-branch share the root
    # whose information content is 0.
    assert res[3, 4] > res[3, 5]
    assert res[3, 5] == pytest.approx(0.0)
    np.testing.assert_allclose(res, res.T)


@pytest.mark.parametrize(
    "metric", ["Ancestors Jaccard", "Ancestors size", "Resnik"]
)
def test_hope_dag_metrics_end_to_end(metric):
    from embiggen_tpu.models.embedders import HOPE

    dag = _toy_dag()
    result = HOPE(
        embedding_size=3, metric=metric, root_node_name="t0"
    ).fit_transform(dag)
    emb = np.asarray(result.node_embeddings[0])
    assert emb.shape == (7, 3)
    assert np.isfinite(emb).all()


def test_hope_unknown_root_raises():
    from embiggen_tpu.models.embedders import HOPE

    with pytest.raises(ValueError, match="Root node"):
        HOPE(
            embedding_size=3, metric="Resnik", root_node_name="nope"
        ).fit_transform(_toy_dag())


NEW_SKLEARN_WRAPPERS = [
    "Hist Gradient Boosting Classifier",
    "Linear Support Vector Classifier",
    "Nu Support Vector Classifier",
    "Radius Neighbour Classifier",
    "Logistic Regression Cross Validator",
    "Ridge Classifier",
    "Ridge Classifier Cross Validator",
]


@pytest.mark.parametrize("name", NEW_SKLEARN_WRAPPERS)
def test_new_sklearn_wrappers_registered_all_tasks(name):
    for task in (
        "Edge Prediction",
        "Node Label Prediction",
        "Edge Label Prediction",
    ):
        assert name in MODELS_LIBRARY[task], (task, name)


@pytest.mark.parametrize(
    "name",
    ["Linear Support Vector Classifier", "Ridge Classifier"],
)
def test_decision_function_fallback_edge_prediction(name):
    """Wrappers without predict_proba still yield probabilities via the
    decision-margin fallback."""
    from embiggen_tpu.models.embedders import DegreeSPINE

    g = karate_club()
    emb = DegreeSPINE(embedding_size=8).fit_transform(g)
    cls = MODELS_LIBRARY["Edge Prediction"][name]["scikit-learn"]
    model = cls(random_state=0)
    model.fit(g, node_features=emb)
    proba = model.predict_proba(g)
    assert proba.shape[0] == g.number_of_directed_edges
    assert np.all((proba >= 0) & (proba <= 1))


def test_predict_proba_compat_multiclass_margin():
    from embiggen_tpu.utils.sklearn_compat import predict_proba_compat

    class FakeMulti:
        def decision_function(self, x):
            return np.tile(np.array([[1.0, 0.0, -1.0]]), (len(x), 1))

    p = predict_proba_compat(FakeMulti(), np.zeros((4, 2)))
    assert p.shape == (4, 3)
    np.testing.assert_allclose(p.sum(axis=1), 1.0)
    assert (p[:, 0] > p[:, 1]).all() and (p[:, 1] > p[:, 2]).all()
