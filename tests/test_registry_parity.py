"""Registry completeness vs the reference's model catalog, plus the
graceful-degradation stub machinery (reference `model_stub.py:93-243`,
`tests/test_stub_model.py`, `non_existent_model.py:1-13`)."""
import pytest

import embiggen_tpu  # noqa: F401 — triggers registration
from embiggen_tpu.models.registry import (
    MODELS_LIBRARY,
    get_model_from_library,
    get_models_dataframe,
)

# Every model_name() the reference registers (grep over /root/reference:
# `def model_name` return values, 85 unique names).
REFERENCE_MODEL_NAMES = [
    "AutoSF", "BoostNE", "BoxE", "CatBoost", "ComplEx", "ConvE", "CrossE",
    "Decision Tree Classifier", "DeepWalk CBOW", "DeepWalk GloVe",
    "DeepWalk SkipGram", "Degree-based SPINE", "Degree-based WINE",
    "DistMA", "DistMult", "ERMLP", "ERMLPE", "Everything Bagel GCN",
    "Extra Trees Classifier", "First-order LINE", "GLEE", "GNN", "GraRep",
    "Gradient Boosting Classifier", "Graph Convolution", "GraphSAGE",
    "HOPE", "Hist Gradient Boosting Classifier", "HolE", "HyperSketching",
    "K-Neighbour Classifier", "Kipf GCN", "LLeaves", "Laplacian Eigenmaps",
    "LightGBM", "Linear Support Vector Classifier",
    "Logistic Regression Cross Validator", "MLP Classifier",
    "MLP Regression", "MNMF", "NMFADMM", "NNSED", "NetMF",
    "Node-label-based SPINE", "Node-label-based WINE", "Node2Vec",
    "Node2Vec CBOW", "Node2Vec GloVe", "Node2Vec SkipGram", "NodePiece",
    "NodeSketch", "Non Existent Model", "Nu Support Vector Classifier",
    "PairRE", "Perceptron", "ProjE", "QuatE", "RESCAL", "RUBICONE",
    "RUINE", "Radius Neighbour Classifier", "RandNE",
    "Random Forest Classifier", "Ridge Classifier",
    "Ridge Classifier Cross Validator", "Role2Vec", "RotatE",
    "Score-based SPINE", "Score-based WINE", "Second-order LINE",
    "SocioDim", "Structured Embedding", "TorusE", "TransD", "TransE",
    "TransF", "TransH", "TransR", "TuckER", "Unstructured",
    "Walklets CBOW", "Walklets GloVe", "Walklets SkipGram",
    "WeightedSPINE", "XGBoost",
]


def test_every_reference_model_name_is_registered():
    registered = {
        name for models in MODELS_LIBRARY.values() for name in models
    }
    missing = sorted(set(REFERENCE_MODEL_NAMES) - registered)
    assert not missing, f"missing reference models: {missing}"


def test_models_dataframe_covers_reference():
    df = get_models_dataframe()
    names = set(df["model_name"])
    assert set(REFERENCE_MODEL_NAMES) <= names


@pytest.mark.parametrize("name", ["XGBoost", "LightGBM", "CatBoost", "LLeaves"])
@pytest.mark.parametrize(
    "task", ["Edge Prediction", "Edge Label Prediction", "Node Label Prediction"]
)
def test_stub_models_raise_module_not_found(name, task):
    cls = get_model_from_library(name, task_name=task)
    assert cls.is_stub()
    with pytest.raises(ModuleNotFoundError, match=name.lower()):
        cls()


def test_non_existent_model_stub():
    cls = get_model_from_library("Non Existent Model")
    with pytest.raises(ModuleNotFoundError) as err:
        cls()
    # No alternative library implements it.
    assert "no other implementation" in str(err.value)


def test_stub_error_names_alternative_libraries():
    # Give XGBoost a fake sibling implementation, then check the stub
    # error message advertises it (reference model_stub.py:102-143).
    from embiggen_tpu.models.stub import make_stub

    fake = MODELS_LIBRARY["Edge Prediction"]["XGBoost"]
    sentinel = type(
        "FakeXGB",
        (),
        {
            "task_name": classmethod(lambda c: "Edge Prediction"),
            "model_name": classmethod(lambda c: "XGBoost"),
            "library_name": classmethod(lambda c: "OtherLib"),
        },
    )
    fake["OtherLib"] = sentinel
    try:
        cls = fake["XGBoost"]
        with pytest.raises(ModuleNotFoundError, match="OtherLib"):
            cls()
    finally:
        fake.pop("OtherLib")


def test_generic_node2vec_trains():
    from embiggen_tpu.graph import karate_club
    from embiggen_tpu.models.embedders.walk_based import Node2Vec

    graph = karate_club()
    model = Node2Vec(
        embedding_size=8, epochs=1, batch_size=8, walk_length=8,
        window_size=2, random_state=0,
    )
    result = model.fit_transform(graph)
    emb = result.get_all_node_embedding()[0]
    assert emb.shape == (graph.number_of_nodes, 8)


def test_glee_name_matches_reference():
    cls = get_model_from_library("GLEE", task_name="Node Embedding")
    assert cls.model_name() == "GLEE"


def test_feature_preprocessor_registered():
    cls = get_model_from_library(
        "Graph Convolution", task_name="Feature Preprocessor"
    )
    assert cls.task_name() == "Feature Preprocessor"


def test_hyper_sketching_registered():
    cls = get_model_from_library("HyperSketching")
    assert cls.model_name() == "HyperSketching"
