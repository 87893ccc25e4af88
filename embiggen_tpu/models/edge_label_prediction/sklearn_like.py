"""Sklearn-like edge-label prediction adapters (reference
`embiggen/edge_label_prediction/edge_label_prediction_sklearn/`)."""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import numpy as np

from ...graph.graph import Graph
from ...transformers.tasks import EdgeLabelPredictionTransformer
from ..registry import register_model
from .model import AbstractEdgeLabelPredictionModel


class SklearnEdgeLabelPredictionAdapter(AbstractEdgeLabelPredictionModel):
    def __init__(
        self,
        model_instance=None,
        edge_embedding_methods: Union[List[str], str] = "Concatenate",
        use_edge_metrics: bool = False,
        random_state: int = 42,
        **model_kwargs,
    ):
        if model_instance is None:
            model_instance = self._default_model_instance(
                random_state=random_state, **model_kwargs
            )
        self._model_instance = model_instance
        self._model_kwargs = model_kwargs
        self._edge_embedding_methods = (
            [edge_embedding_methods]
            if isinstance(edge_embedding_methods, str)
            else list(edge_embedding_methods)
        )
        # Support-graph topological metric columns appended to the edge
        # features (reference
        # `sklearn_like_edge_label_prediction_adapter.py` `use_edge_metrics`).
        self._use_edge_metrics = use_edge_metrics
        self._metrics_support: Optional[Graph] = None
        super().__init__(random_state=random_state)

    def _default_model_instance(self, random_state: int, **kwargs):
        raise ValueError(
            "SklearnEdgeLabelPredictionAdapter requires a model_instance."
        )

    @classmethod
    def model_name(cls) -> str:
        return "Sklearn-like Edge Label Prediction Adapter"

    @classmethod
    def library_name(cls) -> str:
        return "scikit-learn"

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "edge_embedding_methods": self._edge_embedding_methods,
            "use_edge_metrics": self._use_edge_metrics,
            **self._model_kwargs,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {}

    def is_binary_prediction_task(self) -> bool:
        return self._n_classes == 2

    def _fit(self, graph: Graph, support: Graph, node_features, **kwargs):
        if not node_features:
            raise ValueError(f"{self.model_name()} requires node features.")
        feats = self.concatenate_features(node_features)
        self._transformer = EdgeLabelPredictionTransformer(
            methods=self._edge_embedding_methods, aligned_mapping=True
        )
        self._transformer.fit(feats)
        self._n_classes = graph.number_of_edge_types
        self._metrics_support = support if self._use_edge_metrics else None
        x, y = self._transformer.transform(
            graph, extra_features_fn=self._edge_metrics_fn()
        )
        self._model_instance.fit(x, y)

    def _edge_metrics_fn(self):
        if not self._use_edge_metrics:
            return None
        support = self._metrics_support
        from ...graph.metrics import edge_metrics

        def fn(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
            m = edge_metrics(support, src, dst)
            m[:, 3] = np.log1p(m[:, 3])
            return m

        return fn

    def _predict_proba(self, graph: Graph, support: Optional[Graph] = None,
                       **kwargs) -> np.ndarray:
        edge_tr = self._transformer._edge_transformer
        from ...utils.sklearn_compat import predict_proba_compat

        x = edge_tr.transform(graph.sources, graph.col_idx)
        metric_fn = self._edge_metrics_fn()
        if metric_fn is not None:
            x = np.concatenate(
                [x, metric_fn(graph.sources, graph.col_idx)], axis=1
            )
        proba = predict_proba_compat(self._model_instance, x)
        classes = self._model_instance.classes_
        out = np.zeros((x.shape[0], self._n_classes), dtype=np.float64)
        out[:, np.asarray(classes, int)] = proba
        return out


def _make_wrapper(name: str, factory_path: str, defaults: dict):
    def _default_model_instance(self, random_state: int, **kwargs):
        import importlib
        import inspect

        module_name, cls_name = factory_path.rsplit(".", 1)
        cls = getattr(importlib.import_module(module_name), cls_name)
        params = dict(defaults)
        params.update(kwargs)
        if "random_state" in inspect.signature(cls).parameters:
            params.setdefault("random_state", random_state)
        return cls(**params)

    wrapper = type(
        name.replace(" ", "").replace("-", "") + "EdgeLabelPrediction",
        (SklearnEdgeLabelPredictionAdapter,),
        {
            "_default_model_instance": _default_model_instance,
            "model_name": classmethod(lambda cls: name),
            "__doc__": f"{name} over edge embeddings (sklearn backend).",
        },
    )
    return register_model(wrapper)


SKLEARN_EDGE_LABEL_MODELS = {
    "Random Forest Classifier": (
        "sklearn.ensemble.RandomForestClassifier", {"n_estimators": 100}
    ),
    "Extra Trees Classifier": (
        "sklearn.ensemble.ExtraTreesClassifier", {"n_estimators": 100}
    ),
    "Decision Tree Classifier": ("sklearn.tree.DecisionTreeClassifier", {}),
    "Logistic Regression Classifier": (
        "sklearn.linear_model.LogisticRegression", {"max_iter": 1000}
    ),
    "Gradient Boosting Classifier": (
        "sklearn.ensemble.GradientBoostingClassifier", {}
    ),
    "AdaBoost Classifier": ("sklearn.ensemble.AdaBoostClassifier", {}),
    "Bagging Classifier": ("sklearn.ensemble.BaggingClassifier", {}),
    "K-Neighbour Classifier": ("sklearn.neighbors.KNeighborsClassifier", {}),
    "Gaussian Naive Bayes": ("sklearn.naive_bayes.GaussianNB", {}),
    "MLP Classifier": (
        "sklearn.neural_network.MLPClassifier", {"max_iter": 500}
    ),
    "Hist Gradient Boosting Classifier": (
        "sklearn.ensemble.HistGradientBoostingClassifier", {}
    ),
    "Linear Support Vector Classifier": (
        "sklearn.svm.LinearSVC",
        {"class_weight": "balanced", "max_iter": 1000, "dual": "auto"},
    ),
    "Nu Support Vector Classifier": ("sklearn.svm.NuSVC", {}),
    "Radius Neighbour Classifier": (
        "sklearn.neighbors.RadiusNeighborsClassifier",
        {"outlier_label": "most_frequent"},
    ),
    "Logistic Regression Cross Validator": (
        "sklearn.linear_model.LogisticRegressionCV", {"max_iter": 1000}
    ),
    "Ridge Classifier": ("sklearn.linear_model.RidgeClassifier", {}),
    "Ridge Classifier Cross Validator": (
        "sklearn.linear_model.RidgeClassifierCV", {}
    ),
}

_WRAPPERS = {
    name: _make_wrapper(name, path, defaults)
    for name, (path, defaults) in SKLEARN_EDGE_LABEL_MODELS.items()
}
globals().update({cls.__name__: cls for cls in _WRAPPERS.values()})
