"""Probability compatibility shim for sklearn-style classifiers.

Several of the reference's named wrappers (Linear Support Vector
Classifier, Ridge Classifier, Ridge Classifier Cross Validator —
`embiggen/edge_prediction/edge_prediction_sklearn/{linear_svc,
ridge_classifier,ridge_classifier_cv}_edge_prediction.py`) wrap sklearn
models that expose `decision_function` but not `predict_proba`. This shim
gives every adapter a uniform `[N, n_classes]` probability surface:
calibrated probabilities when available, a logistic/softmax squashing of
the decision margin otherwise.
"""
from __future__ import annotations

import numpy as np


def predict_proba_compat(model, x: np.ndarray) -> np.ndarray:
    """Return an ``[N, n_classes]`` probability-like matrix for any sklearn
    classifier, falling back to squashed decision margins."""
    if hasattr(model, "predict_proba"):
        return np.asarray(model.predict_proba(x))
    if hasattr(model, "decision_function"):
        margin = np.asarray(model.decision_function(x), dtype=np.float64)
        if margin.ndim == 1:
            pos = 1.0 / (1.0 + np.exp(-margin))
            return np.stack([1.0 - pos, pos], axis=1)
        # multiclass one-vs-rest margins -> softmax
        margin = margin - margin.max(axis=1, keepdims=True)
        e = np.exp(margin)
        return e / e.sum(axis=1, keepdims=True)
    raise AttributeError(
        f"{type(model).__name__} exposes neither predict_proba nor "
        "decision_function."
    )
