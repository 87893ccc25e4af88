"""Model serialization — the reference's `AbstractClassifierModel.load/dump`
via compress_pickle (`abstract_classifier_model.py:582-613`,
`abstract_gcn.py:1249-1273`): gzip-pickle with jax arrays converted to numpy
so models round-trip across devices.
"""
from __future__ import annotations

import gzip
import pickle
from typing import Any

import numpy as np


def _numpyify(obj):
    """Recursively convert jax arrays in common containers to numpy."""
    try:
        import jax

        if isinstance(obj, jax.Array):
            return np.asarray(obj)
    except ImportError:
        pass
    if isinstance(obj, dict):
        return {k: _numpyify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_numpyify(v) for v in obj)
    return obj


def dump_model(model: Any, path: str) -> None:
    if hasattr(model, "_params"):
        model._params = _numpyify(model._params)
    with gzip.open(path, "wb") as f:
        pickle.dump(model, f)


def load_model(path: str) -> Any:
    with gzip.open(path, "rb") as f:
        return pickle.load(f)
