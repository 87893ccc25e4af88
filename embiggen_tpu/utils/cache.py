"""Result caching keyed by parameter hashes — the native equivalent of the
reference's `cache_decorator.Cache` usage
(`embiggen/utils/abstract_models/abstract_embedding_model.py:91-95` caches
embeddings at `embedding/{model}/{library}/{graph}/{hash}.pkl.gz`,
`abstract_classifier_model.py:2618-2625` caches experiment DataFrames).
"""
from __future__ import annotations

import functools
import gzip
import hashlib
import os
import pickle
from typing import Callable, Optional

DEFAULT_CACHE_DIR = os.environ.get("EMBIGGEN_TPU_CACHE_DIR", ".embiggen_tpu_cache")


def _hash_key(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(str(p).encode())
    return h.hexdigest()[:32]


def cache_result(path: str, compute: Callable, enable: bool = True):
    """Load the pickled result at `path` if present, else compute + store."""
    if enable and os.path.exists(path):
        with gzip.open(path, "rb") as f:
            return pickle.load(f)
    result = compute()
    if enable:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with gzip.open(path, "wb") as f:
            pickle.dump(result, f)
    return result


class Cache:
    """Decorator caching a method's result keyed by the model's
    consistent_hash and the graph name:

        @Cache("embedding/{model_name}/{library_name}/{graph_name}/{hash}.pkl.gz")
        def _cached_fit_transform(self, graph): ...
    """

    def __init__(self, path_template: str, cache_dir: Optional[str] = None):
        self._template = path_template
        self._cache_dir = cache_dir or DEFAULT_CACHE_DIR

    def __call__(self, method: Callable) -> Callable:
        template = self._template
        cache_dir = self._cache_dir

        @functools.wraps(method)
        def wrapper(model, graph, *args, **kwargs):
            enabled = getattr(model, "_enable_cache", False)
            if not enabled:
                return method(model, graph, *args, **kwargs)
            path = os.path.join(
                cache_dir,
                template.format(
                    model_name=model.model_name().replace(" ", "_"),
                    library_name=model.library_name(),
                    graph_name=graph.name.replace(" ", "_"),
                    hash=_hash_key(
                        model.consistent_hash(), graph.consistent_hash()
                    ),
                ),
            )
            return cache_result(
                path, lambda: method(model, graph, *args, **kwargs)
            )

        return wrapper
