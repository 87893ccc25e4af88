"""SPINE / WINE sketch embedders + RUBICONE / RUINE — native re-designs of
the reference engine's sketch models (reference
`embiggen/embedders/ensmallen_embedders/{degree_spine,degree_wine,
node_label_spine,node_label_wine,score_spine,score_wine,weighted_spine,
rubicone,ruine}.py`; parameter surfaces mirrored: embedding_size, dtype,
maximum_depth / window_size / number_of_convolutions).

- SPINE: feature j = shortest-path distance from anchor set j (multi-source
  min-plus BFS on device, `ops/bfs.py`); anchors ranked by degree / node
  label / user score.
- WINE: feature j = window-size-bounded co-occurrence count with anchor set j.
- RUBICONE: random binary features smoothed by k graph convolutions.
- RUINE: random uniform features smoothed by k graph convolutions.

All are deterministic given the graph (SPINE/WINE) or the random_state
(RUBICONE/RUINE) and run entirely on device.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...graph.graph import Graph
from ...ops.bfs import (
    UNREACHED,
    anchor_init_from_sets,
    multi_source_distances,
    window_cooccurrence_counts,
)
from ..abstract import AbstractEmbeddingModel
from ..embedding_result import EmbeddingResult
from ..registry import register_model


def _clamp_to_dtype(dist: np.ndarray, dtype: Optional[str]) -> np.ndarray:
    """u8 semantics of the reference: distances clamp to the dtype max."""
    if dtype in ("u8", "uint8"):
        return np.minimum(dist, 255).astype(np.uint8)
    if dtype in ("u16", "uint16"):
        return np.minimum(dist, 65535).astype(np.uint16)
    return dist.astype(np.float32)


class _AnchorSketchBase(AbstractEmbeddingModel):
    """Shared anchor-selection machinery."""

    def __init__(
        self,
        embedding_size: int = 100,
        dtype: Optional[str] = "u8",
        enable_cache: bool = False,
        **kwargs,
    ):
        self._dtype = dtype
        super().__init__(
            embedding_size=embedding_size, enable_cache=enable_cache,
            random_state=None,
        )

    @classmethod
    def is_stochastic(cls) -> bool:
        return False

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"embedding_size": 5}

    def parameters(self) -> Dict[str, Any]:
        return {**super().parameters(), "dtype": self._dtype}

    def _anchor_sets(self, graph: Graph) -> List[np.ndarray]:
        raise NotImplementedError


class _DegreeAnchorMixin:
    def _anchor_sets(self, graph: Graph) -> List[np.ndarray]:
        order = np.argsort(-graph.degrees, kind="stable")
        d = min(self.embedding_size, graph.number_of_nodes)
        return [np.asarray([order[j]]) for j in range(d)]


class _NodeLabelAnchorMixin:
    @classmethod
    def requires_node_types(cls) -> bool:
        return True

    def _anchor_sets(self, graph: Graph) -> List[np.ndarray]:
        if not graph.has_node_types:
            raise ValueError(
                f"{self.model_name()} requires node types."
            )
        labels = graph.get_single_label_node_type_ids()
        sets = []
        for t in range(graph.number_of_node_types):
            members = np.nonzero(labels == t)[0]
            if len(members):
                sets.append(members)
        return sets


class _ScoreAnchorMixin:
    def __init__(self, scores: Optional[np.ndarray] = None, **kwargs):
        self._scores = None if scores is None else np.asarray(scores)
        super().__init__(**kwargs)

    def _anchor_sets(self, graph: Graph) -> List[np.ndarray]:
        if self._scores is None:
            raise ValueError(
                f"{self.model_name()} requires a `scores` array at "
                "construction."
            )
        if len(self._scores) != graph.number_of_nodes:
            raise ValueError(
                f"scores has {len(self._scores)} entries for "
                f"{graph.number_of_nodes} nodes."
            )
        order = np.argsort(-self._scores, kind="stable")
        d = min(self.embedding_size, graph.number_of_nodes)
        return [np.asarray([order[j]]) for j in range(d)]


class _SPINEBase(_AnchorSketchBase):
    def __init__(self, maximum_depth: Optional[int] = None, **kwargs):
        self._maximum_depth = maximum_depth
        super().__init__(**kwargs)

    def parameters(self) -> Dict[str, Any]:
        return {**super().parameters(), "maximum_depth": self._maximum_depth}

    WEIGHTED = False

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        sets = self._anchor_sets(graph)
        init = anchor_init_from_sets(graph.number_of_nodes, sets)
        depth = self._maximum_depth or 32
        dist = np.asarray(
            multi_source_distances(
                graph.device(with_weights=self.WEIGHTED),
                init,
                max_depth=depth,
                weighted=self.WEIGHTED,
            )
        )
        dist = np.where(dist >= float(UNREACHED), depth + 1, dist)
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[_clamp_to_dtype(dist, self._dtype)],
            node_names=graph.get_node_names(),
        )


class _WINEBase(_AnchorSketchBase):
    def __init__(self, window_size: int = 2, **kwargs):
        self._window_size = window_size
        super().__init__(**kwargs)

    def parameters(self) -> Dict[str, Any]:
        return {**super().parameters(), "window_size": self._window_size}

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        sets = self._anchor_sets(graph)
        membership = np.zeros(
            (graph.number_of_nodes, len(sets)), dtype=np.float32
        )
        for j, nodes in enumerate(sets):
            membership[np.asarray(nodes, np.int64), j] = 1.0
        counts = np.asarray(
            window_cooccurrence_counts(
                graph.device(with_weights=False),
                jnp.asarray(membership),
                window_size=self._window_size,
            )
        )
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[_clamp_to_dtype(counts, self._dtype)],
            node_names=graph.get_node_names(),
        )


@register_model
class DegreeSPINE(_DegreeAnchorMixin, _SPINEBase):
    """Reference `degree_spine.py:48`."""

    @classmethod
    def model_name(cls) -> str:
        return "Degree-based SPINE"


@register_model
class DegreeWINE(_DegreeAnchorMixin, _WINEBase):
    """Reference `degree_wine.py:50`."""

    @classmethod
    def model_name(cls) -> str:
        return "Degree-based WINE"


@register_model
class NodeLabelSPINE(_NodeLabelAnchorMixin, _SPINEBase):
    """Reference `node_label_spine.py:45`."""

    @classmethod
    def model_name(cls) -> str:
        return "Node-label-based SPINE"


@register_model
class NodeLabelWINE(_NodeLabelAnchorMixin, _WINEBase):
    """Reference `node_label_wine.py`."""

    @classmethod
    def model_name(cls) -> str:
        return "Node-label-based WINE"


@register_model
class ScoreSPINE(_ScoreAnchorMixin, _SPINEBase):
    """Reference `score_spine.py:53`."""

    @classmethod
    def model_name(cls) -> str:
        return "Score-based SPINE"

    def parameters(self) -> Dict[str, Any]:
        return {**super().parameters(), "scores": self._scores}

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"embedding_size": 5, "scores": None}


@register_model
class ScoreWINE(_ScoreAnchorMixin, _WINEBase):
    """Reference `score_wine.py`."""

    @classmethod
    def model_name(cls) -> str:
        return "Score-based WINE"

    def parameters(self) -> Dict[str, Any]:
        return {**super().parameters(), "scores": self._scores}

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"embedding_size": 5, "scores": None}


@register_model
class WeightedSPINE(_DegreeAnchorMixin, _SPINEBase):
    """Weighted shortest paths (Bellman-Ford min-plus) — reference
    `weighted_spine.py:38`."""

    WEIGHTED = True

    @classmethod
    def model_name(cls) -> str:
        return "WeightedSPINE"

    @classmethod
    def requires_edge_weights(cls) -> bool:
        return True

    def __init__(self, use_reciprocal_weights: bool = False, **kwargs):
        self._use_reciprocal_weights = use_reciprocal_weights
        super().__init__(**kwargs)

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "use_reciprocal_weights": self._use_reciprocal_weights,
        }

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        import dataclasses

        if self._use_reciprocal_weights:
            graph = dataclasses.replace(
                graph, weights=(1.0 / np.maximum(graph.weights, 1e-9))
            )
        return super()._fit_transform(graph)


class _RandomConvolutionBase(AbstractEmbeddingModel):
    """Random features smoothed by k rounds of mean-aggregation."""

    def __init__(
        self,
        embedding_size: int = 100,
        dtype: Optional[str] = "u8",
        number_of_convolutions: int = 2,
        random_state: int = 42,
        enable_cache: bool = False,
    ):
        self._dtype = dtype
        self._number_of_convolutions = number_of_convolutions
        super().__init__(
            embedding_size=embedding_size, enable_cache=enable_cache,
            random_state=random_state,
        )

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "dtype": self._dtype,
            "number_of_convolutions": self._number_of_convolutions,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"embedding_size": 5, "number_of_convolutions": 1}

    def _random_features(self, key, shape) -> jnp.ndarray:
        raise NotImplementedError

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        from ...graph.laplacians import kernel_coo
        from ...ops.spmm import spmm

        key = jax.random.PRNGKey(self.random_state or 0)
        x = self._random_features(
            key, (graph.number_of_nodes, self.embedding_size)
        )
        rows, cols, vals = kernel_coo(graph, "Left Normalized Laplacian")
        rows_d = jnp.asarray(rows, jnp.int32)
        cols_d = jnp.asarray(cols, jnp.int32)
        vals_d = jnp.asarray(vals, jnp.float32)
        for _ in range(self._number_of_convolutions):
            x = spmm(rows_d, cols_d, vals_d, x, graph.number_of_nodes, "sum")
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[np.asarray(x, dtype=np.float32)],
            node_names=graph.get_node_names(),
        )


@register_model
class RUBICONE(_RandomConvolutionBase):
    """Random-bit convolved embedding (reference `rubicone.py:48`)."""

    @classmethod
    def model_name(cls) -> str:
        return "RUBICONE"

    def _random_features(self, key, shape):
        return jax.random.bernoulli(key, 0.5, shape).astype(jnp.float32)


@register_model
class RUINE(_RandomConvolutionBase):
    """Random-uniform convolved embedding (reference `ruine.py:48`)."""

    @classmethod
    def model_name(cls) -> str:
        return "RUINE"

    def _random_features(self, key, shape):
        return jax.random.uniform(key, shape, jnp.float32)
