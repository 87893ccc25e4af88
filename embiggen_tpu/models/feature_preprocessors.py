"""Feature preprocessors — reference
`embiggen/utils/abstract_models/abstract_feature_preprocessor.py:20-91` and
the GraphConvolution n-hop smoothing preprocessor
(`embiggen/feature_preprocessors/graph_convolution.py:14-130`).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from ..graph.laplacians import kernel_coo
from ..ops.spmm import spmm
from .abstract import AbstractModel
from .embedding_result import EmbeddingResult
from .registry import register_model


class AbstractFeaturePreprocessor(AbstractModel):
    """`transform(support, node_features) -> EmbeddingResult`."""

    @classmethod
    def task_name(cls) -> str:
        return "Feature Preprocessor"

    @classmethod
    def is_stochastic(cls) -> bool:
        return False

    def transform(self, support: Graph, node_features) -> EmbeddingResult:
        raise NotImplementedError


@register_model
class GraphConvolution(AbstractFeaturePreprocessor):
    """n-hop feature propagation: X ← Â X repeated, optionally concatenating
    each hop's features (reference parameter surface mirrored)."""

    def __init__(
        self,
        number_of_convolutions: int = 2,
        concatenate_features: bool = False,
        transpose: bool = False,
        normalize_rows: bool = False,
        dtype: str = "f32",
    ):
        self._number_of_convolutions = number_of_convolutions
        self._concatenate_features = concatenate_features
        self._transpose = transpose
        self._normalize_rows = normalize_rows
        self._dtype = dtype
        super().__init__(random_state=None)

    @classmethod
    def model_name(cls) -> str:
        return "Graph Convolution"

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "number_of_convolutions": self._number_of_convolutions,
            "concatenate_features": self._concatenate_features,
            "transpose": self._transpose,
            "normalize_rows": self._normalize_rows,
            "dtype": self._dtype,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"number_of_convolutions": 1}

    def transform(self, support: Graph, node_features) -> EmbeddingResult:
        if isinstance(node_features, EmbeddingResult):
            node_features = node_features.get_all_node_embedding()
        if not isinstance(node_features, list):
            node_features = [node_features]
        kernel = (
            "Transposed Left Normalized Laplacian"
            if self._transpose
            else "Left Normalized Laplacian"
        )
        rows, cols, vals = kernel_coo(support, kernel)
        rows_d = jnp.asarray(rows, jnp.int32)
        cols_d = jnp.asarray(cols, jnp.int32)
        vals_d = jnp.asarray(vals, jnp.float32)
        out = []
        np_dtype = {"f16": np.float16, "f32": np.float32, "f64": np.float64}[
            self._dtype
        ]
        for feature in node_features:
            x = np.asarray(
                feature.to_numpy() if hasattr(feature, "loc") else feature,
                dtype=np.float32,
            )
            if self._normalize_rows:
                x = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-9
                )
            xs = [x]
            xd = jnp.asarray(x)
            for _ in range(self._number_of_convolutions):
                xd = spmm(
                    rows_d, cols_d, vals_d, xd, support.number_of_nodes, "sum"
                )
                if self._concatenate_features:
                    xs.append(np.asarray(xd))
            result = (
                np.concatenate(xs, axis=1)
                if self._concatenate_features
                else np.asarray(xd)
            )
            out.append(result.astype(np_dtype))
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=out,
            node_names=support.get_node_names(),
        )
