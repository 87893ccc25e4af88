"""Edge-feature protocol + HyperSketching — reference
`embiggen/utils/abstract_edge_feature.py:15-80` (lazy per-batch edge-feature
query surface) and the dual embedder/edge-feature `HyperSketching`
(`ensmallen_embedders/hyper_sketching.py:15-140`: hops 3, precision 8,
bits 6, overlap/left-diff/right-diff cardinalities; feature width =
hops² + 2·hops, `:223-229`).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from ..ops.hll import (
    edge_sketch_features,
    hll_cardinality,
    khop_sketches,
    singleton_registers,
)
from .abstract import AbstractEmbeddingModel
from .embedding_result import EmbeddingResult
from .registry import register_model


class AbstractEdgeFeature:
    """Lazy per-batch edge-feature protocol: fitted on a support graph, then
    queried for arbitrary (src, dst) batches during training/inference."""

    def fit(self, support: Graph) -> "AbstractEdgeFeature":
        raise NotImplementedError

    def is_fit(self) -> bool:
        raise NotImplementedError

    @classmethod
    def get_feature_dictionary_keys(cls) -> List[str]:
        raise NotImplementedError

    def get_feature_dictionary_shapes(self) -> Dict[str, List[int]]:
        raise NotImplementedError

    def get_edge_feature_from_edge_node_ids(
        self, src: np.ndarray, dst: np.ndarray
    ) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def get_edge_feature_from_graph(self, graph: Graph) -> Dict[str, np.ndarray]:
        return self.get_edge_feature_from_edge_node_ids(
            graph.sources, graph.col_idx
        )


@register_model
class HyperSketching(AbstractEmbeddingModel, AbstractEdgeFeature):
    """HLL k-hop ball sketches; edge features = pairwise hop overlap +
    left/right difference cardinalities."""

    def __init__(
        self,
        number_of_hops: int = 3,
        precision: int = 8,
        bits: int = 6,
        normalize: bool = False,
        zero_out_differences_cardinalities: bool = False,
        random_state: int = 42,
        enable_cache: bool = False,
    ):
        if not 4 <= precision <= 12:
            raise ValueError("precision must be in [4, 12]")
        self._number_of_hops = number_of_hops
        self._precision = precision
        self._bits = bits
        self._normalize = normalize
        self._zero_out_differences_cardinalities = (
            zero_out_differences_cardinalities
        )
        self._sketches: Optional[jnp.ndarray] = None
        super().__init__(
            # feature width, for the embedding_size contract
            embedding_size=number_of_hops ** 2 + 2 * number_of_hops,
            enable_cache=enable_cache,
            random_state=random_state,
        )

    @classmethod
    def model_name(cls) -> str:
        return "HyperSketching"

    def parameters(self) -> Dict[str, Any]:
        params = super().parameters()
        params.pop("embedding_size", None)
        return {
            **params,
            "number_of_hops": self._number_of_hops,
            "precision": self._precision,
            "bits": self._bits,
            "normalize": self._normalize,
            "zero_out_differences_cardinalities":
                self._zero_out_differences_cardinalities,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"number_of_hops": 2, "precision": 4}

    # ------------------------------------------------- AbstractEdgeFeature
    def fit(self, support: Graph) -> "HyperSketching":
        dg = support.device(with_weights=False)
        base = singleton_registers(
            support.number_of_nodes, self._precision, self._bits,
            seed=self.random_state or 0,
        )
        # [H, N, M] -> [N, H, M] for per-node gathers
        self._sketches = jnp.transpose(
            khop_sketches(dg, base, self._number_of_hops), (1, 0, 2)
        )
        self._n_nodes = support.number_of_nodes
        return self

    def is_fit(self) -> bool:
        return self._sketches is not None

    @classmethod
    def get_feature_dictionary_keys(cls) -> List[str]:
        return ["edge_features"]

    def get_feature_dictionary_shapes(self) -> Dict[str, List[int]]:
        h = self._number_of_hops
        return {"edge_features": [h * h + 2 * h]}

    def get_edge_feature_from_edge_node_ids(
        self, src: np.ndarray, dst: np.ndarray
    ) -> Dict[str, np.ndarray]:
        if not self.is_fit():
            raise ValueError("HyperSketching must be fitted first.")
        feats = np.asarray(
            edge_sketch_features(
                self._sketches[jnp.asarray(src, jnp.int32)],
                self._sketches[jnp.asarray(dst, jnp.int32)],
                self._precision,
            )
        )
        h = self._number_of_hops
        if self._zero_out_differences_cardinalities:
            feats[:, h * h:] = 0.0
        if self._normalize:
            # normalize by the largest-ball cardinalities
            denom = np.maximum(feats.max(axis=1, keepdims=True), 1e-9)
            feats = feats / denom
        return {"edge_features": feats.astype(np.float32)}

    def device_feature_tables(self):
        """The on-device sketch tables, exposed so training steps can pass
        them through the jit ARGUMENT path (TrainLoop `data`): a closure
        over [N, hops, 2^precision] registers would lower them as inline
        HLO constants — hundreds of MB of program at 1M nodes."""
        if not self.is_fit():
            raise ValueError("HyperSketching must be fitted first.")
        return self._sketches

    def device_feature_fn(self):
        """Jit-safe (src, dst[, tables]) -> [B, F] feature function —
        consumed by the edge GCNs so per-batch edge features stay inside
        the jitted training step. Pass `tables` (from
        `device_feature_tables`) inside jitted code; omitting it falls back
        to the captured tables (fine for small graphs / eager use)."""
        if not self.is_fit():
            raise ValueError("HyperSketching must be fitted first.")
        sketches = self._sketches
        precision = self._precision

        def fn(src, dst, tables=None):
            sk = sketches if tables is None else tables
            return edge_sketch_features(sk[src], sk[dst], precision)

        return fn

    # ------------------------------------------------------------- embedder
    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        self.fit(graph)
        feats = self.get_edge_feature_from_graph(graph)["edge_features"]
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            edge_embeddings=[feats],
            node_names=graph.get_node_names(),
        )
