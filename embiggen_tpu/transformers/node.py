"""NodeTransformer — align node features to a graph's node ordering
(reference `embiggen/embedding_transformers/node_transformer.py:8-243`)."""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from ..graph.graph import Graph
from ..models.embedding_result import EmbeddingResult


class NodeTransformer:
    """Holds fitted node features; `transform` gathers rows by node id/name."""

    def __init__(self, aligned_mapping: bool = False):
        self._aligned_mapping = aligned_mapping
        self._features: Optional[np.ndarray] = None
        self._name_to_id = None

    def fit(self, node_feature) -> "NodeTransformer":
        if isinstance(node_feature, EmbeddingResult):
            node_feature = node_feature.get_all_node_embedding()
        if not isinstance(node_feature, list):
            node_feature = [node_feature]
        mats = []
        for f in node_feature:
            if hasattr(f, "loc"):
                if self._name_to_id is None:
                    self._name_to_id = {n: i for i, n in enumerate(f.index)}
                mats.append(f.to_numpy(dtype=np.float32))
            else:
                mats.append(np.asarray(f, dtype=np.float32))
        self._features = np.concatenate(mats, axis=1)
        return self

    @property
    def is_fitted(self) -> bool:
        return self._features is not None

    def transform(
        self, nodes: Union[Graph, np.ndarray, List[str]]
    ) -> np.ndarray:
        if self._features is None:
            raise ValueError("NodeTransformer must be fitted first.")
        if isinstance(nodes, Graph):
            if self._aligned_mapping or self._name_to_id is None:
                return self._features
            ids = [self._name_to_id[n] for n in nodes.get_node_names()]
            return self._features[ids]
        nodes = np.asarray(nodes)
        if nodes.dtype.kind in "iu":
            return self._features[nodes]
        if self._name_to_id is None:
            raise ValueError(
                "Cannot transform node names without a DataFrame-indexed fit."
            )
        return self._features[[self._name_to_id[n] for n in nodes]]
