"""GraphTransformer — whole-graph to edge-embedding matrix (reference
`embiggen/embedding_transformers/graph_transformer.py`)."""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from ..graph.graph import Graph
from .edge import EdgeTransformer


class GraphTransformer:
    def __init__(
        self,
        methods: Union[List[str], str] = "Hadamard",
        aligned_mapping: bool = False,
    ):
        self._edge_transformer = EdgeTransformer(
            methods=methods, aligned_mapping=aligned_mapping
        )

    def fit(self, node_feature) -> "GraphTransformer":
        self._edge_transformer.fit(node_feature)
        return self

    def transform(
        self,
        graph: Graph,
        edge_type_features: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Edge features for every arc of the graph."""
        return self._edge_transformer.transform(
            graph.sources, graph.col_idx, edge_type_features=edge_type_features
        )
