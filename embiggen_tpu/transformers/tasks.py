"""Per-task (X, y) assembly for sklearn-like backends — reference
`embiggen/embedding_transformers/{edge_prediction_transformer,
edge_label_prediction_transformer,node_label_prediction_transformer}.py`."""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from ..graph.graph import Graph
from .edge import EdgeTransformer
from .graph import GraphTransformer
from .node import NodeTransformer


class EdgePredictionTransformer:
    """(positive graph, negative graph) -> stacked edge features + 0/1 labels."""

    def __init__(
        self,
        methods: Union[List[str], str] = "Hadamard",
        aligned_mapping: bool = False,
    ):
        self._graph_transformer = GraphTransformer(
            methods=methods, aligned_mapping=aligned_mapping
        )

    def fit(self, node_feature) -> "EdgePredictionTransformer":
        self._graph_transformer.fit(node_feature)
        return self

    def transform(
        self,
        positive_graph: Graph,
        negative_graph: Graph,
        shuffle: bool = True,
        random_state: int = 42,
        extra_features_fn=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """`extra_features_fn(src, dst) -> [B, d]` appends per-pair columns
        (e.g. support-graph topological metrics for `use_edge_metrics`,
        reference `sklearn_like_edge_prediction_adapter.py:215-230`) aligned
        with the stacked pos/neg rows before the shuffle."""
        pos = self._graph_transformer.transform(positive_graph)
        neg = self._graph_transformer.transform(negative_graph)
        x = np.concatenate([pos, neg], axis=0)
        if extra_features_fn is not None:
            src = np.concatenate(
                [positive_graph.sources, negative_graph.sources]
            )
            dst = np.concatenate(
                [positive_graph.col_idx, negative_graph.col_idx]
            )
            x = np.concatenate([x, extra_features_fn(src, dst)], axis=1)
        y = np.concatenate(
            [np.ones(len(pos), np.int32), np.zeros(len(neg), np.int32)]
        )
        if shuffle:
            rng = np.random.default_rng(random_state)
            perm = rng.permutation(len(x))
            x, y = x[perm], y[perm]
        return x, y


class EdgeLabelPredictionTransformer:
    """Graph with known edge types -> edge features + type labels."""

    def __init__(
        self,
        methods: Union[List[str], str] = "Hadamard",
        aligned_mapping: bool = False,
    ):
        self._edge_transformer = EdgeTransformer(
            methods=methods, aligned_mapping=aligned_mapping
        )

    def fit(self, node_feature) -> "EdgeLabelPredictionTransformer":
        self._edge_transformer.fit(node_feature)
        return self

    def transform(
        self, graph: Graph, shuffle: bool = False, random_state: int = 42,
        extra_features_fn=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        if graph.edge_types is None:
            raise ValueError("Graph has no edge types.")
        known = graph.get_known_edge_types_mask()
        src = graph.sources[known]
        dst = graph.col_idx[known]
        y = graph.edge_types[known]
        x = self._edge_transformer.transform(src, dst)
        if extra_features_fn is not None:
            x = np.concatenate([x, extra_features_fn(src, dst)], axis=1)
        if shuffle:
            rng = np.random.default_rng(random_state)
            perm = rng.permutation(len(x))
            x, y = x[perm], y[perm]
        return x, y


class NodeLabelPredictionTransformer:
    """Graph with known node types -> node features + labels (single-label or
    multilabel one-hot)."""

    def __init__(self, aligned_mapping: bool = False):
        self._node_transformer = NodeTransformer(aligned_mapping=aligned_mapping)

    def fit(self, node_feature) -> "NodeLabelPredictionTransformer":
        self._node_transformer.fit(node_feature)
        return self

    def transform(
        self, graph: Graph, shuffle: bool = False, random_state: int = 42
    ) -> Tuple[np.ndarray, np.ndarray]:
        if not graph.has_node_types:
            raise ValueError("Graph has no node types.")
        known = graph.get_known_node_types_mask()
        ids = np.nonzero(known)[0]
        x = self._node_transformer.transform(graph)[ids]
        if graph.has_multilabel_node_types():
            y = graph.get_one_hot_encoded_node_types()[ids]
        else:
            y = graph.get_single_label_node_type_ids()[ids]
        if shuffle:
            rng = np.random.default_rng(random_state)
            perm = rng.permutation(len(x))
            x, y = x[perm], y[perm]
        return x, y
