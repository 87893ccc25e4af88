"""EdgeTransformer — convert (src, dst) pairs into edge features using the 14
edge operators (the reference's 12-method table plus its L1Norm/L2Norm module
helpers registered as first-class methods), with optional multi-method
concatenation and edge-type feature concat (reference
`embiggen/embedding_transformers/edge_transformer.py:345-718`)."""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from ..ops import edge_ops
from .node import NodeTransformer


class EdgeTransformer:
    methods = list(edge_ops.EDGE_TRANSFORMER_METHODS)

    def __init__(
        self,
        methods: Union[List[str], str] = "Hadamard",
        aligned_mapping: bool = False,
    ):
        if isinstance(methods, str) or methods is None:
            methods = [methods]
        self._method_names = []
        self._methods = []
        for m in methods:
            if m is None:
                self._method_names.append(None)
                self._methods.append(None)
            else:
                self._methods.append(
                    edge_ops.resolve(m, edge_ops.EDGE_TRANSFORMER_METHODS)
                )
                # canonical casing
                self._method_names.append(
                    next(
                        k
                        for k in edge_ops.EDGE_TRANSFORMER_METHODS
                        if k.lower() == m.lower()
                    )
                )
        self._node_transformer = NodeTransformer(aligned_mapping=aligned_mapping)

    @property
    def method_names(self) -> List[Optional[str]]:
        return self._method_names

    def fit(self, node_feature) -> "EdgeTransformer":
        self._node_transformer.fit(node_feature)
        return self

    def transform(
        self,
        sources: np.ndarray,
        destinations: np.ndarray,
        edge_type_features: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        src_emb = self._node_transformer.transform(np.asarray(sources))
        dst_emb = self._node_transformer.transform(np.asarray(destinations))
        outs = []
        for fn in self._methods:
            if fn is None:
                # method None => raw (src, dst) id tuples (reference behavior)
                outs.append(
                    np.stack(
                        [np.asarray(sources), np.asarray(destinations)], axis=1
                    ).astype(np.float32)
                )
            else:
                outs.append(np.asarray(fn(src_emb, dst_emb), dtype=np.float32))
        out = np.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        if edge_type_features is not None:
            out = np.concatenate(
                [out, np.asarray(edge_type_features, np.float32)], axis=1
            )
        return out
