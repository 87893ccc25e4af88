"""Node-label prediction GCNs — reference counterparts:
`embiggen/node_label_prediction/node_label_prediction_tensorflow/{gcn,kipf_gcn,
graph_sage,gnn}.py` (Kipf GCN kernel choice at `kipf_gcn.py:110`, GraphSAGE at
`graph_sage.py:109`, GNN kernel-free at `gnn.py:90`).

Full-graph training (the reference forces batch = n_nodes whenever conv layers
exist, `abstract_gcn.py:452-456`) with masked cross-entropy over known-label
nodes, optional class weights, early stopping / LR plateau / NaN guard.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...graph.graph import Graph
from ..node_label_prediction.model import AbstractNodeLabelPredictionModel
from ..registry import register_model
from .core import (
    GCNEncoder,
    graph_fingerprint,
    StaticFeatureSpec,
    TrainLoop,
    apply_mlp,
    assemble_node_features,
    init_mlp,
)


class GCNNodeLabelPrediction(AbstractNodeLabelPredictionModel):
    """Configurable GCN for node-label prediction (the reference's
    "Everything Bagel GCN")."""

    DEFAULT_KERNELS = ["Symmetric Normalized Laplacian"]

    def __init__(
        self,
        kernels: Optional[Sequence[str]] = None,
        units: Sequence[int] = (128, 128),
        head_units: Sequence[int] = (128,),
        combiner: str = "sum",
        dropout_rate: float = 0.5,
        residual: bool = False,
        use_class_weights: bool = True,
        use_node_embedding: bool = False,
        node_embedding_size: int = 50,
        use_node_type_embedding: bool = False,
        node_type_embedding_size: int = 50,
        epochs: int = 200,
        learning_rate: float = 0.01,
        early_stopping_patience: int = 20,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_interval: int = 10,
        handling_multi_graph: str = "warn",
        random_state: int = 42,
    ):
        # `mesh`: multi-chip fit via node-partitioned halo-exchange SpMM
        # (see _EdgeGCNBase); seeded sharded fits match single-chip fits.
        self._mesh = mesh
        self._handling_multi_graph = handling_multi_graph
        self._kernels = (
            list(kernels) if kernels is not None else list(self.DEFAULT_KERNELS)
        )
        self._units = list(units)
        self._head_units = list(head_units)
        self._combiner = combiner
        self._dropout_rate = dropout_rate
        self._residual = residual
        self._use_class_weights = use_class_weights
        self._use_node_embedding = use_node_embedding
        self._node_embedding_size = node_embedding_size
        self._use_node_type_embedding = use_node_type_embedding
        self._node_type_embedding_size = node_type_embedding_size
        self._epochs = epochs
        self._learning_rate = learning_rate
        self._early_stopping_patience = early_stopping_patience
        self._checkpoint_dir = checkpoint_dir
        self._checkpoint_interval = checkpoint_interval
        super().__init__(random_state=random_state)

    # ------------------------------------------------------------------ naming
    @classmethod
    def task_name(cls) -> str:
        return "Node Label Prediction"

    @classmethod
    def model_name(cls) -> str:
        return "Everything Bagel GCN"

    @classmethod
    def requires_node_types(cls) -> bool:
        return True

    def parameters(self) -> Dict[str, Any]:
        mesh = self._mesh
        if mesh is not None and not isinstance(mesh, (int, str)):
            mesh = int(np.prod(list(mesh.devices.shape)))
        return {
            **super().parameters(),
            "mesh": mesh,
            "kernels": self._kernels,
            "units": self._units,
            "head_units": self._head_units,
            "combiner": self._combiner,
            "dropout_rate": self._dropout_rate,
            "residual": self._residual,
            "use_class_weights": self._use_class_weights,
            "use_node_embedding": self._use_node_embedding,
            "node_embedding_size": self._node_embedding_size,
            "use_node_type_embedding": self._use_node_type_embedding,
            "node_type_embedding_size": self._node_type_embedding_size,
            "epochs": self._epochs,
            "learning_rate": self._learning_rate,
            "early_stopping_patience": self._early_stopping_patience,
            "checkpoint_dir": self._checkpoint_dir,
            "checkpoint_interval": self._checkpoint_interval,
            "handling_multi_graph": self._handling_multi_graph,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"units": [8], "head_units": [8], "epochs": 5}

    def is_multilabel_prediction_task(self) -> bool:
        return self._multilabel

    def is_binary_prediction_task(self) -> bool:
        return self._n_classes == 2 and not self._multilabel

    # ------------------------------------------------------------------ fitting
    def _fit(self, graph: Graph, support: Graph, node_features, **kwargs):
        key = jax.random.PRNGKey(self.random_state or 0)
        self._multilabel = graph.has_multilabel_node_types()
        self._n_classes = graph.number_of_node_types

        from ...parallel.mesh import resolve_mesh

        self._resolved_mesh = resolve_mesh(self._mesh, axis="nodes")
        self._encoder = GCNEncoder(
            self._kernels if self._units else None,
            self._units,
            combiner=self._combiner,
            dropout_rate=self._dropout_rate,
            residual=self._residual,
            handling_multi_graph=self._handling_multi_graph,
        )
        if self._resolved_mesh is not None:
            self._encoder.enable_halo(
                self._resolved_mesh, self._resolved_mesh.axis_names[0]
            )
        kernels = self._encoder.build_kernels(support)
        self._kernels_coo = kernels

        key, k_feat, k_enc, k_head = jax.random.split(key, 4)
        embed_params, spec = assemble_node_features(
            graph,
            node_features,
            self._use_node_embedding,
            self._node_embedding_size,
            # A GCN with no features at all needs a learned embedding.
            self._use_node_type_embedding,
            self._node_type_embedding_size,
            k_feat,
        )
        if spec.dim(embed_params) == 0:
            self._use_node_embedding = True
            embed_params, spec = assemble_node_features(
                graph, node_features, True, self._node_embedding_size,
                self._use_node_type_embedding, self._node_type_embedding_size,
                k_feat,
            )
        self._spec = spec

        in_dim = spec.dim(embed_params)
        enc_params = self._encoder.init(k_enc, in_dim)
        rep_dim = self._encoder.output_dim(in_dim)
        head_params = init_mlp(
            k_head, [rep_dim] + self._head_units + [self._n_classes]
        )
        params = {"embed": embed_params, "enc": enc_params, "head": head_params}
        if self._resolved_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            params = jax.device_put(
                params, NamedSharding(self._resolved_mesh, P())
            )

        # Targets and masks.
        if self._multilabel:
            y = jnp.asarray(graph.get_one_hot_encoded_node_types())
        else:
            y = jnp.asarray(
                np.maximum(graph.get_single_label_node_type_ids(), 0), jnp.int32
            )
        mask = jnp.asarray(graph.get_known_node_types_mask())
        if self._use_class_weights and not self._multilabel:
            counts = np.bincount(
                np.asarray(y)[np.asarray(mask)], minlength=self._n_classes
            ).astype(np.float64)
            weights = counts.sum() / np.maximum(counts * self._n_classes, 1)
            class_w = jnp.asarray(weights, jnp.float32)
        else:
            class_w = jnp.ones((max(self._n_classes, 1),), jnp.float32)

        n_nodes = graph.number_of_nodes
        encoder = self._encoder
        multilabel = self._multilabel

        def loss_fn(params, k, data):
            x = spec.materialize(params["embed"], static=data["x_static"])
            h = encoder.apply(
                params["enc"], data["kernels"], x, n_nodes,
                training=True, key=k,
            )
            logits = apply_mlp(params["head"], h)
            yd = data["y"]
            if multilabel:
                per = (
                    jax.nn.softplus(logits) - yd * logits
                ).sum(axis=1)
            else:
                logp = jax.nn.log_softmax(logits, axis=1)
                per = -jnp.take_along_axis(logp, yd[:, None], axis=1)[:, 0]
                per = per * data["class_w"][yd]
            per = jnp.where(data["mask"], per, 0.0)
            return per.sum() / jnp.maximum(data["mask"].sum(), 1)

        loop = TrainLoop(
            epochs=self._epochs,
            learning_rate=self._learning_rate,
            early_stopping_patience=self._early_stopping_patience,
            checkpoint_dir=self._checkpoint_dir,
            checkpoint_interval=self._checkpoint_interval,
        )
        # Graph-sized arrays ride the jit ARGUMENT path (see TrainLoop.run).
        data = {
            "kernels": kernels, "x_static": spec.static,
            "y": y, "mask": mask, "class_w": class_w,
        }
        self._params, self._history = loop.run(
            params, jax.value_and_grad(loss_fn), key,
            fingerprint=graph_fingerprint(graph, mask, y),
            data=data,
        )
        self._epoch_seconds = list(loop.epoch_seconds)

    def _predict_proba(self, graph: Graph, support: Optional[Graph] = None,
                       **kwargs) -> np.ndarray:
        kernels = (
            self._encoder.build_kernels(support)
            if support is not None
            else self._kernels_coo
        )
        x = self._spec.materialize(self._params["embed"])
        h = self._encoder.apply(
            self._params["enc"], kernels, x, graph.number_of_nodes
        )
        logits = apply_mlp(self._params["head"], h)
        if self._multilabel:
            return np.asarray(jax.nn.sigmoid(logits))
        return np.asarray(jax.nn.softmax(logits, axis=1))


@register_model
class KipfGCNNodeLabelPrediction(GCNNodeLabelPrediction):
    """Kipf & Welling GCN: symmetric-normalized kernel (reference
    `node_label_prediction_tensorflow/kipf_gcn.py:110`)."""

    DEFAULT_KERNELS = ["Symmetric Normalized Laplacian"]

    @classmethod
    def model_name(cls) -> str:
        return "Kipf GCN"

    def __init__(self, **kwargs):
        kwargs.pop("kernels", None)
        super().__init__(kernels=self.DEFAULT_KERNELS, **kwargs)

    def parameters(self):
        p = super().parameters()
        p.pop("kernels", None)
        return p


@register_model
class GraphSAGENodeLabelPrediction(GCNNodeLabelPrediction):
    """GraphSAGE-mean: left-normalized kernel (reference
    `graph_sage.py:109`)."""

    DEFAULT_KERNELS = ["Left Normalized Laplacian"]

    @classmethod
    def model_name(cls) -> str:
        return "GraphSAGE"

    def __init__(self, **kwargs):
        kwargs.pop("kernels", None)
        super().__init__(kernels=self.DEFAULT_KERNELS, **kwargs)

    def parameters(self):
        p = super().parameters()
        p.pop("kernels", None)
        return p


@register_model
class GNNNodeLabelPrediction(GCNNodeLabelPrediction):
    """Kernel-free model: embeddings + FFNN only (reference `gnn.py:90`)."""

    DEFAULT_KERNELS: List[str] = []

    @classmethod
    def model_name(cls) -> str:
        return "GNN"

    def __init__(self, **kwargs):
        kwargs.pop("kernels", None)
        kwargs.setdefault("use_node_embedding", True)
        super().__init__(kernels=[], units=(), **kwargs)

    def parameters(self):
        p = super().parameters()
        p.pop("kernels", None)
        p.pop("units", None)
        return p

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"head_units": [8], "epochs": 5}


# The reference registers the configurable GCN too.
register_model(GCNNodeLabelPrediction)
