"""Siamese / triple-based embedders: TransE, Unstructured, Structured
Embedding — reference counterparts:
`embiggen/embedders/tensorflow_embedders/{siamese,transe,unstructured,
structured_embedding}.py` (margin loss `siamese.py:149-168`) and
`ensmallen_embedders/{siamese_model,transe}.py:12-79` (relu_bias = margin,
scale-free corruption, lr decay).

Each step draws corrupted triples on-device (`siamese_mini_batch`), computes
the margin loss on gathered rows and scatter-updates the tables.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...graph.graph import DeviceGraph, Graph
from ...ops.losses import l1_distance, margin_loss, squared_l2_distance
from ...ops.negatives import siamese_mini_batch
from ..abstract import AbstractEmbeddingModel
from ..embedding_result import EmbeddingResult
from ..registry import register_model


class SiameseEmbedder(AbstractEmbeddingModel):
    """Shared skeleton: margin loss over (pos, corrupted) pairs."""

    NORM = "L2"  # or L1

    def __init__(
        self,
        embedding_size: int = 100,
        epochs: int = 30,
        batch_size: Optional[int] = None,
        relu_bias: float = 1.0,
        learning_rate: float = 0.05,
        learning_rate_decay: float = 0.9,
        use_scale_free_distribution: bool = True,
        random_state: int = 42,
        enable_cache: bool = False,
    ):
        self._epochs = epochs
        self._batch_size = batch_size
        self._relu_bias = relu_bias
        self._learning_rate = learning_rate
        self._learning_rate_decay = learning_rate_decay
        self._use_scale_free_distribution = use_scale_free_distribution
        super().__init__(
            embedding_size=embedding_size, enable_cache=enable_cache,
            random_state=random_state,
        )

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "epochs": self._epochs,
            "batch_size": self._batch_size,
            "relu_bias": self._relu_bias,
            "learning_rate": self._learning_rate,
            "learning_rate_decay": self._learning_rate_decay,
            "use_scale_free_distribution": self._use_scale_free_distribution,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"embedding_size": 5, "epochs": 2, "batch_size": 64}

    def _uses_edge_types(self) -> bool:
        return False

    def _distance(self, a, b):
        if self.NORM == "L1":
            return l1_distance(a, b)
        return squared_l2_distance(a, b)

    def _run_batch(self) -> int:
        """Triple batch in effect (set by `_fit_transform`; constructor
        value or 1024 when stepping outside a fit)."""
        b = getattr(self, "_run_batch_size", None)
        if b is not None:
            return b
        return self._batch_size if self._batch_size is not None else 1024

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        if self._uses_edge_types() and not graph.has_edge_types:
            raise ValueError(
                f"{self.model_name()} requires edge types; graph "
                f"{graph.name} has none."
            )
        dg = graph.device(with_sources=True)
        key = jax.random.PRNGKey(self.random_state or 0)
        params = self._init_params(graph, key)
        # batch_size=None auto-scales triples-per-step with the graph: a
        # fixed 1k-triple batch leaves the chip ~idle at millions of arcs
        # (same rationale as the walker batch; epochs still cover E arcs).
        self._run_batch_size = self._batch_size or int(
            min(65536, max(1024, graph.number_of_directed_edges // 64))
        )
        steps_per_epoch = max(
            1, graph.number_of_directed_edges // self._run_batch_size
        )
        step_fn = self._step

        @functools.partial(jax.jit, donate_argnums=1)
        def epoch_fn(dg, params, epoch_key, lr):
            keys = jax.random.split(epoch_key, steps_per_epoch)
            params, losses = lax.scan(
                lambda p, k: step_fn(dg, p, k, lr), params, keys
            )
            return params, losses.mean()

        last = None
        for epoch in range(self._epochs):
            lr = jnp.float32(
                self._learning_rate * self._learning_rate_decay ** epoch
            )
            params, last = epoch_fn(
                dg, params, jax.random.fold_in(key, epoch), lr
            )
        self._last_loss = None if last is None else float(last)
        return self._extract(params, graph)

    def _sample(self, dg, key):
        return siamese_mini_batch(
            dg, key, self._run_batch(),
            use_scale_free_distribution=self._use_scale_free_distribution,
            with_edge_types=self._uses_edge_types(),
        )


@register_model
class Unstructured(SiameseEmbedder):
    """Margin loss on plain node distances, no relation parameters
    (reference `unstructured.py:10`)."""

    @classmethod
    def model_name(cls) -> str:
        return "Unstructured"

    def _init_params(self, graph: Graph, key):
        n, d = graph.number_of_nodes, self.embedding_size
        return {
            "node_embedding": jax.random.normal(key, (n, d), jnp.float32)
            / np.sqrt(d)
        }

    def _step(self, dg, params, key, lr):
        src, dst, csrc, cdst = self._sample(dg, key)
        emb = params["node_embedding"]
        bias = self._relu_bias
        dist = self._distance

        def loss_fn(e_s, e_d, e_cs, e_cd):
            return margin_loss(dist(e_s, e_d), dist(e_cs, e_cd), bias)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            emb[src], emb[dst], emb[csrc], emb[cdst]
        )
        for idx, g in zip((src, dst, csrc, cdst), grads):
            emb = emb.at[idx].add(-lr * g)
        params["node_embedding"] = emb
        return params, loss

    def _extract(self, params, graph):
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[params["node_embedding"]],
            node_names=graph.get_node_names(),
        )


@register_model
class TransE(SiameseEmbedder):
    """Translation model: d(h + r, t) margin loss (reference `transe.py:11`
    TF / `transe.py:12-79` ensmallen)."""

    @classmethod
    def model_name(cls) -> str:
        return "TransE"

    @classmethod
    def requires_edge_types(cls) -> bool:
        return True

    def _uses_edge_types(self) -> bool:
        return True

    def _init_params(self, graph: Graph, key):
        n, d = graph.number_of_nodes, self.embedding_size
        r = max(graph.number_of_edge_types, 1)
        k1, k2 = jax.random.split(key)
        return {
            "node_embedding": jax.random.normal(k1, (n, d), jnp.float32)
            / np.sqrt(d),
            "edge_type_embedding": jax.random.normal(k2, (r, d), jnp.float32)
            / np.sqrt(d),
        }

    def _step(self, dg, params, key, lr):
        src, dst, csrc, cdst, etype = self._sample(dg, key)
        emb = params["node_embedding"]
        rel = params["edge_type_embedding"]
        bias = self._relu_bias
        dist = self._distance

        def loss_fn(e_s, e_d, e_cs, e_cd, e_r):
            return margin_loss(
                dist(e_s + e_r, e_d), dist(e_cs + e_r, e_cd), bias
            )

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            emb[src], emb[dst], emb[csrc], emb[cdst], rel[etype]
        )
        for idx, g in zip((src, dst, csrc, cdst), grads[:4]):
            emb = emb.at[idx].add(-lr * g)
        params["node_embedding"] = emb
        params["edge_type_embedding"] = rel.at[etype].add(-lr * grads[4])
        return params, loss

    def _extract(self, params, graph):
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[params["node_embedding"]],
            edge_type_embeddings=[params["edge_type_embedding"]],
            node_names=graph.get_node_names(),
        )


@register_model
class StructuredEmbedding(SiameseEmbedder):
    """Relation-specific projections: d(W_h^r h, W_t^r t) margin loss
    (reference `structured_embedding.py:12`)."""

    NORM = "L1"

    @classmethod
    def model_name(cls) -> str:
        return "Structured Embedding"

    @classmethod
    def requires_edge_types(cls) -> bool:
        return True

    def _uses_edge_types(self) -> bool:
        return True

    def _init_params(self, graph: Graph, key):
        n, d = graph.number_of_nodes, self.embedding_size
        r = max(graph.number_of_edge_types, 1)
        k1, k2, k3 = jax.random.split(key, 3)
        eye = jnp.eye(d, dtype=jnp.float32)
        noise = 0.1 / np.sqrt(d)
        return {
            "node_embedding": jax.random.normal(k1, (n, d), jnp.float32)
            / np.sqrt(d),
            "source_projection": eye[None]
            + noise * jax.random.normal(k2, (r, d, d), jnp.float32),
            "destination_projection": eye[None]
            + noise * jax.random.normal(k3, (r, d, d), jnp.float32),
        }

    def _step(self, dg, params, key, lr):
        src, dst, csrc, cdst, etype = self._sample(dg, key)
        emb = params["node_embedding"]
        w_h = params["source_projection"]
        w_t = params["destination_projection"]
        bias = self._relu_bias
        dist = self._distance

        def loss_fn(e_s, e_d, e_cs, e_cd, p_h, p_t):
            proj = lambda p, e: jnp.einsum("bij,bj->bi", p, e)
            return margin_loss(
                dist(proj(p_h, e_s), proj(p_t, e_d)),
                dist(proj(p_h, e_cs), proj(p_t, e_cd)),
                bias,
            )

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            emb[src], emb[dst], emb[csrc], emb[cdst], w_h[etype], w_t[etype]
        )
        for idx, g in zip((src, dst, csrc, cdst), grads[:4]):
            emb = emb.at[idx].add(-lr * g)
        params["node_embedding"] = emb
        params["source_projection"] = w_h.at[etype].add(-lr * grads[4])
        params["destination_projection"] = w_t.at[etype].add(-lr * grads[5])
        return params, loss

    def _extract(self, params, graph):
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[params["node_embedding"]],
            node_names=graph.get_node_names(),
        )


@register_model
class TransH(SiameseEmbedder):
    """TransH: translation on a relation-specific hyperplane —
    d(h - (w·h)w + r, t - (w·t)w) (reference `transh.py:12`)."""

    @classmethod
    def model_name(cls) -> str:
        return "TransH"

    @classmethod
    def requires_edge_types(cls) -> bool:
        return True

    def _uses_edge_types(self) -> bool:
        return True

    def _init_params(self, graph: Graph, key):
        n, d = graph.number_of_nodes, self.embedding_size
        r = max(graph.number_of_edge_types, 1)
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "node_embedding": jax.random.normal(k1, (n, d), jnp.float32)
            / np.sqrt(d),
            "edge_type_embedding": jax.random.normal(k2, (r, d), jnp.float32)
            / np.sqrt(d),
            "normal_vector": jax.random.normal(k3, (r, d), jnp.float32)
            / np.sqrt(d),
        }

    def _step(self, dg, params, key, lr):
        src, dst, csrc, cdst, etype = self._sample(dg, key)
        emb = params["node_embedding"]
        rel = params["edge_type_embedding"]
        nrm = params["normal_vector"]
        bias = self._relu_bias
        dist = self._distance

        def loss_fn(e_s, e_d, e_cs, e_cd, e_r, w):
            w = w / jnp.maximum(
                jnp.linalg.norm(w, axis=1, keepdims=True), 1e-9
            )
            prj = lambda e: e - jnp.sum(w * e, axis=1, keepdims=True) * w
            return margin_loss(
                dist(prj(e_s) + e_r, prj(e_d)),
                dist(prj(e_cs) + e_r, prj(e_cd)),
                bias,
            )

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            emb[src], emb[dst], emb[csrc], emb[cdst], rel[etype], nrm[etype]
        )
        for idx, g in zip((src, dst, csrc, cdst), grads[:4]):
            emb = emb.at[idx].add(-lr * g)
        params["node_embedding"] = emb
        params["edge_type_embedding"] = rel.at[etype].add(-lr * grads[4])
        params["normal_vector"] = nrm.at[etype].add(-lr * grads[5])
        return params, loss

    def _extract(self, params, graph):
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[params["node_embedding"]],
            edge_type_embeddings=[params["edge_type_embedding"]],
            node_names=graph.get_node_names(),
        )
