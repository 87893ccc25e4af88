"""First/second-order LINE — reference counterparts:
`embiggen/embedders/tensorflow_embedders/{first_order_line,second_order_line}.py`
and `ensmallen_embedders/{first_order_line,second_order_line}.py:67-80`
(avoid_false_negatives, scale-free negatives).

Edge-batch BCE with per-positive corrupted negatives; sampling, loss and
sparse update fused in one jitted step, epochs scanned on device.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...graph.graph import DeviceGraph, Graph
from ...ops.negatives import (
    sample_nodes_scale_free,
    sample_nodes_uniform,
    sample_positive_arcs,
)
from ..abstract import AbstractEmbeddingModel
from ..embedding_result import EmbeddingResult
from ..registry import register_model
from .walk_based import _mean_scatter, _st_clip


class _LINEBase(AbstractEmbeddingModel):
    def __init__(
        self,
        embedding_size: int = 100,
        epochs: int = 30,
        batch_size: Optional[int] = None,
        number_of_negative_samples: int = 5,
        learning_rate: float = 0.05,
        learning_rate_decay: float = 0.9,
        use_scale_free_distribution: bool = True,
        avoid_false_negatives: bool = False,
        clipping_value: float = 6.0,
        random_state: int = 42,
        enable_cache: bool = False,
    ):
        self._epochs = epochs
        self._batch_size = batch_size
        self._number_of_negative_samples = number_of_negative_samples
        self._learning_rate = learning_rate
        self._learning_rate_decay = learning_rate_decay
        self._use_scale_free_distribution = use_scale_free_distribution
        self._avoid_false_negatives = avoid_false_negatives
        self._clipping_value = clipping_value
        super().__init__(
            embedding_size=embedding_size, enable_cache=enable_cache,
            random_state=random_state,
        )

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "epochs": self._epochs,
            "batch_size": self._batch_size,
            "number_of_negative_samples": self._number_of_negative_samples,
            "learning_rate": self._learning_rate,
            "learning_rate_decay": self._learning_rate_decay,
            "use_scale_free_distribution": self._use_scale_free_distribution,
            "avoid_false_negatives": self._avoid_false_negatives,
            "clipping_value": self._clipping_value,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {"embedding_size": 5, "epochs": 2, "batch_size": 64}

    def _run_batch(self) -> int:
        b = getattr(self, "_run_batch_size", None)
        if b is not None:
            return b
        return self._batch_size if self._batch_size is not None else 1024

    def _sample_batch(self, dg: DeviceGraph, key):
        """(src [B], dst [B], neg [B, K]) — per-positive corrupted dsts."""
        k_arc, k_neg = jax.random.split(key)
        from ...ops.negatives import arc_sources

        arc = sample_positive_arcs(dg, k_arc, self._run_batch())
        src = arc_sources(dg, arc)
        dst = dg.col_idx[arc]
        shape = (self._run_batch(), self._number_of_negative_samples)
        if self._use_scale_free_distribution:
            neg = sample_nodes_scale_free(dg, k_neg, shape)
        else:
            neg = sample_nodes_uniform(dg, k_neg, shape)
        if self._avoid_false_negatives:
            from ...ops.walks import csr_has_edges

            bad = csr_has_edges(
                dg.row_ptr, dg.col_idx,
                jnp.broadcast_to(src[:, None], shape).reshape(-1),
                neg.reshape(-1),
            ).reshape(shape)
            k_res = jax.random.fold_in(k_neg, 1)
            resampled = (
                sample_nodes_scale_free(dg, k_res, shape)
                if self._use_scale_free_distribution
                else sample_nodes_uniform(dg, k_res, shape)
            )
            neg = jnp.where(bad, resampled, neg)
        return src, dst, neg

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        dg = graph.device(with_sources=True)
        key = jax.random.PRNGKey(self.random_state or 0)
        # batch_size=None auto-scales with the graph (see SiameseEmbedder).
        self._run_batch_size = self._batch_size or int(
            min(65536, max(1024, graph.number_of_directed_edges // 64))
        )
        params = self._init_params(graph, key)
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


@register_model
class FirstOrderLINE(_LINEBase):
    """LINE first order: sigmoid(u_i · u_j) over one embedding table
    (reference `first_order_line.py:15` / `:72`)."""

    @classmethod
    def model_name(cls) -> str:
        return "First-order LINE"

    def _init_params(self, graph: Graph, key):
        n, d = graph.number_of_nodes, self.embedding_size
        return {
            "node_embedding": jax.random.normal(key, (n, d), jnp.float32)
            / np.sqrt(d)
        }

    def _step(self, dg, params, key, lr):
        src, dst, neg = self._sample_batch(dg, key)
        emb = params["node_embedding"]

        clip = self._clipping_value

        def loss_fn(e_src, e_dst, e_neg):
            # SUM over the batch (per-sample SGD semantics, as in ensmallen's
            # Rust LINE trainer); logits straight-through-clipped at
            # ±clipping_value (see walk_based._st_clip); the mean-scatter
            # below averages per-row accumulation. Reported loss is the mean.
            pos_logit = _st_clip(jnp.sum(e_src * e_dst, axis=1), clip)
            neg_logit = _st_clip(
                jnp.einsum("bd,bkd->bk", e_src, e_neg), clip
            )
            return (
                jax.nn.softplus(-pos_logit).sum()
                + jax.nn.softplus(neg_logit).sum()
            )

        loss, (g_s, g_d, g_n) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            emb[src], emb[dst], emb[neg]
        )
        d = self.embedding_size
        # One mean-accumulated full-lr step per touched row per batch (same
        # scatter policy as the walk embedders — see walk_based._mean_scatter).
        idx = jnp.concatenate([src, dst, neg.reshape(-1)])
        g_all = jnp.concatenate([g_s, g_d, g_n.reshape(-1, d)])
        params["node_embedding"], _ = _mean_scatter(emb, idx, g_all, lr)
        return params, loss / len(src)

    def _extract(self, params, graph):
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[params["node_embedding"]],
            node_names=graph.get_node_names(),
        )


@register_model
class SecondOrderLINE(_LINEBase):
    """LINE second order: sigmoid(u_i · c_j) with a separate context table
    (reference `second_order_line.py:16` / `:67-80`)."""

    @classmethod
    def model_name(cls) -> str:
        return "Second-order LINE"

    def _init_params(self, graph: Graph, key):
        n, d = graph.number_of_nodes, self.embedding_size
        k1, k2 = jax.random.split(key)
        return {
            "node_embedding": jax.random.normal(k1, (n, d), jnp.float32)
            / np.sqrt(d),
            "context_embedding": jax.random.normal(k2, (n, d), jnp.float32)
            / np.sqrt(d),
        }

    def _step(self, dg, params, key, lr):
        src, dst, neg = self._sample_batch(dg, key)
        emb, ctx = params["node_embedding"], params["context_embedding"]

        clip = self._clipping_value

        def loss_fn(e_src, c_dst, c_neg):
            # SUM over the batch — see FirstOrderLINE.loss_fn.
            pos_logit = _st_clip(jnp.sum(e_src * c_dst, axis=1), clip)
            neg_logit = _st_clip(
                jnp.einsum("bd,bkd->bk", e_src, c_neg), clip
            )
            return (
                jax.nn.softplus(-pos_logit).sum()
                + jax.nn.softplus(neg_logit).sum()
            )

        loss, (g_s, g_d, g_n) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            emb[src], ctx[dst], ctx[neg]
        )
        d = self.embedding_size
        params["node_embedding"], _ = _mean_scatter(emb, src, g_s, lr)
        idx = jnp.concatenate([dst, neg.reshape(-1)])
        g_all = jnp.concatenate([g_d, g_n.reshape(-1, d)])
        params["context_embedding"], _ = _mean_scatter(ctx, idx, g_all, lr)
        return params, loss / len(src)

    def _extract(self, params, graph):
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[
                params["node_embedding"], params["context_embedding"]
            ],
            node_names=graph.get_node_names(),
        )
