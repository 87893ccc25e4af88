"""Walklets: multi-scale embeddings from stride-k walk pairs — reference
`ensmallen.models.Walklets{CBOW,SkipGram,GloVe}` via
`embiggen/embedders/ensmallen_embedders/node2vec.py:16-26`.

For each power p in 1..P, training pairs are walk positions exactly p apart
(capturing the p-hop scale); each power trains its own table of width
embedding_size // P and the result concatenates the scales.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...graph.graph import DeviceGraph, Graph
from ...ops import losses as L
from ...ops.negatives import negative_nodes_for_nce
from ...ops.walks import random_walks
from ..embedding_result import EmbeddingResult
from ..registry import register_model
from .walk_based import WalkBasedEmbedder


class _WalkletsBase(WalkBasedEmbedder):
    def __init__(self, power: int = 4, **kwargs):
        self._power = power
        kwargs.setdefault("window_size", 4)
        super().__init__(**kwargs)
        if self.embedding_size % power:
            raise ValueError(
                f"embedding_size ({self.embedding_size}) must be divisible "
                f"by power ({power})."
            )

    def parameters(self) -> Dict[str, Any]:
        return {**super().parameters(), "power": self._power}

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {
            "embedding_size": 4, "power": 2, "epochs": 1, "walk_length": 8,
            "window_size": 2, "batch_size": 32,
        }

    def _stride_pairs(
        self, walks: jnp.ndarray, p: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(words, contexts) at exact stride p, both directions."""
        a = walks[:, :-p].reshape(-1)
        b = walks[:, p:].reshape(-1)
        return (
            jnp.concatenate([a, b]),
            jnp.concatenate([b, a]),
        )

    def _init_params(self, graph: Graph, key: jnp.ndarray):
        n = graph.number_of_nodes
        sub = self.embedding_size // self._power
        k1, k2 = jax.random.split(key)
        scale = 1.0 / np.sqrt(sub)
        return {
            # [P, N, sub] stacked per-power tables
            "node_embedding": scale
            * jax.random.normal(k1, (self._power, n, sub), jnp.float32),
            "context_embedding": scale
            * jax.random.normal(k2, (self._power, n, sub), jnp.float32),
            "context_bias": jnp.zeros((self._power, n), jnp.float32),
        }

    def _walks(self, dg: DeviceGraph, key):
        k_start, k_walk = jax.random.split(key)
        starts = jax.random.randint(
            k_start, (self._run_batch(),), 0, dg.n_nodes, dtype=jnp.int32
        )
        starts = jnp.tile(starts, self._iterations)
        return random_walks(
            dg, starts, self._walk_length, k_walk,
            return_weight=self._return_weight,
            explore_weight=self._explore_weight,
            max_neighbours=self._max_neighbours,
            change_node_type_weight=self._change_node_type_weight,
            change_edge_type_weight=self._change_edge_type_weight,
        )

    def _extract(self, params, graph):
        p, n, sub = params["node_embedding"].shape
        node = np.asarray(params["node_embedding"]).transpose(1, 0, 2).reshape(
            n, p * sub
        )
        ctx = np.asarray(params["context_embedding"]).transpose(1, 0, 2).reshape(
            n, p * sub
        )
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[
                self._post_process(node, graph),
                self._post_process(ctx, graph),
            ],
            node_names=graph.get_node_names(),
        )


@register_model
class WalkletsSkipGram(_WalkletsBase):
    @classmethod
    def model_name(cls) -> str:
        return "Walklets SkipGram"

    def _step(self, dg, params, key, lr):
        k_walk, k_neg = jax.random.split(key)
        walks = self._walks(dg, k_walk)
        negs = negative_nodes_for_nce(
            dg, k_neg, self._number_of_negative_samples,
            self._use_scale_free_distribution,
        )
        total = 0.0
        sub = self.embedding_size // self._power
        for p_idx in range(self._power):
            words, contexts = self._stride_pairs(walks, p_idx + 1)
            emb = params["node_embedding"][p_idx]
            ctx = params["context_embedding"][p_idx]
            bias = params["context_bias"][p_idx]

            def loss_fn(w, c, pb, nc, nb):
                return L.nce_loss(w, c[:, None, :], pb[:, None], nc, nb)

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                emb[words], ctx[contexts], bias[contexts], ctx[negs], bias[negs]
            )
            g_w, g_c, g_pb, g_nc, g_nb = grads
            params["node_embedding"] = (
                params["node_embedding"]
                .at[p_idx, words].add(-lr * g_w)
            )
            params["context_embedding"] = (
                params["context_embedding"]
                .at[p_idx, contexts].add(-lr * g_c)
                .at[p_idx, negs].add(-lr * g_nc)
            )
            params["context_bias"] = (
                params["context_bias"]
                .at[p_idx, contexts].add(-lr * g_pb)
                .at[p_idx, negs].add(-lr * g_nb)
            )
            total = total + loss
        return params, total / self._power


@register_model
class WalkletsCBOW(_WalkletsBase):
    """CBOW at each scale: the stride-p 'context' is the single node p hops
    away (degenerate context of size 1 per side)."""

    @classmethod
    def model_name(cls) -> str:
        return "Walklets CBOW"

    def _step(self, dg, params, key, lr):
        k_walk, k_neg = jax.random.split(key)
        walks = self._walks(dg, k_walk)
        negs = negative_nodes_for_nce(
            dg, k_neg, self._number_of_negative_samples,
            self._use_scale_free_distribution,
        )
        total = 0.0
        for p_idx in range(self._power):
            words, contexts = self._stride_pairs(walks, p_idx + 1)
            emb = params["node_embedding"][p_idx]
            out = params["context_embedding"][p_idx]
            bias = params["context_bias"][p_idx]

            def loss_fn(c_emb, t_emb, t_b, n_emb, n_b):
                return L.sampled_softmax_loss(c_emb, t_emb, t_b, n_emb, n_b)

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                emb[contexts], out[words], bias[words], out[negs], bias[negs]
            )
            g_c, g_t, g_tb, g_n, g_nb = grads
            params["node_embedding"] = (
                params["node_embedding"].at[p_idx, contexts].add(-lr * g_c)
            )
            params["context_embedding"] = (
                params["context_embedding"]
                .at[p_idx, words].add(-lr * g_t)
                .at[p_idx, negs].add(-lr * g_n)
            )
            params["context_bias"] = (
                params["context_bias"]
                .at[p_idx, words].add(-lr * g_tb)
                .at[p_idx, negs].add(-lr * g_nb)
            )
            total = total + loss
        return params, total / self._power


@register_model
class WalkletsGloVe(_WalkletsBase):
    """True GloVe WLS per scale: exact-stride co-occurrence counts are
    accumulated once from a walk corpus, then each power's table minimizes
    f(X)(w·c + b_w + b_c − log X)² over its own non-zero entries."""

    def __init__(self, alpha: float = 0.75, x_max: float = 100.0, **kwargs):
        self._alpha = alpha
        self._x_max = x_max
        super().__init__(**kwargs)

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(), "alpha": self._alpha, "x_max": self._x_max
        }

    @classmethod
    def model_name(cls) -> str:
        return "Walklets GloVe"

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        from jax import lax

        dg = self._device_graph(graph)
        key = jax.random.PRNGKey(self.random_state or 0)
        n = graph.number_of_nodes
        starts = jnp.tile(jnp.arange(n, dtype=jnp.int32), self._iterations)
        walks = np.asarray(
            random_walks(
                dg, starts, self._walk_length, key,
                return_weight=self._return_weight,
                explore_weight=self._explore_weight,
                max_neighbours=self._max_neighbours,
                change_node_type_weight=self._change_node_type_weight,
                change_edge_type_weight=self._change_edge_type_weight,
            )
        )
        params = self._init_params(graph, key)
        sub = self.embedding_size // self._power
        last = None
        for p_idx in range(self._power):
            stride = p_idx + 1
            a = walks[:, :-stride].reshape(-1).astype(np.int64)
            b = walks[:, stride:].reshape(-1).astype(np.int64)
            keys_np = np.concatenate([a * n + b, b * n + a])
            keys_np.sort(kind="stable")
            uniq, start_idx = np.unique(keys_np, return_index=True)
            counts = np.diff(np.concatenate([start_idx, [len(keys_np)]]))
            ci_np = (uniq // n).astype(np.int32)
            cj_np = (uniq % n).astype(np.int32)
            keep = ci_np != cj_np
            ci = jnp.asarray(ci_np[keep])
            cj = jnp.asarray(cj_np[keep])
            counts = counts[keep].astype(np.float32)
            log_x = jnp.asarray(np.log(np.maximum(counts, 1e-9)))
            f_x = jnp.asarray(
                np.minimum(1.0, (counts / self._x_max) ** self._alpha)
            )
            n_entries = len(counts)
            batch = min(4096, n_entries)
            steps = max(1, n_entries // batch)

            emb = params["node_embedding"][p_idx]
            ctx = params["context_embedding"][p_idx]
            bw_t = params["context_bias"][p_idx]
            bc_t = jnp.zeros_like(bw_t)

            # Co-occurrence arrays ride the jit ARGUMENT path: closed-over
            # jax arrays lower as inline HLO constants (GBs at scale).
            @jax.jit
            def epoch_fn(state, epoch_key, lr, ci, cj, f_x, log_x):
                def body(state, k):
                    emb, ctx, bw_t, bc_t = state
                    idx = jax.random.randint(k, (batch,), 0, n_entries)
                    i, j = ci[idx], cj[idx]

                    def loss_fn(w, c, bw, bc):
                        pred = jnp.sum(w * c, axis=1) + bw + bc
                        return (f_x[idx] * (pred - log_x[idx]) ** 2).mean()

                    loss, (gw, gc, gbw, gbc) = jax.value_and_grad(
                        loss_fn, argnums=(0, 1, 2, 3)
                    )(emb[i], ctx[j], bw_t[i], bc_t[j])
                    return (
                        emb.at[i].add(-lr * gw),
                        ctx.at[j].add(-lr * gc),
                        bw_t.at[i].add(-lr * gbw),
                        bc_t.at[j].add(-lr * gbc),
                    ), loss

                state, losses = lax.scan(
                    body, state, jax.random.split(epoch_key, steps)
                )
                return state, losses.mean()

            state = (emb, ctx, bw_t, bc_t)
            for epoch in range(self._epochs):
                lr = jnp.float32(
                    self._learning_rate * self._learning_rate_decay ** epoch
                )
                state, last = epoch_fn(
                    state, jax.random.fold_in(key, epoch * 131 + p_idx), lr,
                    ci, cj, f_x, log_x,
                )
            emb, ctx, bw_t, _ = state
            params["node_embedding"] = (
                params["node_embedding"].at[p_idx].set(emb)
            )
            params["context_embedding"] = (
                params["context_embedding"].at[p_idx].set(ctx)
            )
            params["context_bias"] = params["context_bias"].at[p_idx].set(bw_t)
        self._last_loss = None if last is None else float(last)
        return self._extract(params, graph)
