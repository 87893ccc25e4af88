"""GloVe over walk co-occurrences + Node2Vec/DeepWalk presets — reference
counterparts `ensmallen.models.GloVe` via
`embiggen/embedders/ensmallen_embedders/node2vec.py:16-26` (dispatch table).

True GloVe algorithm: (1) walks are generated on device, (2) windowed
co-occurrence counts are accumulated (sparse, via sorted-key reduction),
(3) the weighted-least-squares objective f(X)(wᵢ·cⱼ + bᵢ + bⱼ − log Xᵢⱼ)²
is minimized with minibatched SGD on device over the non-zero entries.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...graph.graph import Graph
from ...ops.walks import random_walks, skipgram_pairs
from ..abstract import AbstractEmbeddingModel
from ..embedding_result import EmbeddingResult
from ..registry import register_model


@register_model
class GloVe(AbstractEmbeddingModel):
    def __init__(
        self,
        embedding_size: int = 100,
        epochs: int = 30,
        walk_length: int = 64,
        iterations: int = 4,
        window_size: int = 5,
        return_weight: float = 1.0,
        explore_weight: float = 1.0,
        change_node_type_weight: float = 1.0,
        change_edge_type_weight: float = 1.0,
        max_neighbours: Optional[int] = 100,
        learning_rate: float = 0.05,
        learning_rate_decay: float = 0.95,
        alpha: float = 0.75,
        x_max: float = 100.0,
        batch_size: int = 65536,
        random_state: int = 42,
        enable_cache: bool = False,
    ):
        self._epochs = epochs
        self._walk_length = walk_length
        self._iterations = iterations
        self._window_size = window_size
        self._return_weight = return_weight
        self._explore_weight = explore_weight
        self._change_node_type_weight = change_node_type_weight
        self._change_edge_type_weight = change_edge_type_weight
        self._max_neighbours = max_neighbours
        self._learning_rate = learning_rate
        self._learning_rate_decay = learning_rate_decay
        self._alpha = alpha
        self._x_max = x_max
        self._batch_size = batch_size
        super().__init__(
            embedding_size=embedding_size, enable_cache=enable_cache,
            random_state=random_state,
        )

    @classmethod
    def model_name(cls) -> str:
        return "Node2Vec GloVe"

    def parameters(self) -> Dict[str, Any]:
        return {
            **super().parameters(),
            "epochs": self._epochs,
            "walk_length": self._walk_length,
            "iterations": self._iterations,
            "window_size": self._window_size,
            "return_weight": self._return_weight,
            "explore_weight": self._explore_weight,
            "change_node_type_weight": self._change_node_type_weight,
            "change_edge_type_weight": self._change_edge_type_weight,
            "max_neighbours": self._max_neighbours,
            "learning_rate": self._learning_rate,
            "learning_rate_decay": self._learning_rate_decay,
            "alpha": self._alpha,
            "x_max": self._x_max,
            "batch_size": self._batch_size,
        }

    @classmethod
    def smoke_test_parameters(cls) -> Dict[str, Any]:
        return {
            "embedding_size": 5, "epochs": 2, "walk_length": 8,
            "window_size": 2, "iterations": 1,
        }

    # ----------------------------------------------------------- co-occurrence
    def _cooccurrences(self, graph: Graph) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(centers, contexts, counts) with distance-decayed weights, from
        `iterations` walks per node."""
        typed = (
            self._change_node_type_weight != 1.0
            or self._change_edge_type_weight != 1.0
        )
        second_order = (
            self._return_weight != 1.0 or self._explore_weight != 1.0
            or typed
        )
        dg = graph.device(
            with_alias=graph.has_edge_weights,
            ell_cap=(self._max_neighbours or 100) if second_order else None,
            with_walk_types=typed,
            ell_seed=self.random_state or 0,
        )
        key = jax.random.PRNGKey(self.random_state or 0)
        n = graph.number_of_nodes
        starts = jnp.tile(
            jnp.arange(n, dtype=jnp.int32), self._iterations
        )
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
        keys = []
        weights = []
        v = graph.number_of_nodes
        for d in range(1, self._window_size + 1):
            a = walks[:, :-d].reshape(-1).astype(np.int64)
            b = walks[:, d:].reshape(-1).astype(np.int64)
            # symmetric pairs, weight 1/d (GloVe distance decay)
            keys.append(a * v + b)
            keys.append(b * v + a)
            w = np.full(len(a), 1.0 / d, dtype=np.float64)
            weights.append(w)
            weights.append(w)
        keys = np.concatenate(keys)
        weights = np.concatenate(weights)
        order = np.argsort(keys, kind="stable")
        keys, weights = keys[order], weights[order]
        uniq, start_idx = np.unique(keys, return_index=True)
        sums = np.add.reduceat(weights, start_idx)
        centers = (uniq // v).astype(np.int32)
        contexts = (uniq % v).astype(np.int32)
        keep = centers != contexts
        return centers[keep], contexts[keep], sums[keep].astype(np.float32)

    def _fit_transform(self, graph: Graph) -> EmbeddingResult:
        centers, contexts, counts = self._cooccurrences(graph)
        n, d = graph.number_of_nodes, self.embedding_size
        key = jax.random.PRNGKey(self.random_state or 0)
        k1, k2 = jax.random.split(key)
        params = {
            "node_embedding": jax.random.normal(k1, (n, d), jnp.float32)
            / np.sqrt(d),
            "context_embedding": jax.random.normal(k2, (n, d), jnp.float32)
            / np.sqrt(d),
            "center_bias": jnp.zeros((n,), jnp.float32),
            "context_bias": jnp.zeros((n,), jnp.float32),
        }
        n_entries = len(centers)
        ci = jnp.asarray(centers)
        cj = jnp.asarray(contexts)
        log_x = jnp.asarray(np.log(np.maximum(counts, 1e-9)))
        f_x = jnp.asarray(
            np.minimum(1.0, (counts / self._x_max) ** self._alpha).astype(
                np.float32
            )
        )
        batch = min(self._batch_size, n_entries)
        steps = max(1, n_entries // batch)

        # Co-occurrence arrays ride the jit ARGUMENT path — closed-over jax
        # arrays lower as inline HLO constants (GBs at large-graph entry
        # counts, which stalls/kills remote compile backends).
        @functools.partial(jax.jit, donate_argnums=0)
        def epoch_fn(params, epoch_key, lr, ci, cj, f_x, log_x):
            def body(params, k):
                idx = jax.random.randint(k, (batch,), 0, n_entries)
                i, j = ci[idx], cj[idx]

                def loss_fn(w, c, bw, bc):
                    pred = jnp.sum(w * c, axis=1) + bw + bc
                    return (f_x[idx] * (pred - log_x[idx]) ** 2).mean()

                loss, (gw, gc, gbw, gbc) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2, 3)
                )(
                    params["node_embedding"][i],
                    params["context_embedding"][j],
                    params["center_bias"][i],
                    params["context_bias"][j],
                )
                params = {
                    "node_embedding": params["node_embedding"].at[i].add(
                        -lr * gw
                    ),
                    "context_embedding": params["context_embedding"].at[j].add(
                        -lr * gc
                    ),
                    "center_bias": params["center_bias"].at[i].add(-lr * gbw),
                    "context_bias": params["context_bias"].at[j].add(-lr * gbc),
                }
                return params, loss

            params, losses = lax.scan(
                body, params, jax.random.split(epoch_key, steps)
            )
            return params, losses.mean()

        last = None
        for epoch in range(self._epochs):
            lr = jnp.float32(
                self._learning_rate * self._learning_rate_decay ** epoch
            )
            params, last = epoch_fn(
                params, jax.random.fold_in(key, epoch), lr, ci, cj, f_x, log_x
            )
        self._last_loss = None if last is None else float(last)
        return EmbeddingResult(
            embedding_method_name=self.model_name(),
            node_embeddings=[
                params["node_embedding"], params["context_embedding"]
            ],
            node_names=graph.get_node_names(),
        )


@register_model
class DeepWalkGloVe(GloVe):
    """GloVe on first-order walks (reference `DeepWalkGloVeEnsmallen`)."""

    @classmethod
    def model_name(cls) -> str:
        return "DeepWalk GloVe"

    def __init__(self, **kwargs):
        for forbidden in ("return_weight", "explore_weight"):
            if forbidden in kwargs:
                raise ValueError(
                    f"{type(self).__name__} does not accept {forbidden!r}."
                )
        super().__init__(return_weight=1.0, explore_weight=1.0, **kwargs)

    def parameters(self):
        p = super().parameters()
        p.pop("return_weight", None)
        p.pop("explore_weight", None)
        return p
