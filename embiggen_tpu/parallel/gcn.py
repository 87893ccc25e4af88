"""Multi-chip GCN edge-prediction training step over a node-sharded feature
matrix (SURVEY §7 step 7). The convolution runs through the halo-exchange
SpMM (`parallel.halo`), so per-layer communication is ∝ boundary nodes; the
dense layer weights are replicated and the edge head gathers src/dst rows
from the sharded representations (XLA inserts the collective). Gradients
w.r.t. replicated parameters are reduced by XLA's sharding propagation —
no hand-written all-reduce.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.graph import DeviceGraph
from ..ops.negatives import edge_prediction_mini_batch
from .halo import HaloPartition, halo_spmm


def init_sharded_gcn_params(
    key, in_dim: int, units: Sequence[int], mesh: Mesh
) -> dict:
    """Replicated conv + head parameters (features stay sharded; weights are
    small and live everywhere)."""
    params = {"conv": [], "head": None}
    dims = [in_dim] + list(units)
    for i in range(len(units)):
        key, sub = jax.random.split(key)
        lim = float(np.sqrt(6.0 / (dims[i] + dims[i + 1])))
        params["conv"].append(
            {
                "w": jax.random.uniform(
                    sub, (dims[i], dims[i + 1]), jnp.float32, -lim, lim
                ),
                "b": jnp.zeros((dims[i + 1],), jnp.float32),
            }
        )
    key, sub = jax.random.split(key)
    params["head"] = {
        "w": jax.random.normal(sub, (dims[-1],), jnp.float32)
        / np.sqrt(dims[-1]),
        "b": jnp.zeros((), jnp.float32),
    }
    replicated = NamedSharding(mesh, P())
    return jax.device_put(params, replicated)


def make_sharded_gcn_edge_step(
    mesh: Mesh,
    axis: str,
    part: HaloPartition,
    x_sharded: jnp.ndarray,
    dg: DeviceGraph,
    units: Sequence[int],
    batch_size: int = 256,
    combiner: str = "sum",
    learning_rate: float = 0.01,
):
    """Returns (params_init_fn, step): one full edge-prediction training
    step — halo-SpMM convolution over the node-sharded features, on-device
    edge minibatch (scale-free negatives), Hadamard edge head, BCE, SGD."""

    def encode(params, part, x):
        h = x
        for layer in params["conv"]:
            h = halo_spmm(mesh, axis, part, h, combiner)
            h = jax.nn.relu(h @ layer["w"] + layer["b"])
        return h

    optimizer = optax.sgd(learning_rate)

    def loss_fn(params, part, x, dg, key):
        h = encode(params, part, x)
        src, dst, labels = edge_prediction_mini_batch(
            dg, key, batch_size,
            negative_samples_rate=0.5, use_scale_free_distribution=True,
        )
        e = h[src] * h[dst]
        logits = e @ params["head"]["w"] + params["head"]["b"]
        return (jax.nn.softplus(logits) - labels * logits).mean()

    # Graph-sized arrays ride the jit ARGUMENT path via functools.partial
    # (closure capture would lower them as inline HLO constants).
    @jax.jit
    def _step(part, x, dg, params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, part, x, dg, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = functools.partial(_step, part, x_sharded, dg)

    def init(key):
        params = init_sharded_gcn_params(
            key, x_sharded.shape[1], units, mesh
        )
        return params, optimizer.init(params)

    return init, step
