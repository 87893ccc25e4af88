"""Edge-partitioned SpMM under shard_map — the multi-chip graph-convolution
path (BASELINE.json north star: "graph edge-partitioned per host, boundary
node features exchanged ... overlapped with local aggregation").

Design: the COO kernel is partitioned by edges across the mesh axis; node
features are replicated; each device computes a partial segment-sum over its
edge shard and the partials are `psum`-reduced. XLA overlaps the reduction
with the surrounding computation; the halo-exchange variant (node-partitioned
features + all-to-all of boundary features) is the round-2 optimization once
graphs exceed single-chip feature storage.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def partition_coo(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, n_shards: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad the COO arrays to a multiple of n_shards (zero-weight self edges on
    row 0) so each device receives an equal static-shape shard."""
    e = len(rows)
    pad = (-e) % n_shards
    if pad:
        rows = np.concatenate([rows, np.zeros(pad, rows.dtype)])
        cols = np.concatenate([cols, np.zeros(pad, cols.dtype)])
        vals = np.concatenate([vals, np.zeros(pad, vals.dtype)])
    return rows, cols, vals


def sharded_spmm(
    mesh: Mesh,
    axis: str,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    x: jnp.ndarray,
    n_nodes: int,
) -> jnp.ndarray:
    """out = A @ x with A's edges sharded over `axis`, x replicated."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(),
    )
    def _spmm(rows_l, cols_l, vals_l, x_l):
        partial = jax.ops.segment_sum(
            x_l[cols_l] * vals_l[:, None], rows_l, num_segments=n_nodes
        )
        return jax.lax.psum(partial, axis)

    return _spmm(rows, cols, vals, x)
