"""On-device per-edge topological heuristics — the JAX counterpart of
`embiggen_tpu.graph.metrics` (reference engine `get_all_edge_metrics`:
Adamic-Adar, Jaccard coefficient, resource allocation, preferential
attachment; reference usage in `embiggen/edge_prediction` and the
visualizer — SURVEY.md §2.9 item 6).

Designed for jit'd inference paths (GCN `use_edge_metrics`, perceptron edge
features): the common-neighbour reduction runs over a `cap`-wide static
neighbourhood of the lower-degree endpoint, with membership tests in the
other endpoint's CSR row via vectorized binary search. Pairs whose minimum
degree exceeds `cap` are truncated (mirrors the reference's approximate
`max_neighbours` mode for high-degree nodes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..graph.graph import DeviceGraph
from .walks import _bsearch_iters, csr_has_edges

EDGE_METRIC_NAMES = [
    "AdamicAdar",
    "JaccardCoefficient",
    "ResourceAllocationIndex",
    "PreferentialAttachment",
]
N_EDGE_METRICS = len(EDGE_METRIC_NAMES)


@functools.partial(jax.jit, static_argnames=("cap",))
def edge_metrics(
    dg: DeviceGraph,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    cap: int = 128,
) -> jnp.ndarray:
    """[B, 4] float32: Adamic-Adar, Jaccard, Resource Allocation,
    Preferential Attachment per (src, dst) pair, computed on device."""
    deg = dg.degrees
    # Expand the cheaper endpoint's neighbourhood.
    swap = deg[dst] < deg[src]
    a = jnp.where(swap, dst, src)
    b_nodes = jnp.where(swap, src, dst)
    da = jnp.minimum(deg[a], cap)
    bsz = src.shape[0]
    offs = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap), 1)
    valid = offs < da[:, None]
    base = dg.row_ptr[a]
    idx = jnp.clip(
        base[:, None] + jnp.minimum(offs, jnp.maximum(da - 1, 0)[:, None]),
        0,
        max(dg.n_arcs - 1, 0),
    )
    cand = dg.col_idx[idx]                                   # [B, cap]
    member = csr_has_edges(
        dg.row_ptr,
        dg.col_idx,
        jnp.broadcast_to(b_nodes[:, None], (bsz, cap)).reshape(-1),
        cand.reshape(-1),
        n_iters=_bsearch_iters(dg),
    ).reshape(bsz, cap)
    member = member & valid
    cdeg = deg[cand].astype(jnp.float32)
    inv_log = jnp.where(cdeg > 1, 1.0 / jnp.log(jnp.maximum(cdeg, 2.0)), 0.0)
    inv = jnp.where(cdeg > 0, 1.0 / jnp.maximum(cdeg, 1.0), 0.0)
    m = member.astype(jnp.float32)
    inter = jnp.sum(m, axis=1)
    aa = jnp.sum(m * inv_log, axis=1)
    ra = jnp.sum(m * inv, axis=1)
    dsf = deg[src].astype(jnp.float32)
    ddf = deg[dst].astype(jnp.float32)
    union = dsf + ddf - inter
    jac = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    pa = dsf * ddf
    return jnp.stack([aa, jac, ra, pa], axis=1)
