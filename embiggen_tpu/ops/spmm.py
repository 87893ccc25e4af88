"""Sparse matrix ops for graph convolution: SpMM and SDDMM.

Replaces the reference's `embedding_ops.embedding_lookup_sparse_v2` hot op in
`GraphConvolution` (reference
`embiggen/layers/tensorflow/graph_convolution_layer.py:160-166`) with
XLA-native segment reductions over COO kernels. On TPU, XLA lowers
`segment_sum` to a sort+scatter pipeline that keeps the dense feature gather
and multiply on the VPU/MXU; a Pallas edge-blocked variant lives in
`pallas/spmm_kernel.py` for the large-scale path.

Combiners mirror the reference surface: sum / mean / sqrtn
(`graph_convolution_layer.py:16-174`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# Edge chunks are sized so the [chunk, D] gather intermediate stays ~1 GB —
# without chunking, XLA materializes the full [E, D] gather (10 GB at
# E=20M, D=128) and thrashes HBM.
_CHUNK_ELEMENTS = 1 << 28


@functools.partial(
    jax.jit, static_argnames=("n_out", "combiner", "sorted_rows")
)
def spmm(
    rows: jnp.ndarray,      # [E] output row per edge
    cols: jnp.ndarray,      # [E] input row per edge
    vals: jnp.ndarray,      # [E] kernel weights
    x: jnp.ndarray,         # [N_in, D] dense features
    n_out: int,
    combiner: str = "sum",
    sorted_rows: bool = True,
) -> jnp.ndarray:
    """out[r] = combine_{e: rows[e]=r} vals[e] * x[cols[e]]  → [n_out, D].

    CSR-derived COO has sorted rows; `sorted_rows=True` lets XLA skip the
    sort inside the segment reduction. Edges are processed in fixed-size
    chunks to bound the gather intermediate."""
    e = rows.shape[0]
    d = x.shape[1] if x.ndim == 2 else 1
    chunk = max(1, _CHUNK_ELEMENTS // max(d, 1))

    if e <= chunk:
        gathered = x[cols] * vals[:, None].astype(x.dtype)
        out = jax.ops.segment_sum(
            gathered, rows, num_segments=n_out,
            indices_are_sorted=sorted_rows,
        )
    else:
        n_chunks = -(-e // chunk)
        pad = n_chunks * chunk - e
        # out-of-range row sentinel: dropped by the segment reduction
        rows_p = jnp.concatenate(
            [rows, jnp.full((pad,), n_out, rows.dtype)]
        )
        cols_p = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals_p = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])

        def body(i, out):
            rs = jax.lax.dynamic_slice(rows_p, (i * chunk,), (chunk,))
            cs = jax.lax.dynamic_slice(cols_p, (i * chunk,), (chunk,))
            vs = jax.lax.dynamic_slice(vals_p, (i * chunk,), (chunk,))
            part = jax.ops.segment_sum(
                x[cs] * vs[:, None].astype(x.dtype), rs,
                num_segments=n_out, indices_are_sorted=sorted_rows,
            )
            return out + part

        out = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((n_out, d), x.dtype)
        )
    if combiner == "sum":
        return out
    counts = jax.ops.segment_sum(
        jnp.abs(vals), rows, num_segments=n_out,
        indices_are_sorted=sorted_rows,
    )
    if combiner == "mean":
        return out / jnp.maximum(counts, 1e-9)[:, None].astype(out.dtype)
    if combiner == "sqrtn":
        # sqrtn divides by sqrt(sum of squared weights), TF semantics.
        sq = jax.ops.segment_sum(
            vals * vals, rows, num_segments=n_out,
            indices_are_sorted=sorted_rows,
        )
        return out / jnp.maximum(jnp.sqrt(sq), 1e-9)[:, None].astype(out.dtype)
    raise ValueError(f"Unknown combiner {combiner!r}")


@jax.jit
def sddmm(
    rows: jnp.ndarray, cols: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge scores (a[rows] · b[cols]) → [E]."""
    return jnp.sum(a[rows] * b[cols], axis=-1)


def coo_to_device(
    rows, cols, vals
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    return (
        jnp.asarray(rows, dtype=jnp.int32),
        jnp.asarray(cols, dtype=jnp.int32),
        jnp.asarray(vals, dtype=jnp.float32),
    )
