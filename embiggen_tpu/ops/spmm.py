"""Sparse matrix ops for graph convolution: SpMM and SDDMM.

Replaces the reference's `embedding_ops.embedding_lookup_sparse_v2` hot op in
`GraphConvolution` (reference
`embiggen/layers/tensorflow/graph_convolution_layer.py:160-166`).

Two formulations:

1. `spmm` — COO + `segment_sum`. General, but TPU lowers scatter-add into a
   serialized scatter pipeline, so it is latency-bound. Kept for the small /
   generic path (feature preprocessor, SPINE sketches).
2. `PaddedKernel` + `spmm_padded` — the production GCN path. The kernel is
   re-laid-out host-side into an ELLPACK-style padded neighbour matrix
   [N, K] (K = capped max row length) plus a COO overflow list for rows
   longer than K. The SpMM is then *gather-only*: per node-chunk, gather
   [C, K, D] feature rows and contract the K axis on the VPU — no
   scatter anywhere, writes are contiguous. HBM traffic ≈
   N·K·D·4 bytes, which is the speed-of-light bound for a row-gather SpMM.

Combiners mirror the reference surface: sum / mean / sqrtn
(`graph_convolution_layer.py:16-174`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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



# --------------------------------------------------------------------------
# Bucketed-ELLPACK SpMM — the production GCN fast path.
#
# TPU has no efficient scatter (segment_sum lowers to a serialized scatter
# pipeline), but XLA's *flat-index row gather* sustains good HBM bandwidth.
# So the kernel is re-laid-out host-side into degree buckets:
#
#   * rows are stably ordered by bucket (K covers the row's length, capped;
#     ladder = multiples of 4 up to 32, powers of two beyond — bounds
#     padding waste at ~12% near typical mean degrees); per bucket,
#     neighbour ids/weights are padded into a [rows_in_bucket, K] table;
#   * the SpMM gathers each bucket's feature rows with FLAT indices (3x
#     faster than 2-D indexed gather, measured), contracts the K axis on
#     the VPU, and writes contiguous [rows_in_bucket, D] blocks;
#   * bucket outputs concatenate in permuted row order; the map back to the
#     original order is an inverse-permutation — i.e. ONE more row gather,
#     never a scatter;
#   * rows longer than the cap send their tail through the segment-sum
#     overflow path (empty for the degree-capped graphs the reference
#     targets);
#   * mean/sqrtn denominators are per-row constants of the kernel, so they
#     are precomputed host-side and stored.
#
# Power-of-two buckets bound padding waste at 2x (typically ~1.3x) versus
# max_degree/mean_degree for single-K ELLPACK.
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PaddedKernel:
    """Degree-bucketed ELLPACK layout of a sparse kernel (see above)."""

    bucket_cols: Tuple["jax.Array", ...]   # each [Rb, Kb] int32
    bucket_vals: Tuple["jax.Array", ...]   # each [Rb, Kb] f32
    inv_perm: Optional["jax.Array"]        # [n_out] int32, None if identity
    ov_rows: "jax.Array"                   # [E_ov] int32 (sorted)
    ov_cols: "jax.Array"                   # [E_ov] int32
    ov_vals: "jax.Array"                   # [E_ov] f32
    abs_weight_sum: "jax.Array"            # [n_out] f32 (mean combiner)
    sq_weight_sum: "jax.Array"             # [n_out] f32 (sqrtn combiner)
    n_out: int

    def tree_flatten(self):
        children = (
            self.bucket_cols, self.bucket_vals, self.inv_perm,
            self.ov_rows, self.ov_cols, self.ov_vals,
            self.abs_weight_sum, self.sq_weight_sum,
        )
        return children, (self.n_out,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    PaddedKernel, PaddedKernel.tree_flatten, PaddedKernel.tree_unflatten
)


def pad_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_out: int,
    cap: int = 512,
    min_k: int = 4,
) -> PaddedKernel:
    """Host-side relayout of a COO kernel into a bucketed PaddedKernel.

    `cap` bounds the widest bucket; per-row edges beyond `cap` overflow to
    the COO segment-sum path. `min_k` is the narrowest bucket width."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    counts = np.bincount(rows, minlength=n_out).astype(np.int64)

    # Combiner denominators over ALL edges (padded + overflow).
    absw = np.zeros(n_out, np.float32)
    sqw = np.zeros(n_out, np.float32)
    np.add.at(absw, rows, np.abs(vals))
    np.add.at(sqw, rows, vals * vals)

    # Bucket width ladder: multiples of 4 up to 32 (bounds padding waste to
    # ~12% around the typical mean degree), power-of-two steps beyond
    # (bounds the bucket count for heavy-tailed degree distributions).
    clipped = np.minimum(np.maximum(counts, 1), cap)
    k_small = np.ceil(clipped / 4).astype(np.int64) * 4
    k_large = 1 << np.ceil(np.log2(np.maximum(clipped, 1))).astype(np.int64)
    k_per_row = np.maximum(min_k, np.where(clipped <= 32, k_small, k_large))
    k_per_row = np.minimum(k_per_row, max(cap, min_k))
    ks = np.unique(k_per_row)

    # Row permutation: stable order by bucket.
    perm = np.argsort(k_per_row, kind="stable")     # original row -> position
    identity = bool((perm == np.arange(n_out)).all())
    inv = np.empty(n_out, np.int64)
    inv[perm] = np.arange(n_out)                    # position of each row

    # Per-edge position within its row (rows arrive sorted from CSR/COO;
    # make it robust to arbitrary order with a stable sort).
    order = np.argsort(rows, kind="stable")
    r_sorted = rows[order]
    row_start = np.zeros(n_out, np.int64)
    row_start[1:] = np.cumsum(counts)[:-1]
    pos = np.arange(rows.shape[0], dtype=np.int64) - row_start[r_sorted]
    c_sorted = cols[order]
    v_sorted = vals[order]

    in_pad = pos < np.minimum(k_per_row[r_sorted], cap)
    bucket_cols, bucket_vals = [], []
    row_bucket_of = k_per_row[r_sorted]
    # position of each row inside its bucket = inv[row] - bucket_offset
    offsets = {}
    off = 0
    for k in ks:
        nb = int((k_per_row == k).sum())
        offsets[int(k)] = off
        off += nb
    for k in ks:
        k = int(k)
        nb = int((k_per_row == k).sum())
        cp = np.zeros((nb, k), np.int32)
        vp = np.zeros((nb, k), np.float32)
        sel = in_pad & (row_bucket_of == k)
        rr = inv[r_sorted[sel]] - offsets[k]
        pp = pos[sel]
        cp[rr, pp] = c_sorted[sel]
        vp[rr, pp] = v_sorted[sel]
        bucket_cols.append(jnp.asarray(cp))
        bucket_vals.append(jnp.asarray(vp))

    ov = ~in_pad
    return PaddedKernel(
        bucket_cols=tuple(bucket_cols),
        bucket_vals=tuple(bucket_vals),
        inv_perm=None if identity else jnp.asarray(inv, jnp.int32),
        ov_rows=jnp.asarray(r_sorted[ov], jnp.int32),
        ov_cols=jnp.asarray(c_sorted[ov], jnp.int32),
        ov_vals=jnp.asarray(v_sorted[ov], jnp.float32),
        abs_weight_sum=jnp.asarray(absw),
        sq_weight_sum=jnp.asarray(sqw),
        n_out=int(n_out),
    )


# Bound on the [C, K, D] gather intermediate per chunk (elements; f32 →
# ~2 GB). Measured on TPU v5e: the one-shot gather-contract sustains
# ~145 M gathered rows/s (descriptor-bound) as long as the intermediate
# fits HBM comfortably; a fori_loop + dynamic_update_slice chunking at
# 2^26 elements ran at HALF that rate, and letting the intermediate
# exceed HBM causes host spills 1000x slower. Hence: few, large, STATIC
# (unrolled) chunks.
_PAD_CHUNK_ELEMENTS = 1 << 29


def _bucket_spmm(cols_pad, vals_pad, xf, d):
    """Gather-contract one bucket: out[r] = sum_k vals[r,k] * x[cols[r,k]].
    Chunks are unrolled with static slices — no dynamic_update_slice, no
    loop-carried output buffer."""
    nb, k = cols_pad.shape
    chunk = max(64, _PAD_CHUNK_ELEMENTS // max(k * d, 1))
    if nb <= chunk:
        g = xf[cols_pad.reshape(-1)].reshape(nb, k, d)
        return jnp.sum(vals_pad[:, :, None] * g, axis=1)
    parts = []
    for c0 in range(0, nb, chunk):
        c1 = min(c0 + chunk, nb)
        cc = cols_pad[c0:c1]
        vv = vals_pad[c0:c1]
        g = xf[cc.reshape(-1)].reshape(c1 - c0, k, d)
        parts.append(jnp.sum(vv[:, :, None] * g, axis=1))
    return jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("combiner",))
def spmm_padded(
    pk: PaddedKernel, x: jnp.ndarray, combiner: str = "sum"
) -> jnp.ndarray:
    """Scatter-free SpMM over a bucketed PaddedKernel → [n_out, D]."""
    xf = x.astype(jnp.float32)
    d = x.shape[1]
    parts = [
        _bucket_spmm(c, v, xf, d)
        for c, v in zip(pk.bucket_cols, pk.bucket_vals)
    ]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if pk.inv_perm is not None:
        out = out[pk.inv_perm]              # inverse permutation = gather
    if pk.ov_rows.shape[0]:
        out = out + jax.ops.segment_sum(
            xf[pk.ov_cols] * pk.ov_vals[:, None],
            pk.ov_rows, num_segments=pk.n_out, indices_are_sorted=True,
        )
    if combiner == "sum":
        return out.astype(x.dtype)
    if combiner == "mean":
        den = jnp.maximum(pk.abs_weight_sum, 1e-9)
    elif combiner == "sqrtn":
        den = jnp.maximum(jnp.sqrt(pk.sq_weight_sum), 1e-9)
    else:
        raise ValueError(f"Unknown combiner {combiner!r}")
    return (out / den[:, None]).astype(x.dtype)
