"""Halo-exchange node-partitioned SpMM — the scalable multi-chip graph
convolution (SURVEY.md §7 step 7; BASELINE.json north star: "graph
edge-partitioned per host, boundary node features exchanged via all-to-all,
overlapped with local aggregation").

Layout
------
Nodes are partitioned into P contiguous shards of S = ceil(N/P) rows; the
feature matrix X lives row-sharded over the mesh axis ([P*S, D] with spec
P(axis)). The kernel's edges are partitioned by OUTPUT row, so every write
is local; only input rows (cols) can be remote.

Per device p the host-side builder precomputes:
  * the boundary index sets B[q->p] (rows of shard q that p's edges read),
    padded to a common halo width H = max |B|;
  * a send table: the local rows each device must ship to every peer;
  * its edge list split into a cols-local part and a cols-remote part whose
    col indices are pre-remapped into halo-buffer coordinates.

The device step is then: gather send rows -> `all_to_all` (the only
communication, volume ∝ boundary nodes, NOT N) -> local aggregation
(independent of the collective, so XLA overlaps them) -> halo aggregation
-> add. Output stays row-sharded, ready for the next layer.

Local and halo aggregation use the same single-K ELLPACK gather-contract
layout as the single-chip `ops/spmm.py::spmm_padded` (per-shard [S, K]
neighbour tables + a COO segment-sum overflow for long rows): on TPU the
gather engine runs ~2.2x faster than the sorted-scatter pipeline a
segment-sum formulation pays (PERF_NOTES §1-2).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class HaloPartition:
    """Host-built, device-resident plan for one kernel (all leading axes = P,
    consumed by shard_map with spec P(axis))."""

    send_idx: "jax.Array"       # [P, P, H] local row to send to peer (0-pad)
    ell_cols_local: "jax.Array"  # [P, S, Kl] in-shard input row (0-pad)
    ell_vals_local: "jax.Array"  # [P, S, Kl] (0-pad)
    ov_rows_local: "jax.Array"   # [P, El_ov] overflow output row (0/val-0 pad)
    ov_cols_local: "jax.Array"   # [P, El_ov]
    ov_vals_local: "jax.Array"   # [P, El_ov]
    ell_cols_halo: "jax.Array"   # [P, S, Kh] halo-buffer coord (q*H + slot)
    ell_vals_halo: "jax.Array"   # [P, S, Kh]
    ov_rows_halo: "jax.Array"    # [P, Eh_ov]
    ov_cols_halo: "jax.Array"    # [P, Eh_ov]
    ov_vals_halo: "jax.Array"    # [P, Eh_ov]
    abs_wsum: "jax.Array"        # [P, S] per-output-row |w| sums (mean)
    sq_wsum: "jax.Array"         # [P, S] per-output-row w² sums (sqrtn)
    n_shards: int
    shard_size: int
    halo_width: int
    n_nodes: int
    comm_rows: int               # Σ|B[q->p]| actually exchanged (diagnostics)

    def tree_flatten(self):
        return (
            (self.send_idx,
             self.ell_cols_local, self.ell_vals_local,
             self.ov_rows_local, self.ov_cols_local, self.ov_vals_local,
             self.ell_cols_halo, self.ell_vals_halo,
             self.ov_rows_halo, self.ov_cols_halo, self.ov_vals_halo,
             self.abs_wsum, self.sq_wsum),
            (self.n_shards, self.shard_size, self.halo_width, self.n_nodes,
             self.comm_rows),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    HaloPartition, HaloPartition.tree_flatten, HaloPartition.tree_unflatten
)


def _pad2(arrs, fill):
    width = max((len(a) for a in arrs), default=0)
    width = max(width, 1)
    out = np.full((len(arrs), width), fill, dtype=np.asarray(arrs[0]).dtype
                  if len(arrs) else np.int32)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out


def _ell_relayout(rows, cols, vals, n_rows, k):
    """Single-K ELLPACK relayout of one shard's COO (same scheme as
    `ops/spmm.py::pad_coo`): ([n_rows, k] cols/vals, overflow COO).
    Routed through the native counting-sort pass when available."""
    rows = np.asarray(rows, np.int64)
    counts = np.bincount(rows, minlength=n_rows)
    from .. import native

    n_ov = int(rows.shape[0] - np.minimum(counts, k).sum())
    got = native.ell_relayout(rows, cols, vals, int(n_rows), int(k), n_ov)
    if got is not None:
        cp, vp, ovr, ovc, ovv, _, _ = got
        return cp, vp, ovr, ovc, ovv
    if rows.shape[0] and not bool((rows[1:] >= rows[:-1]).all()):
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
    row_start = np.zeros(n_rows, np.int64)
    row_start[1:] = np.cumsum(counts)[:-1]
    pos = np.arange(rows.shape[0], dtype=np.int64) - row_start[rows]
    in_pad = pos < k
    cp = np.zeros((n_rows, k), np.int32)
    vp = np.zeros((n_rows, k), np.float32)
    cp[rows[in_pad], pos[in_pad]] = cols[in_pad]
    vp[rows[in_pad], pos[in_pad]] = vals[in_pad]
    ov = ~in_pad
    return cp, vp, rows[ov].astype(np.int32), cols[ov].astype(np.int32), \
        vals[ov].astype(np.float32)


def build_halo_partition(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_nodes: int,
    n_shards: int,
) -> HaloPartition:
    """Partition a COO kernel for `halo_spmm` over `n_shards` devices."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    p = int(n_shards)
    s = -(-n_nodes // p)

    owner_r = rows // s
    owner_c = cols // s
    remote_mask = owner_r != owner_c

    # Boundary sets B[q->dev]: unique cols owned by q that dev's edges
    # read — ONE sort over the remote edges ((dev, q, col) keys) replaces
    # the old O(P²·E) masked-unique double loop, and each boundary comes
    # out sorted so the per-edge slot lookup below is a vectorized
    # searchsorted instead of a Python dict scan (VERDICT r3 weak-point 1:
    # this loop would crawl at real scale).
    boundary: Dict[Tuple[int, int], np.ndarray] = {}
    r_keys = (owner_r[remote_mask] * p + owner_c[remote_mask]) * np.int64(
        n_nodes
    ) + cols[remote_mask]
    uniq_keys = np.unique(r_keys)
    u_group = uniq_keys // n_nodes
    u_col = uniq_keys % n_nodes
    for dev in range(p):
        for q in range(p):
            if q == dev:
                continue
            sel = u_group == dev * p + q
            boundary[(q, dev)] = u_col[sel]
    halo_width = max(
        (len(v) for v in boundary.values()), default=0
    )
    halo_width = max(halo_width, 1)
    comm_rows = int(sum(len(v) for v in boundary.values()))

    send_idx = np.zeros((p, p, halo_width), np.int32)
    for (q, dev), b in boundary.items():
        send_idx[q, dev, : len(b)] = (b - q * s).astype(np.int32)

    from ..ops.spmm import _choose_k

    per_dev = []
    absw = np.zeros((p, s), np.float32)
    sqw = np.zeros((p, s), np.float32)
    for dev in range(p):
        mine = owner_r == dev
        r_in = (rows[mine] - dev * s).astype(np.int64)
        absw[dev] = np.bincount(
            r_in, weights=np.abs(vals[mine]), minlength=s
        ).astype(np.float32)
        sqw[dev] = np.bincount(
            r_in, weights=vals[mine] * vals[mine], minlength=s
        ).astype(np.float32)
        local = mine & ~remote_mask
        remote = mine & remote_mask
        cc = cols[remote]
        qq = owner_c[remote]
        mapped = np.empty(len(cc), np.int64)
        for q in range(p):
            m = qq == q
            if not m.any():
                continue
            b = boundary[(q, dev)]
            mapped[m] = q * halo_width + np.searchsorted(b, cc[m])
        per_dev.append((
            (rows[local] - dev * s).astype(np.int64),
            (cols[local] - dev * s).astype(np.int64),
            vals[local],
            (rows[remote] - dev * s).astype(np.int64),
            mapped,
            vals[remote],
        ))

    # One K per side, shared across shards (uniform [P, S, K] stacks); the
    # cost model sees the pooled per-row degree distribution.
    loc_counts = np.concatenate([
        np.bincount(d[0], minlength=s) for d in per_dev
    ]) if per_dev else np.zeros(1, np.int64)
    halo_counts = np.concatenate([
        np.bincount(d[3], minlength=s) for d in per_dev
    ]) if per_dev else np.zeros(1, np.int64)
    kl = _choose_k(loc_counts.astype(np.int64), cap=512, min_k=4)
    kh = _choose_k(halo_counts.astype(np.int64), cap=512, min_k=4)

    ell_cl, ell_vl, ovr_l, ovc_l, ovv_l = [], [], [], [], []
    ell_ch, ell_vh, ovr_h, ovc_h, ovv_h = [], [], [], [], []
    for (rl, cl, vl, rh, ch, vh) in per_dev:
        cp, vp, orr, occ, ovv = _ell_relayout(rl, cl, vl, s, kl)
        ell_cl.append(cp); ell_vl.append(vp)
        ovr_l.append(orr); ovc_l.append(occ); ovv_l.append(ovv)
        cp, vp, orr, occ, ovv = _ell_relayout(rh, ch, vh, s, kh)
        ell_ch.append(cp); ell_vh.append(vp)
        ovr_h.append(orr); ovc_h.append(occ); ovv_h.append(ovv)

    # Padding: zero-weight entries on row/col 0 never change the result.
    return HaloPartition(
        send_idx=jnp.asarray(send_idx),
        ell_cols_local=jnp.asarray(np.stack(ell_cl)),
        ell_vals_local=jnp.asarray(np.stack(ell_vl)),
        ov_rows_local=jnp.asarray(_pad2(ovr_l, 0)),
        ov_cols_local=jnp.asarray(_pad2(ovc_l, 0)),
        ov_vals_local=jnp.asarray(_pad2(ovv_l, 0.0)),
        ell_cols_halo=jnp.asarray(np.stack(ell_ch)),
        ell_vals_halo=jnp.asarray(np.stack(ell_vh)),
        ov_rows_halo=jnp.asarray(_pad2(ovr_h, 0)),
        ov_cols_halo=jnp.asarray(_pad2(ovc_h, 0)),
        ov_vals_halo=jnp.asarray(_pad2(ovv_h, 0.0)),
        abs_wsum=jnp.asarray(absw),
        sq_wsum=jnp.asarray(sqw),
        n_shards=p,
        shard_size=int(s),
        halo_width=int(halo_width),
        n_nodes=int(n_nodes),
        comm_rows=comm_rows,
    )


def shard_features(x: np.ndarray, part: HaloPartition, mesh: Mesh,
                   axis: str) -> jnp.ndarray:
    """Row-shard [N, D] features: pad to P*S rows and place with P(axis)."""
    n_pad = part.n_shards * part.shard_size
    x = np.asarray(x, np.float32)
    if x.shape[0] < n_pad:
        x = np.vstack(
            [x, np.zeros((n_pad - x.shape[0], x.shape[1]), np.float32)]
        )
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def halo_spmm_local(
    part_arrays, x_l, axis: str, combiner: str, shard_size: int,
    n_shards: int, halo_width: int,
):
    """Per-device body — callable INSIDE an enclosing shard_map (e.g. a
    sharded GCN train step). `part_arrays` are the HaloPartition array
    leaves with their leading P axis already split to this device."""
    (send_idx, ell_cl, ell_vl, ovr_l, ovc_l, ovv_l,
     ell_ch, ell_vh, ovr_h, ovc_h, ovv_h, absw, sqw) = part_arrays
    s, p, h = shard_size, n_shards, halo_width
    d = x_l.shape[-1]
    x_l = x_l.reshape(s, d)

    send = x_l[send_idx.reshape(-1)].reshape(p, h, d)
    # The only communication: boundary rows, volume ∝ Σ|B|, not N.
    halo = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)

    def ell_contract(cols_pad, vals_pad, table):
        # Same K-accumulated 2-D gather chain as ops/spmm._ell_spmm.
        cols_pad = cols_pad.reshape(s, -1)
        vals_pad = vals_pad.reshape(s, -1)
        out = vals_pad[:, 0:1] * table[cols_pad[:, 0]]
        for j in range(1, cols_pad.shape[1]):
            out = out + vals_pad[:, j:j + 1] * table[cols_pad[:, j]]
        return out

    # Local aggregation is independent of the collective — XLA overlaps.
    out = ell_contract(ell_cl, ell_vl, x_l)
    if ovr_l.size:
        out = out + jax.ops.segment_sum(
            x_l[ovc_l.reshape(-1)] * ovv_l.reshape(-1)[:, None],
            ovr_l.reshape(-1),
            num_segments=s,
        )
    # A partition with zero cross-shard edges reshapes the halo buffer to
    # [0, d]; skip the halo contraction entirely rather than relying on
    # XLA's OOB-gather behaviour on a zero-size dimension (ADVICE r3).
    hb = halo.reshape(p * h, d)
    if hb.shape[0] > 0:
        out = out + ell_contract(ell_ch, ell_vh, hb)
    if ovr_h.size:
        out = out + jax.ops.segment_sum(
            hb[ovc_h.reshape(-1)] * ovv_h.reshape(-1)[:, None],
            ovr_h.reshape(-1),
            num_segments=s,
        )
    if combiner == "mean":
        out = out / jnp.maximum(absw.reshape(s), 1e-9)[:, None]
    elif combiner == "sqrtn":
        out = out / jnp.maximum(jnp.sqrt(sqw.reshape(s)), 1e-9)[:, None]
    elif combiner != "sum":
        raise ValueError(f"Unknown combiner {combiner!r}")
    return out


def halo_spmm(
    mesh: Mesh,
    axis: str,
    part: HaloPartition,
    x: jnp.ndarray,
    combiner: str = "sum",
) -> jnp.ndarray:
    """out = A @ x with x row-sharded [P*S, D] over `axis`; output has the
    same sharding (rows beyond n_nodes are padding)."""
    arrays = part.tree_flatten()[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(tuple(P(axis) for _ in arrays), P(axis)),
        out_specs=P(axis),
    )
    def _run(part_arrays, x_l):
        return halo_spmm_local(
            part_arrays, x_l, axis, combiner,
            part.shard_size, part.n_shards, part.halo_width,
        )

    return _run(tuple(arrays), x)
