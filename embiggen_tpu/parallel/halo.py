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
communication, volume ∝ boundary nodes, NOT N) -> local segment-sum over
local edges (independent of the collective, so XLA overlaps them) -> halo
segment-sum -> add. Output stays row-sharded, ready for the next layer.
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

    send_idx: "jax.Array"     # [P, P, H] local row to send to peer (0-pad)
    rows_local: "jax.Array"   # [P, El] local output row (in-shard coords)
    cols_local: "jax.Array"   # [P, El] local input row (in-shard coords)
    vals_local: "jax.Array"   # [P, El]
    rows_halo: "jax.Array"    # [P, Eh] local output row
    cols_halo: "jax.Array"    # [P, Eh] halo-buffer coord (q*H + slot)
    vals_halo: "jax.Array"    # [P, Eh]
    abs_wsum: "jax.Array"     # [P, S] per-output-row |w| sums (mean)
    sq_wsum: "jax.Array"      # [P, S] per-output-row w² sums (sqrtn)
    n_shards: int
    shard_size: int
    halo_width: int
    n_nodes: int
    comm_rows: int            # Σ|B[q->p]| actually exchanged (diagnostics)

    def tree_flatten(self):
        return (
            (self.send_idx, self.rows_local, self.cols_local,
             self.vals_local, self.rows_halo, self.cols_halo,
             self.vals_halo, self.abs_wsum, self.sq_wsum),
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

    # Boundary sets B[q->p]: unique cols owned by q that p's edges read.
    boundary: Dict[Tuple[int, int], np.ndarray] = {}
    for dev in range(p):
        mine = owner_r == dev
        for q in range(p):
            if q == dev:
                continue
            c = np.unique(cols[mine & (owner_c == q)])
            boundary[(q, dev)] = c
    halo_width = max(
        (len(v) for v in boundary.values()), default=0
    )
    halo_width = max(halo_width, 1)
    comm_rows = int(sum(len(v) for v in boundary.values()))

    send_idx = np.zeros((p, p, halo_width), np.int32)
    # halo slot of each remote col, per receiving device
    slot_of: Dict[Tuple[int, int], Dict[int, int]] = {}
    for (q, dev), b in boundary.items():
        send_idx[q, dev, : len(b)] = (b - q * s).astype(np.int32)
        slot_of[(q, dev)] = {int(c): i for i, c in enumerate(b)}

    rows_l, cols_l, vals_l = [], [], []
    rows_h, cols_h, vals_h = [], [], []
    absw = np.zeros((p, s), np.float32)
    sqw = np.zeros((p, s), np.float32)
    for dev in range(p):
        mine = owner_r == dev
        r_in = (rows[mine] - dev * s).astype(np.int32)
        np.add.at(absw[dev], r_in, np.abs(vals[mine]))
        np.add.at(sqw[dev], r_in, vals[mine] * vals[mine])
        local = mine & (owner_c == dev)
        rows_l.append((rows[local] - dev * s).astype(np.int32))
        cols_l.append((cols[local] - dev * s).astype(np.int32))
        vals_l.append(vals[local])
        remote = mine & (owner_c != dev)
        rr = (rows[remote] - dev * s).astype(np.int32)
        cc = cols[remote]
        qq = owner_c[remote]
        mapped = np.fromiter(
            (
                int(q) * halo_width + slot_of[(int(q), dev)][int(c)]
                for q, c in zip(qq, cc)
            ),
            dtype=np.int32,
            count=len(cc),
        )
        rows_h.append(rr)
        cols_h.append(mapped)
        vals_h.append(vals[remote])

    # Padding: zero-weight edges on local row 0 never change the result.
    return HaloPartition(
        send_idx=jnp.asarray(send_idx),
        rows_local=jnp.asarray(_pad2(rows_l, 0)),
        cols_local=jnp.asarray(_pad2(cols_l, 0)),
        vals_local=jnp.asarray(_pad2(vals_l, 0.0)),
        rows_halo=jnp.asarray(_pad2(rows_h, 0)),
        cols_halo=jnp.asarray(_pad2(cols_h, 0)),
        vals_halo=jnp.asarray(_pad2(vals_h, 0.0)),
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
    (send_idx, rows_l, cols_l, vals_l, rows_h, cols_h, vals_h,
     absw, sqw) = part_arrays
    s, p, h = shard_size, n_shards, halo_width
    d = x_l.shape[-1]
    x_l = x_l.reshape(s, d)

    send = x_l[send_idx.reshape(-1)].reshape(p, h, d)
    # The only communication: boundary rows, volume ∝ Σ|B|, not N.
    halo = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)

    # Local aggregation is independent of the collective — XLA overlaps.
    out = jax.ops.segment_sum(
        x_l[cols_l.reshape(-1)] * vals_l.reshape(-1)[:, None],
        rows_l.reshape(-1),
        num_segments=s,
    )
    out = out + jax.ops.segment_sum(
        halo.reshape(p * h, d)[cols_h.reshape(-1)]
        * vals_h.reshape(-1)[:, None],
        rows_h.reshape(-1),
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
