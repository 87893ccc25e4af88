"""On-device random-walk generation — the TPU-native replacement of the
reference engine's Rust walk kernel behind `graph.node2vec(...)` (reference
call site `embiggen/sequences/node2vec_sequence.py:190-203`) and the walk
hyper-parameter surface of
`embiggen/embedders/tensorflow_embedders/abstract_random_walked_based_embedder_model.py:8-158`.

Design (SURVEY.md §7 hard-part #1):
- First-order steps are one gather each: uniform over the CSR row, or Walker
  alias sampling for weighted graphs (alias tables precomputed host-side,
  aligned with col_idx).
- Second-order (p/q) bias is sampled exactly within a `max_neighbours`-capped
  neighbourhood: the per-candidate weight vector (1/p if returning to the
  previous node, 1 if the candidate neighbours the previous node — CSR binary
  search — else 1/q, times the edge weight) is built for all candidates at
  once and sampled by inverse CDF. The cap mirrors the reference's
  approximate-walk mode for high-degree nodes and keeps shapes static.

Everything is jit-compatible with static shapes: walks are [B, L] int32.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph.graph import DeviceGraph

_BSEARCH_ITERS = 32  # covers rows up to 2^32 entries


def csr_has_edges(
    row_ptr: jnp.ndarray,
    col_idx: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    n_iters: int = _BSEARCH_ITERS,
) -> jnp.ndarray:
    """Vectorized membership test: is (src[i], dst[i]) an arc? Lower-bound
    binary search within each CSR row (rows are sorted). `n_iters` should be
    ceil(log2(max_degree + 1)) when known — each saved iteration removes one
    full gather round."""
    n_arcs = col_idx.shape[0]
    lo = row_ptr[src]
    hi = row_ptr[src + 1]
    end = hi

    def body(_, state):
        lo, hi = state
        valid = lo < hi
        mid = (lo + hi) // 2
        v = col_idx[jnp.clip(mid, 0, max(n_arcs - 1, 0))]
        go_right = valid & (v < dst)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(valid & ~go_right, mid, hi)
        return lo, hi

    lo, hi = lax.fori_loop(0, n_iters, body, (lo, hi))
    found = (lo < end) & (col_idx[jnp.clip(lo, 0, max(n_arcs - 1, 0))] == dst)
    return found & (n_arcs > 0)


def csr_edge_ids(
    row_ptr: jnp.ndarray,
    col_idx: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    n_iters: int = _BSEARCH_ITERS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized (edge_id, found) lookup: the CSR arc position of each
    (src[i], dst[i]) pair, `n_arcs` sentinel where the pair is not an arc.
    Same lower-bound search as `csr_has_edges` (arc ids ARE CSR positions —
    `Graph.sources` is derived from row_ptr). Replaces the reference's
    `Graph.get_edge_id_from_node_ids` for on-device feature lookups."""
    n_arcs = col_idx.shape[0]
    lo = row_ptr[src]
    hi = row_ptr[src + 1]
    end = hi

    def body(_, state):
        lo, hi = state
        valid = lo < hi
        mid = (lo + hi) // 2
        v = col_idx[jnp.clip(mid, 0, max(n_arcs - 1, 0))]
        go_right = valid & (v < dst)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(valid & ~go_right, mid, hi)
        return lo, hi

    lo, hi = lax.fori_loop(0, n_iters, body, (lo, hi))
    found = (
        (lo < end)
        & (col_idx[jnp.clip(lo, 0, max(n_arcs - 1, 0))] == dst)
        & (n_arcs > 0)
    )
    return jnp.where(found, lo, n_arcs), found


def _bsearch_iters(dg: DeviceGraph) -> int:
    """Iterations needed for rows up to max_degree (fallback 32)."""
    if dg.max_degree and dg.max_degree > 0:
        return max(1, int(np.ceil(np.log2(dg.max_degree + 1))))
    return _BSEARCH_ITERS


def _uniform_offset(key: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """Uniform integer in [0, deg) per element (0 where deg == 0)."""
    r = jax.random.uniform(key, deg.shape)
    return jnp.minimum((r * deg).astype(jnp.int32), jnp.maximum(deg - 1, 0))


def _sample_neighbor(
    dg: DeviceGraph,
    key: jnp.ndarray,
    nodes: jnp.ndarray,
    max_neighbours: Optional[int],
) -> jnp.ndarray:
    """One first-order neighbour sample per node. Uses alias tables when the
    graph is weighted (dg.alias_prob present), else uniform. Nodes with zero
    degree return themselves (walk traps, as in the reference engine)."""
    deg = dg.degrees[nodes]
    if max_neighbours is not None:
        deg = jnp.minimum(deg, max_neighbours)
    k_off, k_coin = jax.random.split(key)
    off = _uniform_offset(k_off, deg)
    base = dg.row_ptr[nodes]
    if dg.alias_prob is not None:
        coin = jax.random.uniform(k_coin, nodes.shape)
        prob = dg.alias_prob[base + off]
        alias = dg.alias_idx[base + off]
        off = jnp.where(coin < prob, off, alias)
        if max_neighbours is not None:
            off = jnp.minimum(off, jnp.maximum(deg - 1, 0))
    nxt = dg.col_idx[jnp.clip(base + off, 0, max(dg.n_arcs - 1, 0))]
    return jnp.where(deg > 0, nxt, nodes)


def _second_order_step_rejection(
    dg: DeviceGraph,
    key: jnp.ndarray,
    prev: jnp.ndarray,
    curr: jnp.ndarray,
    return_weight: float,
    explore_weight: float,
    max_neighbours: int,
    n_tries: int = 8,
) -> jnp.ndarray:
    """One p/q-biased step by rejection sampling — the production path.

    Proposal: first-order candidate (uniform over the capped row; alias
    sampling contributes the edge-weight factor on weighted graphs). Accept
    with prob w(c)/w_max, where w(c) is the p/q factor (return_weight if
    c == prev, 1 if c neighbours prev — ONE binary search per candidate —
    else explore_weight). `n_tries` candidates are drawn at once; the first
    accepted is exactly target-distributed. The (1-a)^T residual where all
    tries reject falls back to a weighted pick among the T candidates
    (sampling-importance-resampling), so the bias is O((1-a)^T / T).

    This replaces the exact-CDF scoring of all `max_neighbours` candidates
    (kept as `_second_order_step_exact` and used to validate distribution
    equality) — M-wide scoring costs M·log(deg) serialized gather rounds per
    step; rejection costs 1 + log(deg)."""
    b = curr.shape[0]
    t = n_tries
    deg = jnp.minimum(dg.degrees[curr], max_neighbours)          # [B]
    base = dg.row_ptr[curr]
    k_off, k_coin, k_acc, k_fb = jax.random.split(key, 4)
    r = jax.random.uniform(k_off, (b, t))
    offs = jnp.minimum(
        (r * deg[:, None]).astype(jnp.int32), jnp.maximum(deg - 1, 0)[:, None]
    )
    idx = jnp.clip(base[:, None] + offs, 0, max(dg.n_arcs - 1, 0))
    if dg.alias_prob is not None:
        coin = jax.random.uniform(k_coin, (b, t))
        take_alias = coin >= dg.alias_prob[idx]
        alias_off = jnp.minimum(
            dg.alias_idx[idx], jnp.maximum(deg - 1, 0)[:, None]
        )
        offs = jnp.where(take_alias, alias_off, offs)
        idx = jnp.clip(base[:, None] + offs, 0, max(dg.n_arcs - 1, 0))
    cands = dg.col_idx[idx]                                      # [B, T]
    is_return = cands == prev[:, None]
    is_common = csr_has_edges(
        dg.row_ptr, dg.col_idx,
        jnp.broadcast_to(prev[:, None], (b, t)).reshape(-1),
        cands.reshape(-1),
        n_iters=_bsearch_iters(dg),
    ).reshape(b, t)
    w = jnp.where(
        is_return, return_weight, jnp.where(is_common, 1.0, explore_weight)
    )
    w_max = max(return_weight, 1.0, explore_weight)
    accept = jax.random.uniform(k_acc, (b, t)) * w_max < w
    first = jnp.argmax(accept, axis=1)           # first True per row
    any_accept = jnp.any(accept, axis=1)
    cdf = jnp.cumsum(w, axis=1)
    u = jax.random.uniform(k_fb, (b,)) * cdf[:, -1]
    fallback = jnp.minimum(
        jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=1), t - 1
    )
    pick = jnp.where(any_accept, first, fallback)
    nxt = jnp.take_along_axis(cands, pick[:, None], axis=1)[:, 0]
    return jnp.where(deg > 0, nxt, curr)


def _sample_from_ell_row(
    key: jnp.ndarray,
    row: jnp.ndarray,          # [B, C] int32, -1 padded
    w_row: Optional[jnp.ndarray],  # [B, C] f32 or None
    fallback: jnp.ndarray,     # [B] node to stay at when row is empty
) -> jnp.ndarray:
    """First-order sample from a gathered ELLPACK row (uniform over valid
    entries, or CDF over edge weights when present)."""
    valid = row >= 0
    w = valid.astype(jnp.float32) if w_row is None else jnp.where(
        valid, w_row, 0.0
    )
    cdf = jnp.cumsum(w, axis=1)
    total = cdf[:, -1]
    u = jax.random.uniform(key, total.shape) * total
    pick = jnp.minimum(
        jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=1),
        row.shape[1] - 1,
    )
    nxt = jnp.take_along_axis(row, pick[:, None], axis=1)[:, 0]
    return jnp.where(total > 0, nxt, fallback)


def _second_order_step_ell(
    dg: DeviceGraph,
    key: jnp.ndarray,
    prev: jnp.ndarray,
    prev_row: jnp.ndarray,
    curr: jnp.ndarray,
    return_weight: float,
    explore_weight: float,
    cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One exact p/q-biased step via the capped ELLPACK adjacency — the
    production second-order path on graphs with `dg.ell_cols` built.

    The whole candidate set arrives in ONE row gather (`dg.ell_cols[curr]`,
    4*cap bytes per walker); the p/q classification needs no further memory
    access: `is_return` compares against the carried `prev` id and
    `is_common` compares candidates against the carried `prev_row`
    in-register (the previous step's gather), in 32-wide slabs the VPU
    fuses. Element-gather-per-candidate designs (rejection sampling with CSR
    binary search, `_second_order_step_rejection`) are descriptor-bound at
    ~50 gathers/step ≈ 1.6M steps/s on TPU v5e; this kernel measures ~20M
    steps/s on the 1M-node bench graph — and it samples the exact capped
    CDF (same distribution as `_second_order_step_exact`), not an
    approximation.

    Returns (next_nodes, next_prev_row): the gathered row is handed back to
    the scan carry so the next step never re-gathers it."""
    c_eff = min(cap, dg.ell_cap) if dg.ell_cap else cap
    row_full = dg.ell_cols[curr]                   # [B, ell_cap] row gather
    row = row_full[:, :c_eff]
    valid = row >= 0
    is_return = row == prev[:, None]
    # Membership test against prev's candidate row. Padding (-1) in
    # prev_row can only "match" padded candidates, which `valid` zeroes.
    is_common = jnp.zeros(row.shape, bool)
    pc = prev_row.shape[1]
    for s0 in range(0, pc, 32):
        slab = prev_row[:, s0:s0 + 32]
        is_common = is_common | (
            row[:, :, None] == slab[:, None, :]
        ).any(-1)
    w = jnp.where(
        is_return, return_weight, jnp.where(is_common, 1.0, explore_weight)
    )
    if dg.ell_w is not None:
        w = w * dg.ell_w[curr][:, :c_eff]
    w = jnp.where(valid, w, 0.0)
    cdf = jnp.cumsum(w, axis=1)
    total = cdf[:, -1]
    u = jax.random.uniform(key, total.shape) * total
    pick = jnp.minimum(
        jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=1), c_eff - 1
    )
    nxt = jnp.take_along_axis(row, pick[:, None], axis=1)[:, 0]
    nxt = jnp.where(total > 0, nxt, curr)
    return nxt, row_full


def _second_order_step_exact(
    dg: DeviceGraph,
    key: jnp.ndarray,
    prev: jnp.ndarray,
    curr: jnp.ndarray,
    return_weight: float,
    explore_weight: float,
    max_neighbours: int,
) -> jnp.ndarray:
    """One p/q-biased step, exact within the capped neighbourhood.
    return_weight = 1/p, explore_weight = 1/q (the reference's
    parameterization, `abstract_random_walked_based_embedder_model.py`)."""
    b = curr.shape[0]
    m = max_neighbours
    deg = jnp.minimum(dg.degrees[curr], m)                       # [B]
    base = dg.row_ptr[curr]                                      # [B]
    offs = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)        # [B, M]
    valid = offs < deg[:, None]
    idx = jnp.clip(base[:, None] + jnp.minimum(offs, jnp.maximum(deg - 1, 0)[:, None]),
                   0, max(dg.n_arcs - 1, 0))
    cands = dg.col_idx[idx]                                      # [B, M]
    is_return = cands == prev[:, None]
    is_common = csr_has_edges(
        dg.row_ptr, dg.col_idx,
        jnp.broadcast_to(prev[:, None], (b, m)).reshape(-1),
        cands.reshape(-1),
        n_iters=_bsearch_iters(dg),
    ).reshape(b, m)
    w = jnp.where(
        is_return, return_weight, jnp.where(is_common, 1.0, explore_weight)
    )
    if dg.weights is not None:
        w = w * dg.weights[idx]
    w = jnp.where(valid, w, 0.0)
    cdf = jnp.cumsum(w, axis=1)
    total = cdf[:, -1]
    u = jax.random.uniform(key, (b,)) * total
    pick = jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=1)
    pick = jnp.minimum(pick, jnp.maximum(deg - 1, 0))
    nxt = jnp.take_along_axis(cands, pick[:, None], axis=1)[:, 0]
    return jnp.where(deg > 0, nxt, curr)


@functools.partial(
    jax.jit,
    static_argnames=(
        "walk_length", "return_weight", "explore_weight", "max_neighbours",
        "exact_pq",
    ),
)
def random_walks(
    dg: DeviceGraph,
    start_nodes: jnp.ndarray,
    walk_length: int,
    key: jnp.ndarray,
    return_weight: float = 1.0,
    explore_weight: float = 1.0,
    max_neighbours: Optional[int] = None,
    exact_pq: bool = False,
) -> jnp.ndarray:
    """[B, walk_length] walks starting at start_nodes. First-order when
    return_weight == explore_weight == 1.0, else p/q-biased second-order
    (second-order implies a neighbourhood cap; defaults to the reference's
    max_neighbours=100). `exact_pq` forces the M-wide exact-CDF sampler
    instead of the fast rejection sampler (testing/validation only)."""
    first_order = return_weight == 1.0 and explore_weight == 1.0
    cap = max_neighbours if max_neighbours is not None else 100
    # The ELLPACK row-gather sampler is exact (capped CDF) and ~12x faster
    # than rejection; it runs whenever the graph was exported with an ELL
    # table wide enough to cover the requested cap.
    use_ell = (
        not first_order
        and not exact_pq
        and dg.ell_cols is not None
        and dg.ell_cap >= min(cap, max(dg.max_degree, 1))
    )
    # Rejection sampling's all-tries-reject residual grows with the p/q
    # weight ratio; beyond ratio 16 (the reference's practical p,q range is
    # [0.25, 4]) the exact-CDF sampler is both safer and competitive, since
    # extreme ratios would need many tries anyway. Decided at trace time.
    w_hi = max(return_weight, 1.0, explore_weight)
    w_lo = min(return_weight, 1.0, explore_weight)
    ratio = w_hi / max(w_lo, 1e-9)
    use_exact = exact_pq or ratio > 16.0
    n_tries = 8 if ratio <= 4.0 else 16

    k0 = jax.random.fold_in(key, 0x5EED)
    if walk_length == 1:
        return start_nodes[:, None]

    if use_ell:
        row0 = dg.ell_cols[start_nodes]
        w0 = dg.ell_w[start_nodes] if dg.ell_w is not None else None
        second = _sample_from_ell_row(k0, row0, w0, start_nodes)
        if walk_length == 2:
            return jnp.stack([start_nodes, second], axis=1)

        def step_ell(carry, k):
            prev, prow, curr = carry
            nxt, crow = _second_order_step_ell(
                dg, k, prev, prow, curr, return_weight, explore_weight, cap
            )
            return (curr, crow, nxt), nxt

        keys = jax.random.split(key, walk_length - 2)
        _, rest = lax.scan(step_ell, (start_nodes, row0, second), keys)
        return jnp.concatenate(
            [start_nodes[:, None], second[:, None], rest.T], axis=1
        ).astype(jnp.int32)

    def step(carry, k):
        prev, curr = carry
        if first_order:
            nxt = _sample_neighbor(dg, k, curr, max_neighbours)
        elif use_exact:
            nxt = _second_order_step_exact(
                dg, k, prev, curr, return_weight, explore_weight, cap
            )
        else:
            nxt = _second_order_step_rejection(
                dg, k, prev, curr, return_weight, explore_weight, cap,
                n_tries=n_tries,
            )
        return (curr, nxt), nxt

    keys = jax.random.split(key, walk_length - 1)
    # First step is first-order (no previous node yet).
    second = _sample_neighbor(dg, k0, start_nodes, max_neighbours)
    if walk_length == 2:
        return jnp.stack([start_nodes, second], axis=1)
    (_, _), rest = lax.scan(step, (start_nodes, second), keys[: walk_length - 2])
    return jnp.concatenate(
        [start_nodes[:, None], second[:, None], rest.T], axis=1
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("window_size",))
def skipgram_pairs(
    walks: jnp.ndarray, window_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract (contexts, words) skipgram training pairs from walks, matching
    the reference batch layout: contexts [N, 2w], words [N] with
    N = B * (L - 2w) (reference `node2vec_sequence.py:115-138`)."""
    b, length = walks.shape
    w = window_size
    n_centers = length - 2 * w
    # centers: positions w .. L-w-1
    words = lax.dynamic_slice(walks, (0, w), (b, n_centers)).reshape(-1)
    ctx_cols = []
    for off in range(-w, w + 1):
        if off == 0:
            continue
        ctx_cols.append(
            lax.dynamic_slice(walks, (0, w + off), (b, n_centers))
        )
    contexts = jnp.stack(ctx_cols, axis=-1).reshape(-1, 2 * w)
    return contexts, words


def node2vec_batch(
    dg: DeviceGraph,
    start_nodes: jnp.ndarray,
    walk_length: int,
    window_size: int,
    key: jnp.ndarray,
    iterations: int = 1,
    return_weight: float = 1.0,
    explore_weight: float = 1.0,
    max_neighbours: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full `graph.node2vec` equivalent: walks + window extraction, with
    `iterations` repeated walks per start node."""
    starts = jnp.tile(start_nodes, iterations)
    walks = random_walks(
        dg, starts, walk_length, key,
        return_weight=return_weight, explore_weight=explore_weight,
        max_neighbours=max_neighbours,
    )
    return skipgram_pairs(walks, window_size)
