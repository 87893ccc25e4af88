"""Synthetic graph generators for tests and benchmarks (scale-free graphs mirror
the degree-skew the reference engine's samplers are designed around)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from .graph import Graph


def barabasi_albert(
    n_nodes: int, m: int, seed: int = 0, name: Optional[str] = None
) -> Graph:
    """Preferential-attachment graph: each new node attaches to m existing nodes
    sampled proportionally to degree (vectorized repeated-nodes trick)."""
    rng = np.random.default_rng(seed)
    # Repeated-nodes list: sampling uniformly from it = degree-proportional.
    repeated = list(range(m))
    sources = []
    targets = []
    for v in range(m, n_nodes):
        # Sample m distinct targets from the repeated list (approximate BA).
        choice = rng.choice(len(repeated), size=min(3 * m, len(repeated)), replace=False)
        picked = []
        seen = set()
        for c in choice:
            t = repeated[c]
            if t not in seen:
                seen.add(t)
                picked.append(t)
            if len(picked) == m:
                break
        for t in picked:
            sources.append(v)
            targets.append(t)
            repeated.append(t)
        repeated.extend([v] * len(picked))
    return Graph.from_edge_arrays(
        np.asarray(sources),
        np.asarray(targets),
        n_nodes=n_nodes,
        directed=False,
        name=name or f"BA(n={n_nodes},m={m})",
    )


def erdos_renyi(
    n_nodes: int, n_edges: int, seed: int = 0, weighted: bool = False,
    n_edge_types: int = 0, n_node_types: int = 0, name: Optional[str] = None,
) -> Graph:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, size=2 * n_edges)
    dst = rng.integers(0, n_nodes, size=2 * n_edges)
    keep = src != dst
    src, dst = src[keep][:n_edges], dst[keep][:n_edges]
    weights = rng.uniform(0.5, 2.0, size=len(src)).astype(np.float32) if weighted else None
    edge_types = (
        rng.integers(0, n_edge_types, size=len(src)).astype(np.int32)
        if n_edge_types
        else None
    )
    node_type_ptr = node_type_ids = None
    if n_node_types:
        node_type_ptr = np.arange(n_nodes + 1, dtype=np.int64)
        node_type_ids = rng.integers(0, n_node_types, size=n_nodes).astype(np.int32)
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=n_nodes,
        weights=weights,
        edge_types=edge_types,
        directed=False,
        name=name or f"ER(n={n_nodes},e={n_edges})",
        node_type_ptr=node_type_ptr,
        node_type_ids=node_type_ids,
    )


def planted_partition(
    n_nodes: int = 1000,
    n_communities: int = 4,
    p_in: float = 0.03,
    p_out: float = 0.001,
    seed: int = 42,
    name: Optional[str] = None,
) -> Graph:
    """Planted-partition (stochastic block model) graph with community ids as
    node types — the deterministic Cora-scale fixture for downstream-quality
    gates (the reference tests on downloaded Cora/CIO/Usair97,
    `tests/test_edge_prediction_pipeline.py:38-45`; this environment has no
    egress, so a seeded SBM with strong community structure stands in).

    With p_in >> p_out, link prediction and community (node-label)
    classification are both solvable well above 0.9, so quality gates can
    assert real thresholds rather than "runs without crashing".
    """
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, n_communities, size=n_nodes).astype(np.int32)
    # Sample undirected candidate pairs: draw ordered pairs uniformly, keep
    # i<j (halves the draws, hence the 2x), accept by block probability —
    # expected kept edges ≈ n(n-1)/2 · p_avg · 1.3-oversample.
    p_max = max(p_in, p_out)
    n_cand = int(n_nodes * (n_nodes - 1) * p_max * 1.3) + 32
    src = rng.integers(0, n_nodes, size=n_cand)
    dst = rng.integers(0, n_nodes, size=n_cand)
    ok = src < dst
    src, dst = src[ok], dst[ok]
    p_pair = np.where(comm[src] == comm[dst], p_in, p_out)
    keep = rng.random(len(src)) < p_pair / p_max
    src, dst = src[keep], dst[keep]
    # Connect isolated nodes to a random same-community peer so holdouts and
    # walk kernels see a single usable graph without diluting community
    # purity (fall back to any other node only for a singleton community).
    deg = np.bincount(np.concatenate([src, dst]), minlength=n_nodes)
    isolated = np.flatnonzero(deg == 0)
    if len(isolated):
        partners = np.empty(len(isolated), np.int64)
        for i, v in enumerate(isolated):
            peers = np.flatnonzero(comm == comm[v])
            peers = peers[peers != v]
            if len(peers) == 0:
                peers = np.delete(np.arange(n_nodes), v)
            partners[i] = rng.choice(peers)
        src = np.concatenate([src, isolated])
        dst = np.concatenate([dst, partners])
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=n_nodes,
        directed=False,
        name=name or f"SBM(n={n_nodes},k={n_communities})",
        node_type_ptr=np.arange(n_nodes + 1, dtype=np.int64),
        node_type_ids=comm,
        node_type_names=[f"community_{c}" for c in range(n_communities)],
    )


def planted_partition_edges(
    n_nodes: int,
    n_edges: int,
    n_communities: int = 10,
    within_fraction: float = 0.9,
    seed: int = 42,
    name: Optional[str] = None,
) -> Graph:
    """Planted-partition graph sampled by EDGE COUNT in O(E) — the
    bench-scale variant of `planted_partition` (whose pair-rejection
    sampler draws O(n² · p_max) candidates, infeasible at 1M nodes).
    `within_fraction` of edges connect same-community endpoints, so link
    prediction stays genuinely learnable at any scale (the bench's
    end-to-end evaluation metric measures real learning, not the 0.5
    constant-optimum of an unlearnable ER graph). The edge count is
    approximate: duplicate draws collapse (sub-percent at sparse
    densities)."""
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, n_communities, size=n_nodes).astype(np.int32)
    order = np.argsort(comm, kind="stable")
    sizes = np.bincount(comm, minlength=n_communities).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    # 30% oversample: self-loops, same-community "between" draws and
    # within-batch duplicates are dropped below.
    n_draw = int(n_edges * 1.3) + 64
    within = rng.random(n_draw) < within_fraction
    src = np.empty(n_draw, np.int64)
    dst = np.empty(n_draw, np.int64)
    n_w = int(within.sum())
    # within: community weighted by size² (≈ its share of same-community
    # pairs), then two uniform members
    p_c = sizes.astype(np.float64) ** 2
    p_c /= p_c.sum()
    c = rng.choice(n_communities, size=n_w, p=p_c)
    pick = lambda cc: order[
        starts[cc] + (rng.random(len(cc)) * sizes[cc]).astype(np.int64)
    ]
    src[within] = pick(c)
    dst[within] = pick(c)
    # between: uniform pairs, rejecting same-community below
    n_b = n_draw - n_w
    src[~within] = rng.integers(0, n_nodes, n_b)
    dst[~within] = rng.integers(0, n_nodes, n_b)
    ok = src != dst
    ok &= within | (comm[src] != comm[dst])
    src, dst = src[ok][:n_edges], dst[ok][:n_edges]
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=n_nodes,
        directed=False,
        name=name or f"SBM(n={n_nodes},e={n_edges},k={n_communities})",
        node_type_ptr=np.arange(n_nodes + 1, dtype=np.int64),
        node_type_ids=comm,
        node_type_names=[f"community_{c}" for c in range(n_communities)],
    )


def random_geometric(
    n_nodes: int = 1000,
    radius: float = 0.07,
    seed: int = 42,
    n_grid_types: int = 2,
    name: Optional[str] = None,
) -> Graph:
    """Random geometric graph: points uniform in the unit square, edges
    between pairs closer than `radius`; node types = grid-cell labels
    (n_grid_types × n_grid_types quadrants). Unlike an SBM — whose Bayes
    link-prediction ceiling is the community posterior (~0.85 AUROC) —
    distances are fully learnable from walks, so embedding quality gates can
    assert ≥0.9 AUPRC with real headroom."""
    rng = np.random.default_rng(seed)
    pts = rng.random((n_nodes, 2))
    # Chunk the O(n^2) distance computation to bound memory.
    src_l, dst_l = [], []
    chunk = max(1, (1 << 24) // n_nodes)
    for i0 in range(0, n_nodes, chunk):
        d2 = ((pts[i0: i0 + chunk, None, :] - pts[None, :, :]) ** 2).sum(-1)
        ii, jj = np.nonzero(d2 < radius * radius)
        ii = ii + i0
        keep = ii < jj  # upper triangle only
        src_l.append(ii[keep])
        dst_l.append(jj[keep])
    src = np.concatenate(src_l)
    dst = np.concatenate(dst_l)
    deg = np.bincount(np.concatenate([src, dst]), minlength=n_nodes)
    isolated = np.flatnonzero(deg == 0)
    if len(isolated):
        # Attach isolated points to their nearest neighbour.
        d2 = ((pts[isolated, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d2[np.arange(len(isolated)), isolated] = np.inf
        src = np.concatenate([src, isolated])
        dst = np.concatenate([dst, d2.argmin(axis=1)])
    cell = (
        np.minimum((pts[:, 0] * n_grid_types).astype(np.int32), n_grid_types - 1)
        * n_grid_types
        + np.minimum((pts[:, 1] * n_grid_types).astype(np.int32), n_grid_types - 1)
    ).astype(np.int32)
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=n_nodes,
        directed=False,
        name=name or f"RGG(n={n_nodes},r={radius})",
        node_type_ptr=np.arange(n_nodes + 1, dtype=np.int64),
        node_type_ids=cell,
        node_type_names=[
            f"cell_{i}" for i in range(n_grid_types * n_grid_types)
        ],
    )
