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
