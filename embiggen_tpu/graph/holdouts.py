"""Holdout / split engine — host-side replacement for the reference engine's
split methods: `connected_holdout`, `random_holdout`,
`get_edge_prediction_kfold`, `get_node_label_holdout_graphs`,
`get_node_label_kfold` and edge-label equivalents (reference call sites:
`embiggen/edge_prediction/edge_prediction_model.py:91-117`,
`node_label_prediction/node_label_prediction_model.py:41-104`).

These are graph algorithms, not kernels, and run vectorized on host numpy
(SURVEY.md §7 "hard parts" #4).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .graph import Graph


def _undirected_edge_mask(graph: Graph) -> np.ndarray:
    """Mask selecting one canonical arc (src<=dst) per undirected edge."""
    return graph.sources <= graph.col_idx


def _canonical_edges(graph: Graph) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(src, dst, arc_idx) for canonical edges (all arcs if directed)."""
    if graph.directed:
        idx = np.arange(graph.number_of_directed_edges)
        return graph.sources, graph.col_idx, idx
    mask = _undirected_edge_mask(graph)
    idx = np.nonzero(mask)[0]
    return graph.sources[idx], graph.col_idx[idx], idx


def _subgraph_from_canonical(
    graph: Graph, keep: np.ndarray, name: str
) -> Graph:
    """Build subgraph from a boolean mask over canonical edges."""
    src, dst, idx = _canonical_edges(graph)
    sel = idx[keep]
    return Graph.from_edge_arrays(
        graph.sources[sel],
        graph.col_idx[sel],
        n_nodes=graph.number_of_nodes,
        weights=None if graph.weights is None else graph.weights[sel],
        edge_types=None if graph.edge_types is None else graph.edge_types[sel],
        directed=graph.directed,
        name=name,
        node_names=graph.node_names,
        node_type_ptr=graph.node_type_ptr,
        node_type_ids=graph.node_type_ids,
        node_type_names=graph.node_type_names,
        edge_type_names=graph.edge_type_names,
    )


def spanning_forest_arcs(graph: Graph, random_state: int = 42) -> np.ndarray:
    """Random spanning forest via union-find over shuffled canonical edges.
    Returns a boolean mask over canonical edges that are in the forest.
    Runs through the native C++ union-find when available (the Python loop
    spends ~30 s on 10M edges at bench scale); both paths process edges in
    the SAME shuffled order, so they produce the same forest."""
    src, dst, _ = _canonical_edges(graph)
    n = graph.number_of_nodes
    rng = np.random.default_rng(random_state)
    order = rng.permutation(len(src))

    from .. import native

    got = native.spanning_forest(src, dst, order, n)
    if got is not None:
        return got

    parent = np.arange(n)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    in_forest = np.zeros(len(src), dtype=bool)
    for e in order:
        a, b = find(src[e]), find(dst[e])
        if a != b:
            parent[a] = b
            in_forest[e] = True
    return in_forest


def connected_holdout(
    graph: Graph,
    train_size: float = 0.8,
    random_state: int = 42,
) -> Tuple[Graph, Graph]:
    """Split edges so the train graph keeps the connected components of the
    original: a random spanning forest is forced into train, the remaining
    edges are shuffled into train until `train_size` is met, the rest go to
    test. Mirrors reference-engine `connected_holdout` semantics
    (reference `edge_prediction_model.py:93-100`)."""
    src, dst, idx = _canonical_edges(graph)
    forest = spanning_forest_arcs(graph, random_state)
    n_edges = len(src)
    n_train_target = int(round(train_size * n_edges))
    n_forest = int(forest.sum())
    if n_forest > n_train_target:
        import warnings

        warnings.warn(
            f"Spanning forest has {n_forest} edges > train target "
            f"{n_train_target}; train split will be larger than requested."
        )
    rng = np.random.default_rng(random_state)
    rest = np.nonzero(~forest)[0]
    rng.shuffle(rest)
    n_extra = max(0, n_train_target - n_forest)
    train_mask = forest.copy()
    train_mask[rest[:n_extra]] = True
    return (
        _subgraph_from_canonical(graph, train_mask, f"{graph.name}_train"),
        _subgraph_from_canonical(graph, ~train_mask, f"{graph.name}_test"),
    )


def random_holdout(
    graph: Graph, train_size: float = 0.8, random_state: int = 42
) -> Tuple[Graph, Graph]:
    """Uniform Monte Carlo edge split (reference `random_holdout`)."""
    src, dst, idx = _canonical_edges(graph)
    rng = np.random.default_rng(random_state)
    perm = rng.permutation(len(src))
    n_train = int(round(train_size * len(src)))
    train_mask = np.zeros(len(src), dtype=bool)
    train_mask[perm[:n_train]] = True
    return (
        _subgraph_from_canonical(graph, train_mask, f"{graph.name}_train"),
        _subgraph_from_canonical(graph, ~train_mask, f"{graph.name}_test"),
    )


def edge_prediction_kfold(
    graph: Graph, k: int, holdout_number: int, random_state: int = 42
) -> Tuple[Graph, Graph]:
    """k-fold over canonical edges; fold `holdout_number` is the test set
    (reference `get_edge_prediction_kfold`)."""
    src, dst, idx = _canonical_edges(graph)
    rng = np.random.default_rng(random_state)
    perm = rng.permutation(len(src))
    folds = np.array_split(perm, k)
    test_mask = np.zeros(len(src), dtype=bool)
    test_mask[folds[holdout_number % k]] = True
    return (
        _subgraph_from_canonical(graph, ~test_mask, f"{graph.name}_train"),
        _subgraph_from_canonical(graph, test_mask, f"{graph.name}_test"),
    )


# ------------------------------------------------------------------ node-label
def _node_label_split_graphs(
    graph: Graph, train_nodes_mask: np.ndarray
) -> Tuple[Graph, Graph]:
    """Same topology, node types masked to the respective split (unknown types
    encoded as empty label sets)."""

    def masked(mask: np.ndarray, name: str) -> Graph:
        counts = np.diff(graph.node_type_ptr)
        keep_counts = np.where(mask, counts, 0)
        new_ptr = np.concatenate([[0], np.cumsum(keep_counts)]).astype(np.int64)
        keep_ids = np.repeat(mask, counts)
        new_ids = graph.node_type_ids[keep_ids]
        import dataclasses

        return dataclasses.replace(
            graph, node_type_ptr=new_ptr, node_type_ids=new_ids,
            name=f"{graph.name}_{name}",
        )

    return masked(train_nodes_mask, "train"), masked(~train_nodes_mask, "test")


def node_label_holdout(
    graph: Graph,
    train_size: float = 0.8,
    random_state: int = 42,
    use_stratification: bool = True,
) -> Tuple[Graph, Graph]:
    """(Stratified) Monte Carlo split of labelled nodes (reference
    `get_node_label_holdout_graphs`)."""
    known = graph.get_known_node_types_mask()
    rng = np.random.default_rng(random_state)
    train_mask = np.zeros(graph.number_of_nodes, dtype=bool)
    if use_stratification and not graph.has_multilabel_node_types():
        labels = graph.get_single_label_node_type_ids()
        for t in np.unique(labels[known]):
            nodes = np.nonzero(known & (labels == t))[0]
            perm = rng.permutation(len(nodes))
            n_train = int(round(train_size * len(nodes)))
            train_mask[nodes[perm[:n_train]]] = True
    else:
        nodes = np.nonzero(known)[0]
        perm = rng.permutation(len(nodes))
        train_mask[nodes[perm[: int(round(train_size * len(nodes)))]]] = True
    return _node_label_split_graphs(graph, train_mask)


def node_label_kfold(
    graph: Graph, k: int, holdout_number: int, random_state: int = 42,
    use_stratification: bool = True,
) -> Tuple[Graph, Graph]:
    known = graph.get_known_node_types_mask()
    rng = np.random.default_rng(random_state)
    test_mask = np.zeros(graph.number_of_nodes, dtype=bool)
    if use_stratification and not graph.has_multilabel_node_types():
        labels = graph.get_single_label_node_type_ids()
        for t in np.unique(labels[known]):
            nodes = np.nonzero(known & (labels == t))[0]
            perm = rng.permutation(len(nodes))
            folds = np.array_split(perm, k)
            test_mask[nodes[folds[holdout_number % k]]] = True
    else:
        nodes = np.nonzero(known)[0]
        perm = rng.permutation(len(nodes))
        folds = np.array_split(perm, k)
        test_mask[nodes[folds[holdout_number % k]]] = True
    train, test = _node_label_split_graphs(graph, known & ~test_mask)
    return train, test


# ------------------------------------------------------------------ edge-label
def edge_label_holdout(
    graph: Graph, train_size: float = 0.8, random_state: int = 42,
    use_stratification: bool = True,
) -> Tuple[Graph, Graph]:
    """Split edge labels: same topology, edge types masked (-1 = unknown) per
    split (reference edge-label holdouts, SURVEY §2.6)."""
    if graph.edge_types is None:
        raise ValueError("Graph has no edge types to split.")
    src, dst, idx = _canonical_edges(graph)
    etypes = graph.edge_types[idx]
    known = etypes >= 0
    rng = np.random.default_rng(random_state)
    train_edge = np.zeros(len(idx), dtype=bool)
    if use_stratification:
        for t in np.unique(etypes[known]):
            edges = np.nonzero(known & (etypes == t))[0]
            perm = rng.permutation(len(edges))
            train_edge[edges[perm[: int(round(train_size * len(edges)))]]] = True
    else:
        edges = np.nonzero(known)[0]
        perm = rng.permutation(len(edges))
        train_edge[edges[perm[: int(round(train_size * len(edges)))]]] = True

    def masked(mask_canon: np.ndarray, name: str) -> Graph:
        # Propagate canonical mask to all arcs via has_edges on canonical set.
        new_types = np.full(graph.number_of_directed_edges, -1, dtype=np.int32)
        sel = idx[mask_canon]
        new_types[sel] = graph.edge_types[sel]
        if not graph.directed:
            # mirror to reverse arcs
            rev = graph.get_edge_ids(graph.col_idx[sel], graph.sources[sel])
            ok = rev >= 0
            new_types[rev[ok]] = graph.edge_types[sel][ok]
        import dataclasses

        return dataclasses.replace(
            graph, edge_types=new_types, name=f"{graph.name}_{name}"
        )

    return masked(train_edge, "train"), masked(~train_edge, "test")


def edge_label_kfold(
    graph: Graph, k: int, holdout_number: int, random_state: int = 42,
) -> Tuple[Graph, Graph]:
    if graph.edge_types is None:
        raise ValueError("Graph has no edge types to split.")
    src, dst, idx = _canonical_edges(graph)
    etypes = graph.edge_types[idx]
    known = np.nonzero(etypes >= 0)[0]
    rng = np.random.default_rng(random_state)
    perm = rng.permutation(len(known))
    folds = np.array_split(perm, k)
    test = np.zeros(len(idx), dtype=bool)
    test[known[folds[holdout_number % k]]] = True
    train = np.zeros(len(idx), dtype=bool)
    train[known] = True
    train &= ~test

    def masked(mask_canon: np.ndarray, name: str) -> Graph:
        new_types = np.full(graph.number_of_directed_edges, -1, dtype=np.int32)
        sel = idx[mask_canon]
        new_types[sel] = graph.edge_types[sel]
        if not graph.directed:
            rev = graph.get_edge_ids(graph.col_idx[sel], graph.sources[sel])
            ok = rev >= 0
            new_types[rev[ok]] = graph.edge_types[sel][ok]
        import dataclasses

        return dataclasses.replace(
            graph, edge_types=new_types, name=f"{graph.name}_{name}"
        )

    return masked(train, "train"), masked(test, "test")
