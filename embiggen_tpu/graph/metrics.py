"""Per-edge topological heuristics — replaces the reference engine's
`get_all_edge_metrics` (Adamic-Adar, Jaccard coefficient, resource allocation,
preferential attachment; reference usage in `embiggen/edge_prediction` and the
visualizer — SURVEY.md §2.9 item 6).

Vectorized host implementation via sorted-neighbour intersections; a JAX
variant lives in `embiggen_tpu.ops.edge_metrics` for on-device batches.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .graph import Graph

EDGE_METRIC_NAMES = [
    "AdamicAdar",
    "JaccardCoefficient",
    "ResourceAllocationIndex",
    "PreferentialAttachment",
]


def _neighbour_intersections(
    graph: Graph, src: np.ndarray, dst: np.ndarray
) -> Dict[str, np.ndarray]:
    """For each query pair, reduce over common neighbours. Returns sums needed
    by all metrics in one pass."""
    deg = graph.degrees.astype(np.float64)
    inv_log_deg = np.where(deg > 1, 1.0 / np.log(np.maximum(deg, 2)), 0.0)
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)

    n_q = len(src)
    aa = np.zeros(n_q)
    ra = np.zeros(n_q)
    inter = np.zeros(n_q)
    for i in range(n_q):
        a = graph.neighbors(int(src[i]))
        b = graph.neighbors(int(dst[i]))
        common = np.intersect1d(a, b, assume_unique=True)
        inter[i] = len(common)
        if len(common):
            aa[i] = inv_log_deg[common].sum()
            ra[i] = inv_deg[common].sum()
    return {"intersection": inter, "adamic_adar": aa, "resource_allocation": ra}


def edge_metrics(
    graph: Graph, src: np.ndarray, dst: np.ndarray
) -> np.ndarray:
    """[B, 4] float32: Adamic-Adar, Jaccard, Resource Allocation, Preferential
    Attachment for each (src, dst) pair."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    parts = _neighbour_intersections(graph, src, dst)
    deg = graph.degrees.astype(np.float64)
    union = deg[src] + deg[dst] - parts["intersection"]
    jaccard = np.where(union > 0, parts["intersection"] / np.maximum(union, 1), 0.0)
    pa = deg[src] * deg[dst]
    return np.stack(
        [parts["adamic_adar"], jaccard, parts["resource_allocation"], pa], axis=1
    ).astype(np.float32)


def all_edge_metrics(graph: Graph) -> np.ndarray:
    """[E, 4] metrics for every arc of the graph."""
    return edge_metrics(graph, graph.sources, graph.col_idx)
