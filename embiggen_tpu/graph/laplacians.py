"""Graph convolution kernels (normalized adjacency matrices) in COO form —
replaces the reference engine's `get_{left,right,symmetric}_normalized_
laplacian_coo_matrix` and the 13 kernel names enumerated at reference
`embiggen/utils/abstract_gcn.py:184-199` (our names fix the reference's
"Trasposed" typo but the typo'd spellings are accepted as aliases).
"""
from __future__ import annotations

import warnings
from typing import Optional, Tuple

import numpy as np

from .graph import Graph

MULTIGRAPH_POLICIES = ("drop", "warn", "raise")


def validate_convolution_graph(
    graph: Graph, handling_multi_graph: str = "warn"
) -> None:
    """Singleton + multigraph guards for propagation kernels, mirroring
    reference `abstract_gcn.py:97-118`.

    Multigraph policy: "drop" silently deduplicates parallel arcs, "warn"
    warns then deduplicates, "raise" refuses (reference `:108-118`,
    `handling_multi_graph` param `:228`). Deduplication itself happens in
    `kernel_coo` (parallel arcs would otherwise double-count in every
    propagation kernel).

    Singletons: the reference hard-errors because its TF sparse machinery
    cannot represent empty rows (`abstract_gcn.py:97-106`); our padded
    COO/ELLPACK kernels handle zero-degree rows (they convolve to zeros),
    so we degrade the error to a warning carrying the same remedies.
    """
    if handling_multi_graph not in MULTIGRAPH_POLICIES:
        raise ValueError(
            f"handling_multi_graph must be one of {MULTIGRAPH_POLICIES}, "
            f"got {handling_multi_graph!r}."
        )
    if graph.has_singleton_nodes():
        warnings.warn(
            f"The provided graph {graph.name!r} has "
            f"{graph.get_number_of_singleton_nodes()} singleton nodes; "
            "their convolved representations are zero vectors. Consider "
            "`graph.remove_singleton_nodes()` or adding selfloops "
            "(the reference GCN rejects such graphs outright)."
        )
    if graph.is_multigraph():
        message = (
            "The GCN propagation kernels do not support multigraphs: "
            "parallel arcs are deduplicated before building the "
            "adjacency matrix."
        )
        if handling_multi_graph == "warn":
            warnings.warn(message)
        elif handling_multi_graph == "raise":
            raise ValueError(message)

KERNELS = [
    "Weights",
    "Left Normalized Laplacian",
    "Right Normalized Laplacian",
    "Symmetric Normalized Laplacian",
    "Transposed Left Normalized Laplacian",
    "Transposed Right Normalized Laplacian",
    "Transposed Symmetric Normalized Laplacian",
    "Weighted Left Normalized Laplacian",
    "Weighted Right Normalized Laplacian",
    "Weighted Symmetric Normalized Laplacian",
    "Transposed Weighted Left Normalized Laplacian",
    "Transposed Weighted Right Normalized Laplacian",
    "Transposed Weighted Symmetric Normalized Laplacian",
]


def _base_values(graph: Graph, weighted: bool) -> np.ndarray:
    if weighted:
        if graph.weights is None:
            raise ValueError(
                f"Kernel requires edge weights but graph {graph.name} has none."
            )
        return graph.weights.astype(np.float64)
    return np.ones(graph.number_of_directed_edges, dtype=np.float64)


def kernel_coo(
    graph: Graph, kernel: str = "Symmetric Normalized Laplacian",
    handling_multi_graph: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (rows, cols, values) of the requested propagation kernel.

    Normalizations use (weighted) degrees of the self-loop-free adjacency:
      Left:  D^-1 A      Right: A D^-1      Symmetric: D^-1/2 A D^-1/2

    With `handling_multi_graph` set, the multigraph/singleton guards of
    `validate_convolution_graph` run first; duplicate arcs are ALWAYS
    deduplicated (keep-first, matching `remove_parallel_edges`) so
    multigraphs never double-count in the propagation.
    """
    if handling_multi_graph is not None:
        validate_convolution_graph(graph, handling_multi_graph)
    name = kernel.replace("Trasposed", "Transposed")
    if name not in KERNELS:
        raise ValueError(f"Unknown kernel {kernel!r}; supported: {KERNELS}")
    transposed = name.startswith("Transposed ")
    core = name.removeprefix("Transposed ")
    weighted = core.startswith("Weighted ") or core == "Weights"
    core = core.removeprefix("Weighted ")

    rows = graph.sources.astype(np.int64)
    cols = graph.col_idx.astype(np.int64)
    vals = _base_values(graph, weighted)
    if len(rows):
        # CSR arcs are (row, col)-sorted: parallel arcs are adjacent.
        keep = np.concatenate(
            [[True], (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])]
        )
        if not keep.all():
            rows, cols, vals = rows[keep], cols[keep], vals[keep]

    if core != "Weights":
        deg = np.zeros(graph.number_of_nodes, dtype=np.float64)
        np.add.at(deg, rows, vals)
        in_deg = np.zeros(graph.number_of_nodes, dtype=np.float64)
        np.add.at(in_deg, cols, vals)
        with np.errstate(divide="ignore"):
            if core == "Left Normalized Laplacian":
                inv = np.where(deg > 0, 1.0 / deg, 0.0)
                vals = vals * inv[rows]
            elif core == "Right Normalized Laplacian":
                inv = np.where(in_deg > 0, 1.0 / in_deg, 0.0)
                vals = vals * inv[cols]
            elif core == "Symmetric Normalized Laplacian":
                inv_s = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
                inv_d = np.where(in_deg > 0, 1.0 / np.sqrt(in_deg), 0.0)
                vals = vals * inv_s[rows] * inv_d[cols]
            else:
                raise AssertionError(core)

    if transposed:
        rows, cols = cols, rows

    if np.isnan(vals).any():
        raise ValueError(f"Kernel {kernel!r} produced NaN values.")
    return rows, cols, vals.astype(np.float32)


def validate_kernel_values(values: np.ndarray, kernel: str) -> None:
    """Reject NaN and all-zero kernels, mirroring reference checks
    (`abstract_gcn.py:158-170`)."""
    if np.isnan(values).any():
        raise ValueError(f"Kernel {kernel!r} contains NaN weights.")
    if len(values) and not values.any():
        raise ValueError(f"Kernel {kernel!r} contains only zero weights.")
