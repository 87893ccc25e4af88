"""Graph loaders: edge-list TSV/CSV files and tiny built-in graphs.

Replaces the reference's dataset retrieval entry points
(`ensmallen.datasets.get_dataset`, used at reference
`embiggen/utils/pipeline.py:97-102`) with local file loading plus named
built-in datasets used by tests (the reference test fixtures are real small
graphs — SURVEY.md §4).
"""
from __future__ import annotations

import gzip
import io
from typing import Dict, Optional, Sequence

import numpy as np

from .graph import Graph


def from_pandas(
    df,
    source_column: str = "subject",
    destination_column: str = "object",
    weight_column: Optional[str] = None,
    edge_type_column: Optional[str] = None,
    directed: bool = False,
    name: str = "Graph",
) -> Graph:
    src_names = df[source_column].astype(str).to_numpy()
    dst_names = df[destination_column].astype(str).to_numpy()
    all_names, inverse = np.unique(
        np.concatenate([src_names, dst_names]), return_inverse=True
    )
    src = inverse[: len(src_names)]
    dst = inverse[len(src_names):]
    weights = None
    if weight_column is not None and weight_column in df.columns:
        weights = df[weight_column].astype(np.float32).to_numpy()
    edge_types = edge_type_names = None
    if edge_type_column is not None and edge_type_column in df.columns:
        names = df[edge_type_column].astype(str).to_numpy()
        edge_type_names, edge_types = np.unique(names, return_inverse=True)
        edge_types = edge_types.astype(np.int32)
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=len(all_names),
        weights=weights,
        edge_types=edge_types,
        directed=directed,
        name=name,
        node_names=all_names,
        edge_type_names=edge_type_names,
    )


def from_csv(
    path: str,
    source_column: str = "subject",
    destination_column: str = "object",
    weight_column: Optional[str] = "weight",
    edge_type_column: Optional[str] = "edge_label",
    directed: bool = False,
    sep: str = "\t",
    name: Optional[str] = None,
    use_native_parser: bool = True,
) -> Graph:
    """Load an edge-list file (format of reference `tests/data/small_ppi.tsv`:
    subject/object/weight/edge_label columns). Uses the C++ native parser
    (`embiggen_tpu.native`) when available, else pandas."""
    import pandas as pd

    if use_native_parser and not path.endswith(".gz"):
        graph = _from_csv_native(
            path, source_column, destination_column, weight_column,
            edge_type_column, directed, sep, name,
        )
        if graph is not None:
            return graph

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        df = pd.read_csv(f, sep=sep)
    cols = set(df.columns)
    return from_pandas(
        df,
        source_column=source_column,
        destination_column=destination_column,
        weight_column=weight_column if weight_column in cols else None,
        edge_type_column=edge_type_column if edge_type_column in cols else None,
        directed=directed,
        name=name or path.rsplit("/", 1)[-1].split(".")[0],
    )


def _from_csv_native(
    path, source_column, destination_column, weight_column, edge_type_column,
    directed, sep, name,
):
    """C++ parse path; returns None when the native lib or columns are
    unavailable."""
    try:
        from .. import native
    except ImportError:
        return None
    try:
        with open(path, "r") as f:
            header = f.readline().rstrip("\n").rstrip("\r").split(sep)
    except OSError:
        return None
    cols = {c: i for i, c in enumerate(header)}
    if source_column not in cols or destination_column not in cols:
        return None
    parsed = native.parse_edge_list(
        path,
        sep=sep,
        skip_header=True,
        src_col=cols[source_column],
        dst_col=cols[destination_column],
        weight_col=cols.get(weight_column, -1) if weight_column else -1,
        type_col=cols.get(edge_type_column, -1) if edge_type_column else -1,
    )
    if parsed is None:
        return None
    src, dst, weights, edge_types, node_names, edge_type_names = parsed
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=len(node_names),
        weights=weights,
        edge_types=edge_types,
        directed=directed,
        name=name or path.rsplit("/", 1)[-1].split(".")[0],
        node_names=node_names,
        edge_type_names=edge_type_names,
    )


# --------------------------------------------------------------------- builtin
_ZKC_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]
_ZKC_COMMUNITY = [
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
]


def karate_club() -> Graph:
    """Zachary's karate club, with the 2-community labels as node types."""
    src, dst = np.asarray(_ZKC_EDGES).T
    ntypes = np.asarray(_ZKC_COMMUNITY, dtype=np.int32)
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=34,
        directed=False,
        name="KarateClub",
        node_type_ptr=np.arange(35, dtype=np.int64),
        node_type_ids=ntypes,
        node_type_names=["Mr. Hi", "Officer"],
    )


def small_ppi(path: Optional[str] = None) -> Graph:
    """The reference's STRING PPI fixture (reference `tests/data/small_ppi.tsv`,
    3000 weighted, edge-labelled edges)."""
    import os

    if path is None:
        here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        for cand in (
            os.path.join(here, "tests", "data", "small_ppi.tsv"),
            "/root/reference/tests/data/small_ppi.tsv",
        ):
            if os.path.exists(cand):
                path = cand
                break
    if path is None:
        raise FileNotFoundError("small_ppi.tsv not found")
    return from_csv(path, name="SmallPPI")


_DATASETS = {
    "karateclub": karate_club,
    "smallppi": small_ppi,
}


def get_dataset(name: str, **kwargs) -> Graph:
    key = name.replace("_", "").replace("-", "").lower()
    if key in _DATASETS:
        return _DATASETS[key](**kwargs)
    from . import generators

    if key.startswith("synthetic"):
        return generators.barabasi_albert(10_000, 10, seed=42)
    raise KeyError(
        f"Unknown dataset {name!r}. Available: {sorted(_DATASETS)} "
        "or load a file via embiggen_tpu.graph.from_csv."
    )
