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


class DatasetSpec:
    """A named corpus from the reference's `ensmallen.datasets` registry
    (reference call sites: `utils/pipeline.py:97-102` resolves graph names
    through `ensmallen.datasets.get_dataset`; tests use `linqs.Cora`,
    `kgobo.CIO`, `networkrepository.Usair97`).

    This environment has no network egress, so named corpora resolve in
    three tiers: (1) a local edge-list file (`path=` argument,
    `$EMBIGGEN_DATA_DIR/<Name>.tsv`, or `./datasets/<Name>.tsv`);
    (2) with `synthetic_fallback=True`, a deterministic generated graph of
    the corpus's published size/shape (clearly renamed
    "<Name>SyntheticStandIn" — never silently substituted); (3) otherwise
    an error explaining both options."""

    def __init__(self, name, repository, n_nodes, n_edges,
                 n_node_types=0, weighted=False, directed=False):
        self.name = name
        self.repository = repository
        self.n_nodes = n_nodes
        self.n_edges = n_edges
        self.n_node_types = n_node_types
        self.weighted = weighted
        self.directed = directed

    def synthetic(self) -> Graph:
        import dataclasses

        from . import generators

        stand_in = f"{self.name}SyntheticStandIn"
        if self.n_node_types > 1:
            density = 2.0 * self.n_edges / max(self.n_nodes, 1) ** 2
            g = generators.planted_partition(
                n_nodes=self.n_nodes,
                n_communities=self.n_node_types,
                p_in=min(1.0, 4.0 * density * self.n_node_types),
                p_out=min(1.0, 0.4 * density),
                seed=42,
                name=stand_in,
            )
            return g
        m = max(1, self.n_edges // max(self.n_nodes, 1))
        g = generators.barabasi_albert(self.n_nodes, m, seed=42)
        if self.weighted and g.weights is None:
            rng = np.random.default_rng(7)
            g = dataclasses.replace(
                g,
                weights=(0.5 + rng.random(
                    g.number_of_directed_edges
                )).astype(np.float32),
            )
        return dataclasses.replace(g, name=stand_in)


# Published sizes of the corpora the reference's tests/docs actually use.
_NAMED_CORPORA = {
    "cora": DatasetSpec("Cora", "linqs", 2708, 5429, n_node_types=7),
    "citeseer": DatasetSpec("CiteSeer", "linqs", 3327, 4732, n_node_types=6),
    "pubmeddiabetes": DatasetSpec(
        "PubMedDiabetes", "linqs", 19717, 44338, n_node_types=3
    ),
    "cio": DatasetSpec("CIO", "kgobo", 829, 1083, n_node_types=2),
    "usair97": DatasetSpec(
        "Usair97", "networkrepository", 332, 2126, weighted=True
    ),
    "homosapiens": DatasetSpec(
        "HomoSapiens", "string", 19566, 5879727, weighted=True
    ),
}


def _local_corpus_path(name: str) -> Optional[str]:
    import os

    candidates = []
    data_dir = os.environ.get("EMBIGGEN_DATA_DIR")
    for base in ([data_dir] if data_dir else []) + ["datasets"]:
        for ext in (".tsv", ".csv", ".edges"):
            candidates.append(os.path.join(base, name + ext))
    for cand in candidates:
        if os.path.exists(cand):
            return cand
    return None


def get_dataset(
    name: str,
    repository: Optional[str] = None,
    path: Optional[str] = None,
    synthetic_fallback: bool = False,
    **kwargs,
) -> Graph:
    """Resolve a graph by name — the stand-in for the reference's
    `ensmallen.datasets.get_dataset` (reference `utils/pipeline.py:97-102`).

    Bundled graphs ("KarateClub", "SmallPPI") load directly. Named corpora
    from the reference's registries (Cora, CiteSeer, PubMedDiabetes, CIO,
    Usair97, HomoSapiens) resolve from a local file when available (see
    `DatasetSpec`), or from a deterministic synthetic stand-in when
    `synthetic_fallback=True`; downloads are unavailable in this
    environment."""
    key = name.replace("_", "").replace("-", "").lower()
    if key in _DATASETS:
        return _DATASETS[key](**kwargs)
    from . import generators

    if key.startswith("synthetic"):
        return generators.barabasi_albert(10_000, 10, seed=42)
    if key in _NAMED_CORPORA:
        spec = _NAMED_CORPORA[key]
        if repository is not None and repository.lower() != spec.repository:
            raise KeyError(
                f"{spec.name} lives in repository {spec.repository!r}, "
                f"not {repository!r}"
            )
        p = path or _local_corpus_path(spec.name)
        if p is not None:
            return from_csv(p, name=spec.name, **kwargs)
        if synthetic_fallback:
            return spec.synthetic()
        raise FileNotFoundError(
            f"Dataset {spec.name!r} ({spec.repository}) is registered but "
            "cannot be downloaded in this environment. Provide the edge "
            "list via `path=`, drop it under $EMBIGGEN_DATA_DIR/"
            f"{spec.name}.tsv or ./datasets/{spec.name}.tsv, or pass "
            "synthetic_fallback=True for a deterministic stand-in of the "
            "same size (clearly renamed, never silently substituted)."
        )
    raise KeyError(
        f"Unknown dataset {name!r}. Available: "
        f"{sorted(_DATASETS) + sorted(_NAMED_CORPORA)} "
        "or load a file via embiggen_tpu.graph.from_csv."
    )
