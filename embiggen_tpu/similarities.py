"""DAG Resnik information-content similarity — native counterpart of the
reference's `models.DAGResnik` (reference
`embiggen/similarities/dag_resnik.py:7-438`): fit on a DAG with node
counts/frequencies, then query bipartite/clique similarity matrices by node
ids or names with an optional minimum-similarity filter.

Semantics: IC(n) = -log(p(n)) with p(n) the frequency mass of n's subtree;
sim(a, b) = IC of the Most Informative Common Ancestor (MICA).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .graph.graph import Graph


class DAGResnik:
    def __init__(self, verbose: bool = False):
        self._verbose = verbose
        self._graph: Optional[Graph] = None
        self._information_content: Optional[np.ndarray] = None
        self._ancestors: Optional[List[np.ndarray]] = None

    def fit(
        self,
        graph: Graph,
        node_counts: Optional[Dict[str, float]] = None,
        node_frequencies: Optional[np.ndarray] = None,
    ) -> "DAGResnik":
        """Graph arcs must point child -> parent (ontology edges). Counts
        propagate from each node to all its ancestors."""
        n = graph.number_of_nodes
        if node_frequencies is not None:
            counts = np.asarray(node_frequencies, dtype=np.float64)
        elif node_counts is not None:
            counts = np.zeros(n, dtype=np.float64)
            name_to_id = graph.node_name_to_id
            for name, c in node_counts.items():
                counts[name_to_id[name]] = c
        else:
            counts = np.ones(n, dtype=np.float64)

        # Ancestor closure by BFS along arcs (child -> parent).
        ancestors: List[np.ndarray] = []
        cumulative = counts.copy()
        for v in range(n):
            seen = {v}
            stack = [v]
            while stack:
                u = stack.pop()
                for p in graph.neighbors(u):
                    if p not in seen:
                        seen.add(int(p))
                        stack.append(int(p))
            anc = np.fromiter(seen, dtype=np.int64)
            ancestors.append(np.sort(anc))
            cumulative[anc[anc != v]] += counts[v]
        total = cumulative.max() if cumulative.max() > 0 else 1.0
        with np.errstate(divide="ignore"):
            ic = -np.log(np.maximum(cumulative / total, 1e-300))
        self._graph = graph
        self._information_content = ic
        self._ancestors = ancestors
        return self

    def _check_fitted(self):
        if self._graph is None:
            raise ValueError("DAGResnik must be fitted first.")

    def get_information_content(self) -> np.ndarray:
        self._check_fitted()
        return self._information_content

    def get_similarity_from_node_ids(self, a: int, b: int) -> float:
        self._check_fitted()
        common = np.intersect1d(
            self._ancestors[a], self._ancestors[b], assume_unique=True
        )
        if len(common) == 0:
            return 0.0
        return float(self._information_content[common].max())

    def get_similarities_from_bipartite_graph_node_ids(
        self,
        source_node_ids,
        destination_node_ids,
        minimum_similarity: Optional[float] = None,
        return_similarities_dataframe: bool = False,
    ):
        """[|S|, |D|] similarity matrix, or a tidy (source, destination,
        similarity) DataFrame filtered at minimum_similarity."""
        self._check_fitted()
        src = np.asarray(source_node_ids)
        dst = np.asarray(destination_node_ids)
        sim = np.zeros((len(src), len(dst)), dtype=np.float64)
        for i, a in enumerate(src):
            for j, b in enumerate(dst):
                sim[i, j] = self.get_similarity_from_node_ids(int(a), int(b))
        if return_similarities_dataframe:
            import pandas as pd

            names = self._graph.get_node_names()
            ii, jj = np.meshgrid(
                np.arange(len(src)), np.arange(len(dst)), indexing="ij"
            )
            df = pd.DataFrame(
                {
                    "source": names[src[ii.reshape(-1)]],
                    "destination": names[dst[jj.reshape(-1)]],
                    "resnik_score": sim.reshape(-1),
                }
            )
            if minimum_similarity is not None:
                df = df[df.resnik_score >= minimum_similarity]
            return df
        if minimum_similarity is not None:
            sim = np.where(sim >= minimum_similarity, sim, 0.0)
        return sim

    def get_similarities_from_bipartite_graph_node_names(
        self, source_node_names, destination_node_names, **kwargs
    ):
        self._check_fitted()
        return self.get_similarities_from_bipartite_graph_node_ids(
            self._graph.get_node_ids_from_names(source_node_names),
            self._graph.get_node_ids_from_names(destination_node_names),
            **kwargs,
        )

    def get_similarities_from_bipartite_graph_node_prefixes(
        self, source_node_prefixes, destination_node_prefixes, **kwargs
    ):
        self._check_fitted()
        names = self._graph.get_node_names()

        def match(prefixes):
            return np.asarray(
                [
                    i
                    for i, n in enumerate(names)
                    if any(n.startswith(p) for p in prefixes)
                ]
            )

        return self.get_similarities_from_bipartite_graph_node_ids(
            match(source_node_prefixes), match(destination_node_prefixes),
            **kwargs,
        )

    def get_similarities_from_clique_graph_node_ids(self, node_ids, **kwargs):
        return self.get_similarities_from_bipartite_graph_node_ids(
            node_ids, node_ids, **kwargs
        )

    def get_similarities_from_clique_graph_node_names(self, node_names, **kwargs):
        self._check_fitted()
        ids = self._graph.get_node_ids_from_names(node_names)
        return self.get_similarities_from_clique_graph_node_ids(ids, **kwargs)
