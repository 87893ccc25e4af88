"""GraphVisualizer — embedding-space visual analysis mirroring the reference's
`embiggen/visualizations/graph_visualizer.py` capability surface (5.6k LoC,
~40 plot methods; SURVEY.md §2.8): TSNE/PCA decomposition of node and edge
embeddings, plots for degrees / node types / edge types / edge weights /
connected components, positive-vs-negative edge score and topological-metric
histograms, node/edge subsampling (reference defaults: 20k nodes / 10k
edges, `graph_visualizer.py:111-114`), and a `fit_and_plot_all` facade.

Matplotlib-only (Agg-safe); every plot method returns (figure, axes).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .graph.graph import Graph
from .graph.metrics import edge_metrics
from .graph.sampling import sample_negative_graph
from .models.embedding_result import EmbeddingResult
from .ops import edge_ops


class GraphVisualizer:
    def __init__(
        self,
        graph: Graph,
        decomposition_method: str = "TSNE",
        n_components: int = 2,
        number_of_subsampled_nodes: int = 20_000,
        number_of_subsampled_edges: int = 10_000,
        number_of_subsampled_negative_edges: int = 10_000,
        edge_embedding_method: str = "Hadamard",
        random_state: int = 42,
    ):
        if decomposition_method not in ("TSNE", "PCA"):
            raise ValueError(
                f"Unknown decomposition method {decomposition_method!r}; "
                "use 'TSNE' or 'PCA'."
            )
        if n_components not in (2, 3):
            raise ValueError("n_components must be 2 or 3.")
        self._graph = graph
        self._decomposition_method = decomposition_method
        self._n_components = n_components
        self._n_nodes_sub = number_of_subsampled_nodes
        self._n_edges_sub = number_of_subsampled_edges
        self._n_neg_sub = number_of_subsampled_negative_edges
        self._edge_embedding_method = edge_embedding_method
        self._random_state = random_state
        self._node_decomposition: Optional[np.ndarray] = None
        self._edge_decomposition: Optional[np.ndarray] = None
        self._node_ids: Optional[np.ndarray] = None
        self._edge_ids: Optional[np.ndarray] = None
        self._node_features: Optional[np.ndarray] = None

    # ------------------------------------------------------------------- fit
    def _decompose(self, x: np.ndarray) -> np.ndarray:
        if x.shape[1] <= self._n_components:
            out = np.zeros((x.shape[0], self._n_components), dtype=np.float64)
            out[:, : x.shape[1]] = x
            return out
        if self._decomposition_method == "PCA":
            from sklearn.decomposition import PCA

            return PCA(
                n_components=self._n_components,
                random_state=self._random_state,
            ).fit_transform(x)
        from sklearn.manifold import TSNE

        perplexity = min(30, max(2, x.shape[0] // 4))
        return TSNE(
            n_components=self._n_components,
            random_state=self._random_state,
            perplexity=perplexity,
            init="random",
        ).fit_transform(x)

    def fit_nodes(self, node_features) -> "GraphVisualizer":
        if isinstance(node_features, EmbeddingResult):
            node_features = node_features.get_node_embedding_from_index(0)
        if hasattr(node_features, "loc"):
            node_features = node_features.to_numpy()
        x = np.asarray(node_features, dtype=np.float64)
        rng = np.random.default_rng(self._random_state)
        n = self._graph.number_of_nodes
        self._node_ids = (
            rng.choice(n, size=self._n_nodes_sub, replace=False)
            if n > self._n_nodes_sub
            else np.arange(n)
        )
        self._node_features = x
        self._node_decomposition = self._decompose(x[self._node_ids])
        return self

    def fit_edges(self, node_features) -> "GraphVisualizer":
        if isinstance(node_features, EmbeddingResult):
            node_features = node_features.get_node_embedding_from_index(0)
        if hasattr(node_features, "loc"):
            node_features = node_features.to_numpy()
        x = np.asarray(node_features, dtype=np.float64)
        rng = np.random.default_rng(self._random_state)
        e = self._graph.number_of_directed_edges
        self._edge_ids = (
            rng.choice(e, size=self._n_edges_sub, replace=False)
            if e > self._n_edges_sub
            else np.arange(e)
        )
        src = self._graph.sources[self._edge_ids]
        dst = self._graph.col_idx[self._edge_ids]
        fn = edge_ops.resolve(self._edge_embedding_method)
        emb = np.asarray(fn(x[src], x[dst]))
        self._edge_decomposition = self._decompose(emb)
        return self

    # ----------------------------------------------------------------- plots
    def _scatter(self, points, colors=None, title="", color_label=None,
                 categorical=False, labels=None):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        is_3d = points.shape[1] == 3
        fig = plt.figure(figsize=(7, 6))
        ax = fig.add_subplot(projection="3d" if is_3d else None)
        coords = [points[:, i] for i in range(points.shape[1])]
        if categorical and colors is not None:
            uniq = np.unique(colors)
            cmap = matplotlib.colormaps["tab10"]
            for i, value in enumerate(uniq):
                mask = colors == value
                label = labels[value] if labels is not None else str(value)
                ax.scatter(
                    *(c[mask] for c in coords), s=6,
                    color=cmap(i % 10), label=label,
                )
            ax.legend(loc="best", fontsize=8)
        else:
            sc = ax.scatter(*coords, c=colors, s=6, cmap="viridis")
            if colors is not None:
                fig.colorbar(sc, ax=ax, label=color_label)
        ax.set_title(title)
        return fig, ax

    def _require_nodes(self):
        if self._node_decomposition is None:
            raise ValueError("Call fit_nodes(features) first.")

    def plot_nodes(self):
        self._require_nodes()
        return self._scatter(
            self._node_decomposition,
            title=f"{self._graph.name} nodes "
            f"({self._decomposition_method})",
        )

    def plot_node_degrees(self):
        self._require_nodes()
        degrees = self._graph.degrees[self._node_ids]
        return self._scatter(
            self._node_decomposition,
            colors=np.log1p(degrees),
            title=f"{self._graph.name} node degrees",
            color_label="log1p(degree)",
        )

    def plot_node_types(self):
        self._require_nodes()
        if not self._graph.has_node_types:
            raise ValueError("Graph has no node types.")
        labels = self._graph.get_single_label_node_type_ids()[self._node_ids]
        return self._scatter(
            self._node_decomposition,
            colors=labels,
            categorical=True,
            labels=self._graph.get_node_type_names(),
            title=f"{self._graph.name} node types",
        )

    def plot_connected_components(self):
        self._require_nodes()
        comp, n_comp = self._graph.connected_components()
        return self._scatter(
            self._node_decomposition,
            colors=comp[self._node_ids],
            categorical=n_comp <= 10,
            title=f"{self._graph.name} components (n={n_comp})",
        )

    def plot_edge_types(self):
        if self._edge_decomposition is None:
            raise ValueError("Call fit_edges(features) first.")
        if not self._graph.has_edge_types:
            raise ValueError("Graph has no edge types.")
        labels = self._graph.edge_types[self._edge_ids]
        return self._scatter(
            self._edge_decomposition,
            colors=labels,
            categorical=True,
            labels=self._graph.get_edge_type_names(),
            title=f"{self._graph.name} edge types",
        )

    def plot_edge_weights(self):
        if self._edge_decomposition is None:
            raise ValueError("Call fit_edges(features) first.")
        if not self._graph.has_edge_weights:
            raise ValueError("Graph has no edge weights.")
        return self._scatter(
            self._edge_decomposition,
            colors=self._graph.weights[self._edge_ids],
            title=f"{self._graph.name} edge weights",
            color_label="weight",
        )

    def plot_positive_and_negative_edges(self):
        """Decompose positive vs sampled negative edge embeddings together
        (reference pos-vs-neg plots)."""
        if self._node_features is None:
            raise ValueError("Call fit_nodes(features) first.")
        rng = np.random.default_rng(self._random_state)
        neg = sample_negative_graph(
            self._graph,
            min(self._n_neg_sub, self._graph.number_of_edges),
            random_state=self._random_state,
        )
        e = self._graph.number_of_directed_edges
        pos_ids = (
            rng.choice(e, size=self._n_edges_sub, replace=False)
            if e > self._n_edges_sub
            else np.arange(e)
        )
        fn = edge_ops.resolve(self._edge_embedding_method)
        x = self._node_features
        pos_emb = np.asarray(
            fn(x[self._graph.sources[pos_ids]], x[self._graph.col_idx[pos_ids]])
        )
        neg_emb = np.asarray(fn(x[neg.sources], x[neg.col_idx]))
        both = self._decompose(np.concatenate([pos_emb, neg_emb]))
        labels = np.concatenate(
            [np.zeros(len(pos_emb), int), np.ones(len(neg_emb), int)]
        )
        return self._scatter(
            both,
            colors=labels,
            categorical=True,
            labels=np.asarray(["existent", "non-existent"], dtype=object),
            title=f"{self._graph.name} positive vs negative edges",
        )

    def plot_positive_and_negative_edge_metrics(self):
        """Histograms of Adamic-Adar / Jaccard / RA / PA for positive vs
        sampled negative edges (reference metric plots)."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        rng = np.random.default_rng(self._random_state)
        e = self._graph.number_of_directed_edges
        pos_ids = (
            rng.choice(e, size=self._n_edges_sub, replace=False)
            if e > self._n_edges_sub
            else np.arange(e)
        )
        neg = sample_negative_graph(
            self._graph,
            min(self._n_neg_sub, self._graph.number_of_edges),
            random_state=self._random_state,
        )
        pos_m = edge_metrics(
            self._graph,
            self._graph.sources[pos_ids],
            self._graph.col_idx[pos_ids],
        )
        neg_m = edge_metrics(self._graph, neg.sources, neg.col_idx)
        names = [
            "Adamic-Adar", "Jaccard coefficient",
            "Resource allocation", "Preferential attachment",
        ]
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        for i, (ax, title) in enumerate(zip(axes.reshape(-1), names)):
            ax.hist(
                [pos_m[:, i], neg_m[:, i]], bins=30,
                label=["existent", "non-existent"], density=True,
            )
            ax.set_title(title)
            ax.legend(fontsize=8)
        fig.suptitle(f"{self._graph.name} edge metrics")
        return fig, axes

    def plot_degree_distribution(self):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        degrees = np.sort(self._graph.degrees)[::-1]
        ax.loglog(np.arange(1, len(degrees) + 1), degrees)
        ax.set_xlabel("rank")
        ax.set_ylabel("degree")
        ax.set_title(f"{self._graph.name} degree distribution")
        return fig, ax

    def fit_and_plot_all(self, node_features) -> List:
        """Run every applicable plot (reference
        `GraphVisualizer.fit_and_plot_all`, `graph_visualizer.py:5280`)."""
        self.fit_nodes(node_features)
        self.fit_edges(node_features)
        figures = [
            self.plot_nodes(),
            self.plot_node_degrees(),
            self.plot_degree_distribution(),
            self.plot_connected_components(),
            self.plot_positive_and_negative_edges(),
            self.plot_positive_and_negative_edge_metrics(),
        ]
        if self._graph.has_node_types:
            figures.append(self.plot_node_types())
        if self._graph.has_edge_types:
            figures.append(self.plot_edge_types())
        if self._graph.has_edge_weights:
            figures.append(self.plot_edge_weights())
        return figures
