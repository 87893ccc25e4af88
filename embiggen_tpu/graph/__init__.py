"""Graph core: CSR container, loaders, generators, holdouts, kernels, metrics."""
from .graph import Graph, DeviceGraph, build_alias_tables
from .loaders import from_csv, from_pandas, get_dataset, karate_club, small_ppi
from .generators import (
    barabasi_albert,
    erdos_renyi,
    planted_partition,
    planted_partition_edges,
    random_geometric,
)
from .holdouts import (
    connected_holdout,
    random_holdout,
    edge_prediction_kfold,
    node_label_holdout,
    node_label_kfold,
    edge_label_holdout,
    edge_label_kfold,
)
from .sampling import sample_negative_graph, sample_positive_graph
from .laplacians import KERNELS, kernel_coo
from .metrics import edge_metrics, all_edge_metrics, EDGE_METRIC_NAMES

__all__ = [
    "Graph", "DeviceGraph", "build_alias_tables",
    "from_csv", "from_pandas", "get_dataset", "karate_club", "small_ppi",
    "barabasi_albert", "erdos_renyi", "planted_partition",
    "planted_partition_edges",
    "random_geometric",
    "connected_holdout", "random_holdout", "edge_prediction_kfold",
    "node_label_holdout", "node_label_kfold",
    "edge_label_holdout", "edge_label_kfold",
    "sample_negative_graph", "sample_positive_graph",
    "KERNELS", "kernel_coo",
    "edge_metrics", "all_edge_metrics", "EDGE_METRIC_NAMES",
]
