from .core import GCNEncoder, TrainLoop
from .node_label import (
    GCNNodeLabelPrediction,
    GNNNodeLabelPrediction,
    GraphSAGENodeLabelPrediction,
    KipfGCNNodeLabelPrediction,
)
from .edge import (
    GCNEdgeLabelPrediction,
    GCNEdgePrediction,
    GNNEdgeLabelPrediction,
    GNNEdgePrediction,
    GraphSAGEEdgeLabelPrediction,
    GraphSAGEEdgePrediction,
    KipfGCNEdgeLabelPrediction,
    KipfGCNEdgePrediction,
)

__all__ = [
    "GCNEncoder", "TrainLoop",
    "GCNNodeLabelPrediction", "KipfGCNNodeLabelPrediction",
    "GraphSAGENodeLabelPrediction", "GNNNodeLabelPrediction",
    "GCNEdgePrediction", "KipfGCNEdgePrediction",
    "GraphSAGEEdgePrediction", "GNNEdgePrediction",
    "GCNEdgeLabelPrediction", "KipfGCNEdgeLabelPrediction",
    "GraphSAGEEdgeLabelPrediction", "GNNEdgeLabelPrediction",
]
