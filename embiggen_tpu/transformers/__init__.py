from .node import NodeTransformer
from .edge import EdgeTransformer
from .graph import GraphTransformer
from .tasks import (
    EdgeLabelPredictionTransformer,
    EdgePredictionTransformer,
    NodeLabelPredictionTransformer,
)

__all__ = [
    "NodeTransformer", "EdgeTransformer", "GraphTransformer",
    "EdgePredictionTransformer", "EdgeLabelPredictionTransformer",
    "NodeLabelPredictionTransformer",
]
