from .abstract import AbstractEmbeddingModel, AbstractModel
from .classifier import AbstractClassifierModel
from .embedding_result import EmbeddingResult
from .registry import (
    MODELS_LIBRARY,
    find_available_models,
    get_model_from_library,
    register_model,
)
from . import embedders
from . import gcn
from . import edge_prediction
from . import node_label_prediction
from . import edge_label_prediction
from . import feature_preprocessors
from . import edge_features
from . import stub

__all__ = [
    "AbstractModel", "AbstractEmbeddingModel", "AbstractClassifierModel",
    "EmbeddingResult",
    "MODELS_LIBRARY", "register_model", "get_model_from_library",
    "find_available_models",
    "embedders", "gcn", "edge_prediction", "node_label_prediction",
    "edge_label_prediction",
]
