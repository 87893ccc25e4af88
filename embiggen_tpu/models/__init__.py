from .abstract import AbstractEmbeddingModel, AbstractModel
from .embedding_result import EmbeddingResult
from .registry import (
    MODELS_LIBRARY,
    find_available_models,
    get_model_from_library,
    register_model,
)
from . import embedders

__all__ = [
    "AbstractModel", "AbstractEmbeddingModel", "EmbeddingResult",
    "MODELS_LIBRARY", "register_model", "get_model_from_library",
    "find_available_models", "embedders",
]
