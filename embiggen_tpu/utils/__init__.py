from .cache import Cache, cache_result
from .persistence import dump_model, load_model
from .checkpoint import load_pytree, save_pytree

__all__ = [
    "Cache", "cache_result", "dump_model", "load_model",
    "save_pytree", "load_pytree",
]
