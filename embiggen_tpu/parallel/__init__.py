from .mesh import make_mesh
from .spmm import sharded_spmm, partition_coo
from .embedder import make_sharded_skipgram_step, shard_skipgram_params

__all__ = [
    "make_mesh", "sharded_spmm", "partition_coo",
    "make_sharded_skipgram_step", "shard_skipgram_params",
]
