from .mesh import make_mesh
from .spmm import sharded_spmm, partition_coo
from .embedder import make_sharded_skipgram_step, shard_skipgram_params
from .distributed import holdout_belongs_to_this_worker, initialize_distributed

__all__ = [
    "make_mesh", "sharded_spmm", "partition_coo",
    "make_sharded_skipgram_step", "shard_skipgram_params",
    "initialize_distributed", "holdout_belongs_to_this_worker",
]
