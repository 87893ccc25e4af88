from .mesh import make_mesh, resolve_mesh
from .spmm import sharded_spmm, partition_coo
from .halo import (
    HaloPartition,
    build_halo_partition,
    halo_spmm,
    shard_features,
)
from .embedder import (
    make_dp_skipgram_step,
    make_sharded_skipgram_step,
    shard_skipgram_params,
)
from .sharded_table import (
    make_row_sharded_skipgram_step,
    shard_rows_skipgram_params,
)
from . import sharded_table
from .gcn import init_sharded_gcn_params, make_sharded_gcn_edge_step
from .distributed import holdout_belongs_to_this_worker, initialize_distributed

__all__ = [
    "make_mesh", "resolve_mesh", "sharded_spmm", "partition_coo",
    "HaloPartition", "build_halo_partition", "halo_spmm", "shard_features",
    "make_dp_skipgram_step", "make_sharded_skipgram_step",
    "shard_skipgram_params",
    "init_sharded_gcn_params", "make_sharded_gcn_edge_step",
    "initialize_distributed", "holdout_belongs_to_this_worker",
]
