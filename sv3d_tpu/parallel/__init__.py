from sv3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    point_sharding,
    replicate,
    replicate_tree,
    shard_batch,
)
from sv3d_tpu.parallel.multihost import (
    initialize_distributed,
    is_main_process,
    process_count,
    process_index,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "point_sharding",
    "shard_batch",
    "replicate",
    "replicate_tree",
    "initialize_distributed",
    "is_main_process",
    "process_count",
    "process_index",
]
