from sv3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    point_sharding,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "point_sharding",
    "shard_batch",
    "replicate",
]
