from .mesh import (
    make_mesh,
    make_mesh_2d,
    shard_batch,
    shard_batch_spatial,
    replicate,
    batch_sharding,
    spatial_batch_sharding,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "shard_batch_spatial",
    "replicate",
    "batch_sharding",
    "spatial_batch_sharding",
]
