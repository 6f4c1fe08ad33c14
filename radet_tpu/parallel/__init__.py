from .mesh import (
    batch_sharding,
    create_mesh,
    image_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "image_sharding",
    "replicated_sharding",
    "shard_batch",
]
