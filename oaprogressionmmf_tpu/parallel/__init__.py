from .mesh import (
    batch_sharding, create_mesh, replicate, shard_batch_pytree,
    with_batch_constraint,
)

__all__ = ["create_mesh", "batch_sharding", "replicate",
           "shard_batch_pytree", "with_batch_constraint"]
