from .mesh import (
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_to_multiple",
]
