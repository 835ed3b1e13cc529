from .mesh import (
    batch_axes,
    batch_axis_size,
    batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    make_mesh,
    pad_to_multiple,
    put_batch,
    put_batch_tuple,
    put_replicated,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "batch_sharding",
    "batch_axis_size",
    "batch_axes",
    "replicated_sharding",
    "shard_batch",
    "pad_to_multiple",
    "init_distributed",
    "put_batch",
    "put_batch_tuple",
    "put_replicated",
]
