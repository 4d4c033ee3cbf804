from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
    single_device_mesh,
)

__all__ = [
    "data_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
    "single_device_mesh",
]
