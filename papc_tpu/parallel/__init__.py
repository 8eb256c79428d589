"""papc_tpu.parallel — device mesh and sharding helpers."""

from papc_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
]
