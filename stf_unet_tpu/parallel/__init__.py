from stf_unet_tpu.core.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    pad_batch_to_multiple,
    replicate,
    replicated_sharding,
    shard_batch,
)
from stf_unet_tpu.parallel.spatial import (
    SPACE_AXIS,
    create_2d_mesh,
    spatial_sharding,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "create_mesh",
    "create_2d_mesh",
    "pad_batch_to_multiple",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "spatial_sharding",
]
