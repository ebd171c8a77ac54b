from stf_unet_tpu.core.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    PKConfig,
)
from stf_unet_tpu.core.mesh import create_mesh, batch_sharding, replicated_sharding
from stf_unet_tpu.core.dtypes import Policy

__all__ = [
    "DataConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "PKConfig",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "Policy",
]
