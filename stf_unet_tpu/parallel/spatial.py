"""Spatial (H-axis) sharding for very large slices (SURVEY §5 long-context:
the scaling dimension of this workload is spatial x temporal voxel count,
not token count — ring attention / Ulysses are N/A; the spatial axis shards
instead).

Under GSPMD it takes no model changes: shard the input's H axis over a
'space' mesh axis and jit the forward — XLA inserts the conv halo
exchanges (and gathers for the few H-dense ops like the separable-matmul
resize) automatically. This module provides the mesh/sharding helpers and
is validated on the CPU-simulated mesh against unsharded execution
(tests/test_spatial.py).

Mesh layout: ('data', 'space') — batch over 'data', image rows over
'space'; a model axis can be added the same way later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stf_unet_tpu.core.mesh import DATA_AXIS, SPACE_AXIS


def create_2d_mesh(n_data: int, n_space: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_space
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_space} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def spatial_sharding(mesh: Mesh, ndim: int, h_axis: int,
                     batch_axis: Optional[int] = 0) -> NamedSharding:
    """Shard `batch_axis` over 'data' and `h_axis` (image rows) over
    'space'; replicate everything else."""
    spec = [None] * ndim
    if batch_axis is not None:
        spec[batch_axis] = DATA_AXIS
    spec[h_axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))
