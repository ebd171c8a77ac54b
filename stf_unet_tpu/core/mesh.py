"""Device mesh + sharding helpers.

The reference has no real distributed layer (only dist.all_reduce hooks,
ref:train_utils/train_and_eval.py:51-57,125-132); this module supplies the
first-class TPU data-parallel layer: a 1-D `Mesh(('data',))` over which the
batch axis of inputs/targets is sharded with NamedSharding. Everything else
(gradient reductions, BatchNorm batch statistics, metric sums) becomes a
global computation automatically under jit/GSPMD — XLA inserts the ICI
collectives. A 'model' axis can be added later without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
# Optional second mesh axis sharding image rows (parallel/spatial.py);
# shard_batch recognises it and shards H as well as batch.
SPACE_AXIS = "space"


def create_mesh(n_data: int = 0, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a 1-D data-parallel mesh.

    n_data=0 uses every visible device. Works identically on a real TPU
    slice and on the CPU-simulated 8-device mesh used in CI
    (XLA_FLAGS=--xla_force_host_platform_device_count=8).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} data shards but only {len(devices)} devices")
    if jax.process_count() > 1 and n_data != len(devices):
        # A prefix subset would hold only the first hosts' chips; other
        # processes could not address the mesh.
        raise ValueError(
            f"multi-host meshes must span all {len(devices)} global devices "
            f"(got data_parallel={n_data}); use data_parallel=0")
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; replicate the rest.

    On a 2-D ('data', 'space') mesh the image-row axis shards over
    'space' as well. Every array layout that flows through shard_batch
    puts H at axis 2 when ndim >= 4 — train frames [B, T, H, W], PK maps
    [B, 3, H, W], eval/serve volumes [B, T, H, W, 1] — and at axis 1 for
    3-D targets [B, H, W]; GSPMD inserts the conv halo exchanges
    (parallel/spatial.py; validated in tests/test_spatial.py incl. the
    fused-augment 4-D uint8 path). 2-D trees (e.g. sizes [B, 2]) have no
    spatial axis and shard batch only.
    """
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if SPACE_AXIS in mesh.axis_names and ndim >= 3:
        spec[2 if ndim >= 4 else 1] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree of arrays with the batch axis sharded over `mesh`.

    Single-process: a plain device_put. Multi-host: each process supplies
    its LOCAL slice of the global batch (the loaders are host-sharded) and
    the global array is assembled with
    jax.make_array_from_process_local_data — device_put with a global
    sharding would require every process to hold the identical global value.
    """
    multiprocess = jax.process_count() > 1

    def _put(x):
        sharding = batch_sharding(mesh, np.ndim(x))
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a host pytree onto every device of `mesh`.

    Multi-host: device_put cannot target non-addressable devices, so the
    globally-replicated array is assembled from each process's (identical)
    local copy — every process must hold the same value, which holds for
    deterministic seeded init and restored checkpoints."""
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_multiple(batch_size: int, n_shards: int) -> int:
    """Global batch must divide evenly across shards; round up."""
    return ((batch_size + n_shards - 1) // n_shards) * n_shards
