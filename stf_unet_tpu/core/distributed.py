"""Multi-host bootstrap (SURVEY §5 distributed backend: `jax.distributed`
initialization per host; the mesh then spans all hosts' devices).

The reference has no launcher at all (SURVEY §1 "distributed layer:
near-absent"); this is the TPU-native story: call `maybe_initialize()`
once at process start (the train CLI does when --multihost is set), build
the mesh over `jax.devices()` (global across hosts), feed each host its
dataset shard (HostLoader host_index/num_hosts), and GSPMD handles the
rest over ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    On TPU pods the arguments auto-detect from the environment; explicit
    values (or JAX_COORDINATOR_ADDRESS etc.) override. Returns True when
    distributed mode is active. Safe to call on a single host (no-op when
    nothing indicates a multi-process run).
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1

    has_env = (coordinator_address
               or os.environ.get("JAX_COORDINATOR_ADDRESS")
               or os.environ.get("COORDINATOR_ADDRESS")
               or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
               or os.environ.get("TPU_WORKER_HOSTNAMES"))
    if not has_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except Exception as e:  # single-host dev boxes with stray env vars
        print(f"jax.distributed.initialize skipped: {e}")
        return False
    return jax.process_count() > 1


def host_info() -> tuple[int, int]:
    """(process_index, process_count) — feed into HostLoader for per-host
    dataset sharding."""
    return jax.process_index(), jax.process_count()
