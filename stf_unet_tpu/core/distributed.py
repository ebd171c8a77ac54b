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


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed (the user asked for multi-host, so a
    failure RAISES rather than silently degrading to independent hosts).

    On GCE TPU pods jax.distributed.initialize auto-detects everything from
    the metadata server — no env vars or arguments needed; explicit values
    override. Returns True when >1 process is participating.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Best-effort variant for environments where multi-host is plausible
    but not certain (used by tooling, NOT by --multihost): only attempts
    initialization when coordinator env vars are present, and degrades to
    single-host on failure."""
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1
    has_env = (coordinator_address
               or os.environ.get("JAX_COORDINATOR_ADDRESS")
               or os.environ.get("COORDINATOR_ADDRESS")
               or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not has_env:
        return False
    try:
        return initialize(coordinator_address, num_processes, process_id)
    except Exception as e:
        print(f"jax.distributed.initialize skipped: {e}")
        return False


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_info() -> tuple[int, int]:
    """(process_index, process_count) — feed into HostLoader for per-host
    dataset sharding."""
    return jax.process_index(), jax.process_count()
