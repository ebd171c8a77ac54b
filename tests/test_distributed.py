"""Multi-host bootstrap helpers (single-process behavior)."""

import jax

from stf_unet_tpu.core.distributed import (host_info, is_main_process,
                                           maybe_initialize)


def test_maybe_initialize_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize() is False  # no coordinator -> clean no-op


def test_host_info_single_process():
    assert host_info() == (0, 1)
    assert is_main_process() is True
    assert jax.process_count() == 1
