"""Test harness: CPU-simulated 8-device mesh (SURVEY.md §4 item 3).

Must set env BEFORE importing jax anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real chip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm")
    return make_synthetic_breadm(str(root), size=64, time_steps=8,
                                 patients_per_split=2, slices_per_patient=2)
