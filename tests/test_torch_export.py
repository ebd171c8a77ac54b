"""Reverse weight export (utils/torch_export.py): JAX -> torch state_dict
must be the exact inverse of the importer, and — the real bar — load
strict=True into the ACTUAL reference model with forward parity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from stf_unet_tpu.models import STFLSTMUNet, UNet
from stf_unet_tpu.utils.torch_export import (export_stflstm_state_dict,
                                             export_unet_state_dict,
                                             to_torch)
from stf_unet_tpu.utils.torch_import import (import_stflstm_state_dict,
                                             import_unet_state_dict)

REFERENCE = "/root/reference"


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (path, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=str(path))


def test_unet_export_import_roundtrip():
    model = UNet(num_classes=2, base_c=4)
    variables = model.init(jax.random.key(0),
                           jnp.ones((1, 16, 16, 8)), train=False)
    sd = export_unet_state_dict(variables["params"],
                                variables["batch_stats"])
    params, stats = import_unet_state_dict(sd)
    _assert_trees_equal(variables["params"], params)
    _assert_trees_equal(variables["batch_stats"], stats)


def test_stflstm_export_import_roundtrip():
    model = STFLSTMUNet(num_classes=2, time_steps=3, use_pk_maps=True)
    variables = model.init(jax.random.key(1),
                           jnp.ones((1, 6, 32, 32, 1)), train=False)
    sd = export_stflstm_state_dict(variables["params"],
                                   variables["batch_stats"])
    params, stats = import_stflstm_state_dict(sd)
    _assert_trees_equal(variables["params"], params)
    _assert_trees_equal(variables["batch_stats"], stats)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_exported_weights_run_in_reference_model():
    """Export Flax weights, strict-load them into the reference's own
    torch UNet (invoked, not copied), and check forward parity — proof a
    reference user can take weights trained here back to their stack."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_unet_export", os.path.join(REFERENCE, "src", "unet.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model = UNet(num_classes=2, base_c=16)
    variables = model.init(jax.random.key(2),
                           jnp.ones((1, 32, 32, 8)), train=False)
    sd = to_torch(export_unet_state_dict(variables["params"],
                                         variables["batch_stats"]))

    ref = mod.UNet(in_channels=8, num_classes=2, base_c=16)
    ref.load_state_dict(sd, strict=True)  # every key, exact layout
    ref.eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32, 32, 8)).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x), train=False)["out"]
    with torch.no_grad():
        theirs = ref(torch.tensor(x).permute(0, 3, 1, 2))["out"]
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_migrate_cli_reverse_then_forward(tmp_path):
    """stf-migrate --reverse writes a .pth that stf-migrate (forward)
    re-imports to the identical variables — full interop loop through
    both CLIs and a real Orbax checkpoint."""
    from stf_unet_tpu.cli.migrate import export_to_torch, migrate
    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.train.checkpoint import CheckpointManager
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    model_cfg = ModelConfig(model="unet", num_classes=1, base_c=4)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    sample = jnp.ones((1, 8, 16, 16, 1), jnp.float32)
    state = create_train_state(jax.random.key(4), model_cfg, optim, sample)
    src_dir = os.path.join(tmp_path, "src")
    CheckpointManager(src_dir, "unet").save("best", state, epoch=7,
                                            best_dice=0.5)

    pth = os.path.join(tmp_path, "exported.pth")
    export_to_torch(pth, "unet", src_dir, kind="best")
    raw = torch.load(pth, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7 and "model" in raw

    dst_dir = os.path.join(tmp_path, "dst")
    migrate(pth, "unet", dst_dir, kind="best", base_c=4)
    restored, _ = CheckpointManager(dst_dir, "unet").restore("best", state)
    _assert_trees_equal(state.params, restored.params)
    _assert_trees_equal(state.batch_stats, restored.batch_stats)
