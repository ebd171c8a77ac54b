"""Checkpoint averaging (cli/average.py): exact leafwise mean, identity on
self-average, and the averaged output slots into the inference CLIs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stf_unet_tpu.cli.average import average_checkpoints
from stf_unet_tpu.core.config import ModelConfig, OptimConfig
from stf_unet_tpu.train.checkpoint import CheckpointManager
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer


def _state(seed):
    cfg = ModelConfig(model="unet", num_classes=1, base_c=4)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    sample = jnp.ones((1, 8, 16, 16, 1), jnp.float32)
    return create_train_state(jax.random.key(seed), cfg, optim, sample)


@pytest.fixture(scope="module")
def two_checkpoints(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("avg_src"))
    s0, s1 = _state(0), _state(1)
    ckpt = CheckpointManager(d, "unet")
    ckpt.save("epoch0", s0, epoch=0, best_dice=0.4)
    ckpt.save("epoch1", s1, epoch=1, best_dice=0.6)
    return d, s0, s1


def test_average_is_leafwise_mean(two_checkpoints, tmp_path):
    d, s0, s1 = two_checkpoints
    out = os.path.join(tmp_path, "avg")
    average_checkpoints("unet", d, ["epoch0", "epoch1"], out)
    from stf_unet_tpu.cli.common import restore_inference_state
    mgr = CheckpointManager(out, "unet")
    restored, _ = restore_inference_state(mgr, "best")
    meta = mgr.read_meta("best")
    want = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0,
                                  s0.params, s1.params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=str(pa))
    assert meta["best_dice"] == 0.6 and meta["epoch"] == 1


def test_self_average_is_identity(two_checkpoints, tmp_path):
    d, s0, _ = two_checkpoints
    out = os.path.join(tmp_path, "avg")
    average_checkpoints("unet", d, ["epoch0"], out)
    from stf_unet_tpu.cli.common import restore_inference_state
    restored, _ = restore_inference_state(
        CheckpointManager(out, "unet"), "best")
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.params),
            jax.tree_util.tree_leaves_with_path(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_missing_kind_fails_loudly(two_checkpoints, tmp_path):
    d, _, _ = two_checkpoints
    with pytest.raises(FileNotFoundError):
        average_checkpoints("unet", d, ["epoch0", "epoch9"],
                            os.path.join(tmp_path, "avg"))


def test_cli_and_inference_pickup(two_checkpoints, tmp_path):
    """stf-average CLI writes a 'best' checkpoint that
    restore_for_inference picks up with zero extra flags."""
    from stf_unet_tpu.cli.average import main as avg_main
    from stf_unet_tpu.cli.common import restore_inference_state

    d, _, _ = two_checkpoints
    out = os.path.join(tmp_path, "avg")
    avg_main(["--model", "unet", "--save-dir", d,
              "--kinds", "epoch0,epoch1", "--out-dir", out])
    ckpt = CheckpointManager(out, "unet")
    assert ckpt.exists("best")
    state, _ = restore_inference_state(ckpt, "best")
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(state.params))
