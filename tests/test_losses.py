"""Loss semantics vs torch oracles and reference formulas
(ref:train_utils/dice_coefficient_loss.py, train_and_eval.py:299-313)."""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from stf_unet_tpu.losses import (build_target, criterion, cross_entropy,
                                 dice_coeff, dice_loss, multiclass_dice_coeff)

RNG = np.random.default_rng(1)


def test_cross_entropy_matches_torch():
    logits = RNG.normal(size=(2, 8, 8, 3)).astype(np.float32)
    target = RNG.integers(0, 3, size=(2, 8, 8))
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    theirs = float(tF.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target)))
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_ignore_index():
    logits = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
    target = RNG.integers(0, 2, size=(1, 4, 4))
    target[0, 0, :] = 255
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                               ignore_index=255))
    theirs = float(tF.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target),
        ignore_index=255))
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_class_weights():
    logits = RNG.normal(size=(2, 4, 4, 2)).astype(np.float32)
    target = RNG.integers(0, 2, size=(2, 4, 4))
    w = np.array([0.3, 0.7], dtype=np.float32)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                               weight=jnp.asarray(w)))
    theirs = float(tF.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target),
        weight=torch.tensor(w)))
    assert abs(ours - theirs) < 1e-5


def test_build_target_one_hot_and_ignore():
    tgt = jnp.asarray([[[0, 1], [255, 1]]])
    out = build_target(tgt, num_classes=2, ignore_index=255)
    assert out.shape == (1, 2, 2, 2)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [1, 0])
    np.testing.assert_array_equal(np.asarray(out[0, 0, 1]), [0, 1])
    # ignored pixel carries ignore_index in every channel (ref:13)
    np.testing.assert_array_equal(np.asarray(out[0, 1, 0]), [255, 255])


def test_dice_coeff_reference_semantics():
    # hand-computed: x=[1,0,1,0], t=[1,1,0,0] -> inter=1, sum=4 -> d=(2+e)/(4+e)
    x = jnp.asarray([[1.0, 0.0, 1.0, 0.0]]).reshape(1, 2, 2)
    t = jnp.asarray([[1.0, 1.0, 0.0, 0.0]]).reshape(1, 2, 2)
    d = float(dice_coeff(x, t))
    assert abs(d - (2 * 1 + 1e-6) / (4 + 1e-6)) < 1e-6


def test_dice_coeff_empty_set_guard():
    # both empty -> sets_sum==0 -> replaced by 2*inter=0 -> d=eps/eps=1 (ref:34-35)
    x = jnp.zeros((1, 2, 2))
    t = jnp.zeros((1, 2, 2))
    assert abs(float(dice_coeff(x, t)) - 1.0) < 1e-6


def test_dice_coeff_ignore_masking():
    # masked-out pixels contribute nothing (ref:27-31)
    x = jnp.asarray([[1.0, 1.0], [0.0, 0.0]]).reshape(1, 2, 2)
    t = jnp.asarray([[1.0, 255.0], [0.0, 0.0]]).reshape(1, 2, 2)
    d_masked = float(dice_coeff(x, t, ignore_index=255))
    # equivalent filtered problem: x=[1,0,0], t=[1,0,0] -> dice 1
    assert abs(d_masked - 1.0) < 1e-6


def test_multiclass_dice_is_channel_mean():
    x = jnp.asarray(RNG.uniform(size=(2, 4, 4, 3)).astype(np.float32))
    t = jnp.asarray((RNG.uniform(size=(2, 4, 4, 3)) > 0.5).astype(np.float32))
    m = float(multiclass_dice_coeff(x, t))
    per = np.mean([float(dice_coeff(x[..., c], t[..., c])) for c in range(3)])
    assert abs(m - per) < 1e-6


def test_criterion_ce_plus_dice():
    logits = jnp.asarray(RNG.normal(size=(2, 8, 8, 2)).astype(np.float32))
    target = jnp.asarray(RNG.integers(0, 2, size=(2, 8, 8)))
    full = float(criterion({"out": logits}, target))
    ce = float(cross_entropy(logits, target))
    dl = float(dice_loss(logits, build_target(target, 2)))
    assert abs(full - (ce + dl)) < 1e-5


def test_criterion_aux_head():
    logits = jnp.asarray(RNG.normal(size=(1, 4, 4, 2)).astype(np.float32))
    aux = jnp.asarray(RNG.normal(size=(1, 4, 4, 2)).astype(np.float32))
    target = jnp.asarray(RNG.integers(0, 2, size=(1, 4, 4)))
    combined = float(criterion({"out": logits, "aux": aux}, target))
    lo = float(criterion({"out": logits}, target))
    la = float(criterion({"out": aux}, target))
    assert abs(combined - (lo + 0.5 * la)) < 1e-5


def test_criterion_multiclass_vs_reference_impl():
    """4-class criterion (CE + multiclass dice, ignore patches) against the
    reference's own dice_coefficient_loss implementation — multiclass
    coverage beyond the binary paths the other tests pin."""
    import importlib.util
    import os

    import pytest

    path = "/root/reference/train_utils/dice_coefficient_loss.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout unavailable")
    spec = importlib.util.spec_from_file_location("ref_dice", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    logits = RNG.normal(size=(2, 8, 8, 4)).astype(np.float32)
    target = RNG.integers(0, 4, size=(2, 8, 8))
    target[:, :2, :] = 255  # ignore band

    ours = float(criterion({"out": jnp.asarray(logits)},
                           jnp.asarray(target), num_classes=4,
                           ignore_index=255))

    tl = torch.tensor(logits).permute(0, 3, 1, 2)
    tt = torch.tensor(target)
    ce = tF.cross_entropy(tl, tt, ignore_index=255)
    dice_target = ref.build_target(tt, 4, ignore_index=255)
    theirs = float(ce + ref.dice_loss(tl, dice_target, multiclass=True,
                                      ignore_index=255))
    assert abs(ours - theirs) < 1e-5


def test_train_step_threads_class_weights():
    """make_train_step(loss_weight=...) must reproduce criterion's weighted
    loss exactly and differ from the unweighted step (the reference's
    criterion accepts loss_weight but no flag wires it,
    ref:train_and_eval.py:299-305)."""
    import jax

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model, preprocess_input
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    cfg = ModelConfig(model="unet", num_classes=1, base_c=4, time_steps=2)
    model = create_model(cfg)
    sched = warmup_poly_schedule(1e-3, 10, 10)
    optim = make_optimizer(OptimConfig(), sched)
    x = jnp.asarray(RNG.normal(size=(2, 2, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(RNG.integers(0, 2, (2, 16, 16)).astype(np.int32))
    state0 = create_train_state(jax.random.key(0), cfg, optim, x)

    w = [1.0, 7.0]
    step_w = make_train_step(model, optim, sched, 2, loss_weight=w)
    _, loss_w, _ = step_w(state0, x, y)

    # manual weighted criterion on the SAME initial params
    state0 = create_train_state(jax.random.key(0), cfg, optim, x)
    outputs = model.apply(
        {"params": state0.params, "batch_stats": state0.batch_stats},
        preprocess_input(x, model), train=True,
        mutable=["batch_stats"])[0]
    manual = float(criterion(outputs, y, num_classes=2,
                             loss_weight=jnp.asarray(w, jnp.float32)))
    assert abs(float(loss_w) - manual) < 1e-6

    state0 = create_train_state(jax.random.key(0), cfg, optim, x)
    step_u = make_train_step(model, optim, sched, 2)
    _, loss_u, _ = step_u(state0, x, y)
    assert abs(float(loss_u) - float(loss_w)) > 1e-4


def test_train_cli_class_weights(tmp_path):
    """--loss-class-weights end-to-end + wrong-length validation."""
    import pytest

    from stf_unet_tpu.cli import train as train_cli
    from stf_unet_tpu.core import config as config_lib
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = str(tmp_path / "data")
    make_synthetic_breadm(root, size=40, time_steps=8)
    base = ["--data-path", root, "--model", "unet", "--epochs", "1",
            "--batch-size", "2", "--model-base-c", "4",
            "--data-base-size", "40", "--data-crop-size", "32",
            "--save-dir", str(tmp_path / "w"),
            "--output-dir", str(tmp_path / "o"), "--silent", "true"]
    train_cli.main(config_lib.parse_config(
        base + ["--loss-class-weights", "1.0,4.0"]))
    with pytest.raises(SystemExit):
        train_cli.main(config_lib.parse_config(
            base + ["--loss-class-weights", "1.0,2.0,3.0"]))
    with pytest.raises(SystemExit):  # malformed values: clean exit, no
        train_cli.main(config_lib.parse_config(  # raw ValueError traceback
            base + ["--loss-class-weights", "1.0,fourpointzero"]))
