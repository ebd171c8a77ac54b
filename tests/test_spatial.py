"""Spatial (H-axis) sharding: sharded inference must match unsharded
(GSPMD halo exchange for convs/pools) on the CPU-simulated mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from stf_unet_tpu.models import STFLSTMUNet, UNet
from stf_unet_tpu.parallel import create_2d_mesh, replicate, spatial_sharding


def test_unet_spatially_sharded_matches():
    mesh = create_2d_mesh(2, 4)
    model = UNet(num_classes=2, base_c=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 8)), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)

    fwd = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False)["out"])
    want = np.asarray(fwd(v, x))

    xs = jax.device_put(x, spatial_sharding(mesh, 4, h_axis=1))
    vs = replicate(mesh, v)
    got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stflstm_spatially_sharded_matches():
    mesh = create_2d_mesh(1, 8)
    model = STFLSTMUNet(num_classes=2, time_steps=2, lstm_backend="scan")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 1)), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)

    fwd = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False)["out"])
    want = np.asarray(fwd(v, x))

    xs = jax.device_put(x, spatial_sharding(mesh, 5, h_axis=2))
    vs = replicate(mesh, v)
    got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_full_train_step_under_2d_mesh_matches_single_device():
    """The COMPLETE train step (CE+dice loss, BN batch stats, AdamW
    update) under a ('data'=2, 'space'=4) mesh must match single-device:
    GSPMD inserts the conv halo exchanges for the forward AND backward
    pass and psums the loss/BN/grad reductions across both axes."""
    import jax.numpy as jnp

    from stf_unet_tpu.core import mesh as mesh_lib
    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    cfg = ModelConfig(model="unet", num_classes=1, base_c=4, time_steps=2)
    model = create_model(cfg)
    sched = warmup_poly_schedule(1e-2, 4, 2)
    optim = make_optimizer(OptimConfig(), sched)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 2, 32, 32, 1)), jnp.float32)
    y = jnp.asarray((rng.random((2, 32, 32)) > 0.7), jnp.int32)

    state = create_train_state(jax.random.key(0), cfg, optim, x)
    step = make_train_step(model, optim, sched, cfg.total_classes)

    mesh = create_2d_mesh(2, 4)
    # Fresh identical state for the mesh run: device_put can alias the
    # device-0 buffer, which the donating single-device step would delete.
    state_m = mesh_lib.replicate(
        mesh, create_train_state(jax.random.key(0), cfg, optim, x))
    x_m, y_m = mesh_lib.shard_batch(mesh, (x, y))
    s1, loss1, _ = step(state, x, y)
    # batch axis over 'data', H over 'space'
    assert x_m.sharding.spec == jax.sharding.PartitionSpec(
        "data", None, "space", None, None)
    assert y_m.sharding.spec == jax.sharding.PartitionSpec(
        "data", "space", None)
    s2, loss2, _ = step(state_m, x_m, y_m)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    # H-sharding splits the loss/BN reductions along image rows, so
    # gradients differ at f32 reduction-order level; Adam's normalizer
    # turns a sign flip on a ~0 gradient into a +-lr_first_step update.
    # Bound: 2 x the step-1 LR (warmup lr here is 1e-5) + ulp slack.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_train_cli_spatial_parallel_end_to_end(tmp_path):
    """Full train CLI on a ('data'=2, 'space'=4) mesh: epoch loop with the
    fused augment step, meshed eval, checkpoints — completes with finite
    metrics."""
    from stf_unet_tpu.cli import train as cli_train
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = make_synthetic_breadm(str(tmp_path / "d"), size=48, time_steps=8)
    r = cli_train.run([
        "--data-path", root, "--model", "unet", "--epochs", "1",
        "--batch-size", "4", "--spatial-parallel", "4",
        "--model-base-c", "4", "--data-base-size", "40",
        "--data-crop-size", "32",
        "--save-dir", str(tmp_path / "w"),
        "--output-dir", str(tmp_path / "o")])
    assert 0.0 <= r["best_dice"] <= 1.0
    assert np.isfinite(r["test"]["dice"])


def test_fused_augment_train_step_under_2d_mesh_matches(tmp_path):
    """The FUSED augment+train step (the program cli/train actually runs:
    uint8 [B,T,H,W] frames, device-side warp, then fwd/bwd/update) under a
    ('data'=2, 'space'=4) mesh must match single-device — pins the 4-D
    H-axis spec in core/mesh.batch_sharding (axis 2, NOT the time axis)."""
    import jax.numpy as jnp

    from stf_unet_tpu.core import mesh as mesh_lib
    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    data_cfg = DataConfig(base_size=40, crop_size=32)
    cfg = ModelConfig(model="unet", num_classes=1, base_c=4, time_steps=2)
    model = create_model(cfg)
    sched = warmup_poly_schedule(1e-2, 4, 2)
    optim = make_optimizer(OptimConfig(), sched)
    augment = TrainAugment(data_cfg)

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 2, 40, 40), dtype=np.uint8)
    masks = (rng.random((2, 40, 40)) > 0.7).astype(np.uint8)
    sizes = np.full((2, 2), 40, np.int32)
    x0 = jnp.zeros((2, 2, 32, 32, 1), jnp.float32)

    step = make_train_step(model, optim, sched, cfg.total_classes,
                           augment=augment)
    key = jax.random.key(3)

    state = create_train_state(jax.random.key(0), cfg, optim, x0)
    mesh = create_2d_mesh(2, 4)
    state_m = mesh_lib.replicate(
        mesh, create_train_state(jax.random.key(0), cfg, optim, x0))
    f_m, m_m, s_m = mesh_lib.shard_batch(mesh, (frames, masks, sizes))
    assert f_m.sharding.spec == jax.sharding.PartitionSpec(
        "data", None, "space", None), f_m.sharding.spec  # H, not T
    assert s_m.sharding.spec == jax.sharding.PartitionSpec("data", None)

    s1, loss1, _ = step(state, key, 0, 0, jnp.asarray(frames),
                        jnp.asarray(masks), jnp.asarray(sizes), None)
    s2, loss2, _ = step(state_m, key, 0, 0, f_m, m_m, s_m, None)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
