"""Data-parallel correctness on the CPU-simulated 8-device mesh
(SURVEY.md §4 item 3): sharded training must match single-device training
bit-for-bit (GSPMD computes global BN stats / gradients)."""

import numpy as np

import jax
import jax.numpy as jnp

from stf_unet_tpu.core import mesh as mesh_lib
from stf_unet_tpu.core.config import ModelConfig, OptimConfig
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.loop import make_train_step
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer


def _setup(batch):
    model_cfg = ModelConfig(model="unet", num_classes=1, time_steps=2,
                            base_c=4)
    model = create_model(model_cfg)
    schedule = warmup_poly_schedule(1e-3, 4, 2)
    optim = make_optimizer(OptimConfig(), schedule)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 2, 16, 16, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (batch, 16, 16)), jnp.int32)
    state = create_train_state(jax.random.key(0), model_cfg, optim, x)
    step = make_train_step(model, optim, schedule, 2)
    return state, step, x, y


def test_mesh_creation():
    assert len(jax.devices()) == 8
    mesh = mesh_lib.create_mesh(8)
    assert mesh.shape == {"data": 8}
    mesh4 = mesh_lib.create_mesh(4)
    assert mesh4.shape == {"data": 4}


def test_sharded_step_matches_single_device():
    state, step, x, y = _setup(batch=8)
    # single-device result
    s1, loss1, _ = step(state, x, y)

    # sharded result
    mesh = mesh_lib.create_mesh(8)
    state_r = mesh_lib.replicate(mesh, _setup(batch=8)[0])
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
    ys = jax.device_put(y, mesh_lib.batch_sharding(mesh, y.ndim))
    s8, loss8, _ = step(state_r, xs, ys)

    assert abs(float(loss1) - float(loss8)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # BN running stats must also be global (SURVEY §7 cross-replica BN)
    bs1 = jax.tree_util.tree_leaves(s1.batch_stats)
    bs8 = jax.tree_util.tree_leaves(s8.batch_stats)
    for a, b in zip(bs1, bs8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_metric_updates_under_sharding():
    from stf_unet_tpu.metrics.confusion import confusion_init, confusion_update
    mesh = mesh_lib.create_mesh(8)
    rng = np.random.default_rng(1)
    tgt = rng.integers(0, 2, (8, 16, 16))
    pred = rng.integers(0, 2, (8, 16, 16))
    t = jax.device_put(jnp.asarray(tgt), mesh_lib.batch_sharding(mesh, 3))
    p = jax.device_put(jnp.asarray(pred), mesh_lib.batch_sharding(mesh, 3))

    @jax.jit
    def update(t, p):
        return confusion_update(confusion_init(2), t, p)

    sharded = np.asarray(update(t, p))
    local = np.asarray(update(jnp.asarray(tgt), jnp.asarray(pred)))
    np.testing.assert_array_equal(sharded, local)


def test_train_one_epoch_under_mesh_with_device_prefetch(tmp_path):
    """The epoch loop's background-thread transfer (_batch_to_device) must
    run shard_batch correctly under a mesh: same loss with async (2) and
    inline (0) transfers, valid sharded state out."""
    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.core.prng import root_key
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.train.loop import train_one_epoch

    root = make_synthetic_breadm(str(tmp_path / "t"), splits=("training",),
                                 patients_per_split=1, slices_per_patient=8,
                                 size=48)
    data_cfg = DataConfig(base_size=40, crop_size=32)
    idx = DatasetIndex(root, "train", data_cfg.resolved_sequence_types)
    mesh = mesh_lib.create_mesh(8)
    model_cfg = ModelConfig(model="unet", num_classes=1, base_c=4,
                            time_steps=8)
    model = create_model(model_cfg)
    sched = warmup_poly_schedule(1e-3, 1, 1)
    optim = make_optimizer(OptimConfig(), sched)
    sample = jnp.zeros((8, 8, 64, 64, 1), jnp.float32)
    augment = TrainAugment(data_cfg)
    step = make_train_step(model, optim, sched, 2, augment=augment)
    key = root_key(0)

    losses = []
    for dp in (0, 2):
        loader = HostLoader(idx, 8, shuffle=True, seed=0, drop_last=True)
        state = mesh_lib.replicate(
            mesh, create_train_state(jax.random.key(0), model_cfg, optim,
                                     sample))
        state, loss, _, _ = train_one_epoch(state, step, loader, None, key, 0,
                                         mesh=mesh, device_prefetch=dp)
        losses.append(loss)
        assert np.isfinite(loss)
    assert losses[0] == losses[1]


def test_train_cli_data_parallel_with_meshed_eval(tmp_path):
    """Full train CLI under --data-parallel with eval_batch_size > 1: the
    val epoch rides evaluate(mesh=) (single-process path) and the run
    completes with finite metrics."""
    from stf_unet_tpu.cli import train as cli_train
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = make_synthetic_breadm(str(tmp_path / "d"), size=48, time_steps=8)
    r = cli_train.run([
        "--data-path", root, "--model", "unet", "--epochs", "1",
        "--batch-size", "8", "--data-parallel", "0",
        "--eval-batch-size", "4", "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--save-dir", str(tmp_path / "w"),
        "--output-dir", str(tmp_path / "o")])
    assert 0.0 <= r["best_dice"] <= 1.0
    assert np.isfinite(r["test"]["dice"])
