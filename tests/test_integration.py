"""End-to-end integration (SURVEY.md §4 item 4): synthetic BreaDM tree ->
train CLI (2 epochs) -> checkpoint -> resume -> eval -> test inference with
comparison renders -> results file. Tiny model/shapes for 1-core CI."""

import glob
import os
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm_e2e")
    return make_synthetic_breadm(str(root), size=48, time_steps=8,
                                 patients_per_split=1, slices_per_patient=2)


def _flags(root, workdir, epochs=2, extra=()):
    return [
        "--model", "unet", "--data-path", str(root),
        "--batch-size", "2", "--epochs", str(epochs),
        "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--save-dir", os.path.join(workdir, "weights"),
        "--output-dir", os.path.join(workdir, "output"),
        "--print-freq", "1",
        *extra,
    ]


def test_train_cli_end_to_end(tiny_root, tmp_path):
    from stf_unet_tpu.cli.train import run
    result = run(_flags(tiny_root, str(tmp_path)))
    assert 0.0 <= result["test"]["dice"] <= 1.0

    # latest + best checkpoints exist (ref:train.py:315-325 policy)
    weights = os.listdir(os.path.join(tmp_path, "weights"))
    assert "unet_latest_model" in weights
    assert "unet_best_model" in weights

    # results file with the reference's per-epoch block format
    results = glob.glob(os.path.join(tmp_path, "output", "unet_results_*.txt"))
    assert len(results) == 1
    text = open(results[0]).read()
    assert "[epoch: 0]" in text and "[epoch: 1]" in text
    assert "train_loss:" in text and "mean_iou:" in text

    # comparison renders for each test sample
    compares = glob.glob(os.path.join(tmp_path, "output", "test_results",
                                      "unet_*_compare.png"))
    assert len(compares) == 2


@pytest.fixture(scope="module")
def tiny_multiclass_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm_mc")
    return make_synthetic_breadm(str(root), size=48, time_steps=8,
                                 patients_per_split=1, slices_per_patient=2,
                                 mask_classes=3)


def test_train_cli_multiclass_end_to_end(tiny_multiclass_root, tmp_path):
    """num_classes>1 driven through the FULL train CLI (epoch loop, results
    file, confusion report, test-phase renders) and cli/test multiclass
    argmax (VERDICT r2 next-step 4) — previously only unit-covered."""
    from stf_unet_tpu.cli.train import run

    res = run(_flags(tiny_multiclass_root, str(tmp_path), epochs=2,
                     extra=("--num-classes", "3",
                            "--data-mask-format", "index")))
    mat = res["test"]["confusion_matrix"]
    # 3 foreground classes + background (ref:train.py:144)
    assert mat.shape == (4, 4)
    # the index-mask fixture feeds every class: each true-class row saw
    # pixels (concentric bands + background)
    assert (mat.sum(axis=1) > 0).all()
    assert np.isfinite(res["test"]["dice"])
    assert len(res["test"]["class_metrics"]) == 4

    # results file carries the 4-class confusion block
    results = glob.glob(os.path.join(tmp_path, "output", "*_results_*.txt"))
    assert len(results) == 1
    body = open(results[0]).read()
    assert "[epoch: 1]" in body and "IoU" in body
    # per-class IoU list in the confusion string has 4 entries
    iou_line = [ln for ln in body.splitlines() if ln.startswith("IoU:")][0]
    assert iou_line.count(",") == 3
    # test-phase comparison renders were written
    compares = glob.glob(os.path.join(tmp_path, "output", "test_results",
                                      "unet_*_compare.png"))
    assert len(compares) == 2

    # cli/test: multiclass argmax inference over the saved checkpoint —
    # width/classes/crop/mask-format recovered from the checkpoint sidecar
    from stf_unet_tpu.cli.test import main as cli_test_main
    metrics = cli_test_main([
        "--model", "unet", "--model-dir", os.path.join(tmp_path, "weights"),
        "--root", str(tiny_multiclass_root),
        "--output-dir", os.path.join(tmp_path, "output", "cli_test"),
    ])
    assert metrics["confusion_matrix"].shape == (4, 4)
    np.testing.assert_array_equal(metrics["confusion_matrix"], mat)
    overlays = glob.glob(os.path.join(tmp_path, "output", "cli_test",
                                      "unet_*.png"))
    assert len(overlays) == 2


def test_checkpoint_save_async_roundtrip(tmp_path):
    """Queued async saves: snapshot-at-call semantics (later in-place state
    changes don't leak into an already-queued save), submission ordering,
    and wait-before-restore."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.checkpoint import CheckpointManager
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import TrainState, create_train_state, make_optimizer

    cfg = ModelConfig(model="unet", num_classes=1, base_c=4)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 2, 2))
    x = jnp.zeros((1, 8, 16, 16, 1), jnp.float32)
    state = create_train_state(jax.random.key(0), cfg, optim, x)

    mgr = CheckpointManager(str(tmp_path / "w"), "unet")
    mgr.save_async("latest", state, epoch=0, best_dice=0.1)
    # second state: params + 1 — queued after, must win the same path
    state2 = TrainState(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params),
        batch_stats=state.batch_stats, opt_state=state.opt_state,
        step=state.step + 1)
    mgr.save_async("latest", state2, epoch=1, best_dice=0.2)
    mgr.save_async("best", state, epoch=0, best_dice=0.1)

    restored, meta = mgr.restore("latest", state)  # restore() drains queue
    assert meta["epoch"] == 1
    assert int(restored.step) == int(state.step) + 1
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    rleaf = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(rleaf), np.asarray(leaf) + 1.0)

    restored_best, meta_best = mgr.restore("best", state)
    assert meta_best["epoch"] == 0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored_best.params)[0]),
        np.asarray(leaf))
    mgr.wait()  # idempotent on an empty queue


def test_checkpoint_async_fail_fast_and_backpressure(tmp_path):
    """A failed background save re-raises at the NEXT save_async (not epochs
    later at the final wait), wait() consumes every queued future, and
    save_async blocks once MAX_PENDING saves are outstanding so HBM
    snapshots can't accumulate without bound."""
    import threading

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model  # noqa: F401
    from stf_unet_tpu.train.checkpoint import CheckpointManager
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    cfg = ModelConfig(model="unet", num_classes=1, base_c=4)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 2, 2))
    x = jnp.zeros((1, 8, 16, 16, 1), jnp.float32)
    state = create_train_state(jax.random.key(0), cfg, optim, x)

    # --- fail fast: first queued write raises; the next save_async surfaces it
    mgr = CheckpointManager(str(tmp_path / "w1"), "unet")
    real_write = mgr._write

    def boom(*a, **k):
        raise OSError("disk full")

    mgr._write = boom
    mgr.save_async("latest", state, epoch=0, best_dice=0.0)
    mgr._pending[0].exception(timeout=30)  # let the worker finish
    mgr._write = real_write
    with pytest.raises(OSError, match="disk full"):
        mgr.save_async("latest", state, epoch=1, best_dice=0.0)
    # the failure was consumed; queue drains clean afterwards
    mgr.wait()

    # --- wait() consumes EVERY failure, not just the first (both writes
    # held in-flight past both save_async calls so fail-fast can't trigger)
    hold = threading.Event()

    def slow_boom(*a, **k):
        assert hold.wait(timeout=30)
        raise OSError("disk full")

    mgr._write = slow_boom
    mgr.save_async("latest", state, epoch=2, best_dice=0.0)
    mgr.save_async("best", state, epoch=2, best_dice=0.0)
    assert len(mgr._pending) == 2
    hold.set()
    for fut in list(mgr._pending):
        fut.exception(timeout=30)
    with pytest.raises(OSError):
        mgr.wait()
    assert mgr._pending == []
    mgr._write = real_write

    # --- backpressure: with MAX_PENDING=1 a second save_async blocks until
    # the first write completes
    mgr2 = CheckpointManager(str(tmp_path / "w2"), "unet")
    mgr2.MAX_PENDING = 1
    release = threading.Event()
    started = threading.Event()
    real_write2 = mgr2._write

    def slow_write(*a, **k):
        started.set()
        assert release.wait(timeout=30)
        return real_write2(*a, **k)

    mgr2._write = slow_write
    mgr2.save_async("latest", state, epoch=0, best_dice=0.0)
    assert started.wait(timeout=30)
    timer = threading.Timer(0.5, release.set)
    timer.start()
    t0 = time.time()
    mgr2.save_async("latest", state, epoch=1, best_dice=0.0)
    # the call had to wait for the released first write -> took >= ~0.5 s
    assert time.time() - t0 >= 0.4
    assert len(mgr2._pending) <= 1
    mgr2.wait()
    timer.cancel()


def test_train_cli_resume(tiny_root, tmp_path):
    from stf_unet_tpu.cli.train import run
    run(_flags(tiny_root, str(tmp_path), epochs=1))
    latest = os.path.join(tmp_path, "weights", "unet_latest_model")
    # resume continues at epoch 1 without retraining epoch 0
    result = run(_flags(tiny_root, str(tmp_path), epochs=2,
                        extra=("--resume", latest)))
    results = glob.glob(os.path.join(tmp_path, "output", "unet_results_*.txt"))
    text = max(results, key=os.path.getmtime)
    content = open(text).read()
    assert "[epoch: 1]" in content
    assert result is not None


def test_test_cli(tiny_root, tmp_path):
    from stf_unet_tpu.cli.train import run
    from stf_unet_tpu.cli.test import parse_args, test as run_test
    run(_flags(tiny_root, str(tmp_path), epochs=1))
    # test CLI builds its own default-size model; override via train flags is
    # not part of the reference surface, so monkey-patch the config instead.
    args = parse_args(["--model", "unet", "--model-dir",
                       os.path.join(str(tmp_path), "weights"),
                       "--root", str(tiny_root),
                       "--output-dir", os.path.join(str(tmp_path), "overlays")])
    import stf_unet_tpu.cli.test as test_mod
    from stf_unet_tpu.core.config import ModelConfig
    orig = ModelConfig
    try:
        import functools
        test_mod.ModelConfig = functools.partial(orig, base_c=4)
        metrics = run_test(args)
    finally:
        test_mod.ModelConfig = orig
    assert 0.0 <= metrics["dice"] <= 1.0
    overlays = glob.glob(os.path.join(tmp_path, "overlays", "unet_*.png"))
    assert len(overlays) == 2

def test_device_prefetch_modes_identical(tiny_root):
    """Async H2D transfer (train_one_epoch device_prefetch>0) must not
    change results: same state/seed -> equal epoch loss vs inline
    transfers (device_prefetch=0)."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.core.prng import root_key
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step, train_one_epoch
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    data_cfg = DataConfig(base_size=40, crop_size=32)
    idx = DatasetIndex(str(tiny_root), "train",
                       data_cfg.resolved_sequence_types)
    model_cfg = ModelConfig(model="unet", num_classes=1, base_c=4,
                            time_steps=8)
    model = create_model(model_cfg)
    sched = warmup_poly_schedule(1e-3, 1, 2)
    optim = make_optimizer(OptimConfig(), sched)
    sample = jnp.zeros((2, 8, 64, 64, 1), jnp.float32)
    augment = TrainAugment(data_cfg)
    step = make_train_step(model, optim, sched, 2, augment=augment)
    key = root_key(0)

    losses = []
    for dp in (0, 2):
        loader = HostLoader(idx, 2, shuffle=True, seed=0)
        state = create_train_state(jax.random.key(0), model_cfg, optim,
                                   sample)
        state, loss, _, _ = train_one_epoch(state, step, loader, None, key, 0,
                                         device_prefetch=dp)
        losses.append(loss)
    assert losses[0] == losses[1]


def test_train_cli_empty_index_errors(tiny_root, tmp_path):
    """--use-pk-maps with no pk_maps generated skips every patient; the
    trainer must fail loudly instead of running 0-step epochs."""
    from stf_unet_tpu.cli.train import run
    with pytest.raises(SystemExit, match="training index is empty"):
        run(_flags(tiny_root, str(tmp_path), extra=("--use-pk-maps", "true")))


def test_train_cli_rotation_split_opt_in(tiny_root, tmp_path, capsys):
    """--data-rotation-split true routes unrotated samples through the
    separable resample path (opt-in; default off — loses fused on the
    current TPU toolchain, PERFORMANCE.md r4) and still trains/evaluates
    end to end."""
    from stf_unet_tpu.cli.train import run
    # --data-parallel 1: the 8-device CPU test env would otherwise build a
    # mesh, which (correctly) disables the single-device-only split.
    result = run(_flags(tiny_root, str(tmp_path), epochs=1,
                        extra=("--data-rotation-split", "true",
                               "--data-parallel", "1")))
    out = capsys.readouterr().out
    assert "rotation-split augmentation" in out
    assert 0.0 <= result["test"]["dice"] <= 1.0
