"""Graceful preemption / step-exact mid-epoch resume (train/preempt.py).

The load-bearing claim: a run stopped mid-epoch (SIGTERM or
--stop-after-steps) and then resumed is BIT-IDENTICAL to a run that was
never interrupted — same batches (seeded shuffle + undecoded skip), same
per-step PRNG keys, same optimizer/BN trajectories. No reference
counterpart (ref:train.py dies mid-epoch and loses everything since the
last epoch-end save).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def preempt_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm_preempt")
    # 4 slices / split with batch 1 -> 4 steps per epoch, so a stop after
    # 2 steps lands mid-epoch.
    return make_synthetic_breadm(str(root), size=48, time_steps=8,
                                 patients_per_split=1, slices_per_patient=4)


def _flags(root, workdir, extra=()):
    return [
        "--model", "unet", "--data-path", str(root),
        "--batch-size", "1", "--epochs", "2",
        "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--save-dir", os.path.join(workdir, "weights"),
        "--output-dir", os.path.join(workdir, "output"),
        "--print-freq", "1", "--seed", "7",
        # Single device: under the conftest 8-device CPU mesh the global
        # batch pads to 8 and drop_last makes a 4-sample epoch ZERO steps —
        # these tests need real mid-epoch step boundaries.
        "--data-parallel", "1",
        *extra,
    ]


def _latest_tree(workdir):
    import orbax.checkpoint as ocp
    path = os.path.join(workdir, "weights", "unet_latest_model")
    return ocp.PyTreeCheckpointer().restore(path)


def test_loader_skip_batches_matches_tail(preempt_root):
    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader

    index = DatasetIndex(str(preempt_root), "train",
                         list(DataConfig().resolved_sequence_types))
    loader = HostLoader(index, 1, shuffle=True, seed=3)
    full = list(loader.epoch(5))
    skipped = list(loader.epoch(5, skip_batches=2))
    assert len(skipped) == len(full) - 2
    for a, b in zip(full[2:], skipped):
        np.testing.assert_array_equal(a.frames, b.frames)
        np.testing.assert_array_equal(a.masks, b.masks)


def test_stop_after_steps_then_resume_is_bit_identical(preempt_root,
                                                       tmp_path):
    from stf_unet_tpu.cli.train import run

    # Uninterrupted reference run.
    dir_a = tmp_path / "a"
    run(_flags(preempt_root, str(dir_a)))
    tree_a = _latest_tree(str(dir_a))

    # Stop after 2 of the 4 steps of epoch 0 ...
    dir_b = tmp_path / "b"
    result = run(_flags(preempt_root, str(dir_b),
                        extra=("--stop-after-steps", "2")))
    assert result.get("preempted") is True
    meta_path = os.path.join(dir_b, "weights", "unet_latest_model",
                             "meta.json")
    meta = json.load(open(meta_path))
    assert meta["epoch"] == 0 and meta["step_in_epoch"] == 2

    # ... resume and run to completion.
    result = run(_flags(preempt_root, str(dir_b),
                        extra=("--resume", "latest")))
    assert "preempted" not in result
    meta = json.load(open(meta_path))
    assert meta["epoch"] == 1 and "step_in_epoch" not in meta

    tree_b = _latest_tree(str(dir_b))
    flat_a = jax_flat(tree_a)
    flat_b = jax_flat(tree_b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def jax_flat(tree):
    import jax
    return {jax.tree_util.keystr(kp): np.asarray(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_stop_at_epoch_boundary_resumes_at_next_epoch(preempt_root,
                                                      tmp_path):
    """stop_after_steps == a full epoch: the save carries complete-epoch
    meta (no step_in_epoch) and resume starts at the next epoch."""
    from stf_unet_tpu.cli.train import run

    result = run(_flags(preempt_root, str(tmp_path),
                        extra=("--stop-after-steps", "4")))
    assert result.get("preempted") is True
    meta = json.load(open(os.path.join(
        tmp_path, "weights", "unet_latest_model", "meta.json")))
    assert meta["epoch"] == 0 and "step_in_epoch" not in meta


def test_sigterm_saves_resumable_checkpoint(preempt_root, tmp_path):
    """A real SIGTERM mid-training exits 0 with a resumable checkpoint."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The env var alone is insufficient when the axon plugin's backend
    # init hangs on a dead tunnel; the package-level pin is authoritative.
    env["STF_UNET_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "stf_unet_tpu.cli.train",
         *_flags(preempt_root, str(tmp_path), extra=("--epochs", "200"))],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    # Wait for the first train-step log line (the guard is installed
    # before the epoch loop, so any "Epoch: [" line means it is active),
    # then deliver SIGTERM. A watchdog kill bounds every blocking read.
    import threading
    watchdog = threading.Timer(900, proc.kill)
    watchdog.start()
    lines = []
    try:
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("Epoch: ["):
                break
        proc.send_signal(signal.SIGTERM)
        # Generous: on this 1-core host the child may still be inside a
        # cold compile when the signal lands; the graceful path then waits
        # for that step to finish before saving.
        out, _ = proc.communicate(timeout=600)
        lines.append(out)
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()
    text = "".join(lines)
    assert proc.returncode == 0, text
    assert "Preemption/stop honored" in text
    meta = json.load(open(os.path.join(
        tmp_path, "weights", "unet_latest_model", "meta.json")))
    assert "epoch" in meta  # resumable (mid-epoch saves add step_in_epoch)
