"""Gradient accumulation (--grad-accum): optax.MultiSteps wrapper.

No reference counterpart (the reference trains whatever fits in GPU
memory, ref:train.py:189-211); this is the TPU-side answer to the
memory envelope in PERFORMANCE.md — effective batch k*B with per-step
batch B.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_unet_tpu.core.config import OptimConfig
from stf_unet_tpu.train.state import make_optimizer


def _apply(optim, params, grads, opt_state):
    updates, opt_state = optim.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state


def test_multisteps_equals_adamw_on_mean_grad():
    cfg = OptimConfig()
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0,
              "b": jnp.array([0.3, -0.2, 0.9], jnp.float32)}
    g1 = jax.tree_util.tree_map(lambda p: jnp.cos(p) * 0.1, params)
    g2 = jax.tree_util.tree_map(lambda p: jnp.sin(p) - 0.05, params)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)

    schedule = lambda step: 1e-3  # constant; apply-unit stepping is separate

    acc = make_optimizer(cfg, schedule, grad_accum=2)
    st = acc.init(params)
    p_mid, st = _apply(acc, params, g1, st)
    # First microbatch: accumulation only, params unchanged.
    for a, b in zip(jax.tree_util.tree_leaves(p_mid),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_acc, st = _apply(acc, p_mid, g2, st)

    plain = make_optimizer(cfg, schedule)
    p_ref, _ = _apply(plain, params, gmean, plain.init(params))

    for a, b in zip(jax.tree_util.tree_leaves(p_acc),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_multisteps_schedule_advances_per_apply():
    """The LR schedule must be consumed in optimizer-apply units: two
    applies (4 microbatches at k=2) should read schedule(0), schedule(1)."""
    cfg = OptimConfig()
    seen = []

    def schedule(step):
        seen.append(int(step)) if not isinstance(step, jax.core.Tracer) else None
        return 1e-3 * (0.5 ** step)

    params = {"w": jnp.ones((3,), jnp.float32)}
    g = {"w": jnp.full((3,), 0.1, jnp.float32)}
    acc = make_optimizer(cfg, schedule, grad_accum=2)
    st = acc.init(params)
    p = params
    history = [np.asarray(p["w"]).copy()]
    for _ in range(4):
        p, st = _apply(acc, p, g, st)
        history.append(np.asarray(p["w"]).copy())
    # Applies land after microbatches 2 and 4; 1 and 3 are no-ops.
    assert np.array_equal(history[0], history[1])
    assert not np.array_equal(history[1], history[2])
    assert np.array_equal(history[2], history[3])
    assert not np.array_equal(history[3], history[4])
    # Second apply moved less than the first (decayed LR), proving the
    # inner count advanced once per apply, not per microbatch.
    step1 = np.abs(history[2] - history[1]).max()
    step2 = np.abs(history[4] - history[3]).max()
    assert step2 < step1


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    root = tmp_path_factory.mktemp("breadm_accum")
    return make_synthetic_breadm(str(root), size=48, time_steps=8,
                                 patients_per_split=1, slices_per_patient=4)


def test_train_cli_grad_accum_end_to_end(tiny_root, tmp_path):
    """--grad-accum 2 through the full train CLI: runs, checkpoints, and the
    per-epoch results file reports finite losses."""
    from stf_unet_tpu.cli.train import run
    res = run([
        "--model", "unet", "--data-path", str(tiny_root),
        "--batch-size", "2", "--epochs", "1",
        "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--grad-accum", "2",
        "--save-dir", os.path.join(str(tmp_path), "weights"),
        "--output-dir", os.path.join(str(tmp_path), "output"),
        "--print-freq", "1",
    ])
    assert 0.0 <= res["test"]["dice"] <= 1.0
    assert os.path.exists(os.path.join(str(tmp_path), "weights",
                                       "unet_latest_model"))

    # The checkpoint's opt_state is a MultiSteps tree: inference CLIs must
    # recover grad_accum from the config sidecar to build a matching
    # restore template (cli/common.restore_for_inference).
    from stf_unet_tpu.cli.test import main as test_main
    res2 = test_main(["--model", "unet", "--model-dir",
                      os.path.join(str(tmp_path), "weights"),
                      "--root", str(tiny_root),
                      "--output-dir", os.path.join(str(tmp_path), "t")])
    assert 0.0 <= res2["dice"] <= 1.0

    # Resuming with a DIFFERENT --grad-accum must fail with the actual
    # cause, not an orbax tree-structure error.
    with pytest.raises(ValueError, match="grad-accum"):
        run(["--model", "unet", "--data-path", str(tiny_root),
             "--batch-size", "2", "--epochs", "2",
             "--model-base-c", "4",
             "--data-base-size", "40", "--data-crop-size", "32",
             "--grad-accum", "4",
             "--resume", "latest",
             "--save-dir", os.path.join(str(tmp_path), "weights"),
             "--output-dir", os.path.join(str(tmp_path), "output")])
