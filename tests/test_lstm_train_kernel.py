"""Fused last-step LSTM training kernel (ops/pallas/lstm_train_kernel.py):
forward and gradient parity vs the XLA scan oracle, in Pallas interpret
mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stf_unet_tpu.ops.lstm import lstm_scan
from stf_unet_tpu.ops.pallas.lstm_train_kernel import (fused_lstm_last_x,
                                                       lstm_fused_supported)


def _params(c, key=0):
    rng = np.random.default_rng(key)
    k = 1.0 / np.sqrt(c)
    w_ih = jnp.asarray(rng.uniform(-k, k, (c, 4 * c)), jnp.float32)
    w_hh = jnp.asarray(rng.uniform(-k, k, (c, 4 * c)), jnp.float32)
    b = jnp.asarray(rng.uniform(-k, k, (4 * c,)), jnp.float32)
    return w_ih, w_hh, b


@pytest.mark.parametrize("t_steps,n,c", [(8, 96, 64), (4, 200, 128),
                                         (3, 64, 256)])
def test_forward_matches_scan(t_steps, n, c):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(t_steps, n, c)), jnp.float32)
    w_ih, w_hh, b = _params(c)
    want = lstm_scan(x, w_ih, w_hh, b)
    got = fused_lstm_last_x(x, w_ih, w_hh, b, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t_steps,n,c", [(8, 96, 64), (4, 200, 128),
                                         (8, 300, 64)])
def test_ti_and_2t_backward_kernels_agree(t_steps, n, c):
    """The T-inside backward (one grid axis, unrolled recurrence) and the
    2T-grid streaming backward compute the same grads (PERFORMANCE.md r3:
    TI routes wherever its VMEM plan fits)."""
    from stf_unet_tpu.ops.pallas.lstm_train_kernel import (_bwd_call,
                                                           _bwd_call_ti,
                                                           _plan, _plan_ti)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(t_steps, n, c)), jnp.float32)
    w_ih, w_hh, b = _params(c)
    dh = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    assert _plan(t_steps, n, c, 4) and _plan_ti(t_steps, n, c, 4)
    a = _bwd_call(x, w_ih, w_hh, b, dh, interpret=True)
    t = _bwd_call_ti(x, w_ih, w_hh, b, dh, interpret=True)
    for got, want, name in zip(t, a, ("dx", "dwi", "dwh", "db")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=2e-5, err_msg=name)


@pytest.mark.parametrize("t_steps,n,c", [(8, 96, 64), (4, 200, 128)])
def test_gradients_match_scan_autodiff(t_steps, n, c):
    """dx, dW_ih, dW_hh, db vs jax.grad through the scan — including a
    non-tile-multiple N so padded-row masking is exercised."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(t_steps, n, c)), jnp.float32)
    w_ih, w_hh, b = _params(c)
    cot = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)

    def loss_scan(x, w_ih, w_hh, b):
        return jnp.sum(lstm_scan(x, w_ih, w_hh, b) * cot)

    def loss_fused(x, w_ih, w_hh, b):
        return jnp.sum(fused_lstm_last_x(x, w_ih, w_hh, b, True) * cot)

    want = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(x, w_ih, w_hh, b)
    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w_ih, w_hh, b)
    for name, w, g in zip(("dx", "dw_ih", "dw_hh", "db"), want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_bf16_runs_and_tracks_f32():
    t_steps, n, c = 4, 128, 64
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.normal(size=(t_steps, n, c)), jnp.float32)
    w_ih, w_hh, b = _params(c)
    ref = fused_lstm_last_x(x32, w_ih, w_hh, b, True)
    out = fused_lstm_last_x(x32.astype(jnp.bfloat16),
                            w_ih.astype(jnp.bfloat16),
                            w_hh.astype(jnp.bfloat16),
                            b.astype(jnp.bfloat16), True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.05)


def test_supported_plan():
    assert lstm_fused_supported(8, 50176, 64, 2)
    assert lstm_fused_supported(8, 12544, 128, 2)
    assert lstm_fused_supported(8, 3136, 256, 2)
    # C=512 f32 cannot fit weight+accumulator blocks in VMEM
    assert not lstm_fused_supported(8, 784, 512, 4)


def test_pixel_lstm_fused_backend_matches_scan():
    from stf_unet_tpu.ops.lstm import pixel_lstm
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 64)), jnp.float32)
    w_ih, w_hh, b = _params(64)
    want = pixel_lstm(feat, w_ih, w_hh, b, backend="scan")
    got = pixel_lstm(feat, w_ih, w_hh, b, backend="pallas_fused_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss(fn_backend):
        def f(feat):
            return jnp.sum(pixel_lstm(feat, w_ih, w_hh, b,
                                      backend=fn_backend) ** 2)
        return jax.grad(f)(feat)

    np.testing.assert_allclose(np.asarray(loss("pallas_fused_interpret")),
                               np.asarray(loss("scan")),
                               atol=3e-4, rtol=3e-4)


class TestGSPMDPartitioning:
    """The fused kernel under a sharded mesh: custom_partitioning shards
    the row axis per device and psums the weight grads — outputs and every
    gradient must match the unsharded scan."""

    def _setup(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        t_steps, n, c = 4, 4 * 48, 64  # rows divide the mesh
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(t_steps, n, c)), jnp.float32)
        w_ih, w_hh, b = _params(c, key=8)
        cot = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        cots = jax.device_put(cot, NamedSharding(mesh, P("data", None)))
        return x, xs, w_ih, w_hh, b, cot, cots

    def test_forward_sharded_matches_scan(self):
        x, xs, w_ih, w_hh, b, _, _ = self._setup()

        @jax.jit
        def fwd(x, w_ih, w_hh, b):
            return fused_lstm_last_x(x, w_ih, w_hh, b, True, True)

        got = fwd(xs, w_ih, w_hh, b)
        want = lstm_scan(x, w_ih, w_hh, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_sharded_match_scan(self):
        x, xs, w_ih, w_hh, b, cot, cots = self._setup()

        def loss_fused(x, w_ih, w_hh, b, cot):
            return jnp.sum(fused_lstm_last_x(x, w_ih, w_hh, b, True, True)
                           * cot)

        def loss_scan(x, w_ih, w_hh, b, cot):
            return jnp.sum(lstm_scan(x, w_ih, w_hh, b) * cot)

        got = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(
            xs, w_ih, w_hh, b, cots)
        want = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(
            x, w_ih, w_hh, b, cot)
        for name, w, g in zip(("dx", "dw_ih", "dw_hh", "db"), want, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=3e-4, rtol=3e-4, err_msg=name)

    def test_pixel_lstm_auto_multi_device_is_scan_on_cpu(self):
        from stf_unet_tpu.ops.pallas.lstm_kernel import lstm_backend_default
        assert lstm_backend_default(True, n=500000, cdim=64) == "scan"


def test_explicit_fused_backend_unfittable_raises_clearly():
    rng = np.random.default_rng(9)
    feat = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 512)), jnp.float32)
    w = jnp.zeros((512, 2048), jnp.float32)
    b = jnp.zeros((2048,), jnp.float32)
    from stf_unet_tpu.ops.lstm import pixel_lstm
    with pytest.raises(ValueError, match="does not fit VMEM"):
        pixel_lstm(feat, w, w, b, backend="pallas_fused_interpret")


def test_legacy_pallas_backend_aliases_to_fused():
    from stf_unet_tpu.ops.lstm import pixel_lstm
    rng = np.random.default_rng(10)
    feat = jnp.asarray(rng.normal(size=(2, 3, 4, 4, 64)), jnp.float32)
    w_ih, w_hh, b = _params(64, key=11)
    got = pixel_lstm(feat, w_ih, w_hh, b, backend="pallas_interpret")
    want = pixel_lstm(feat, w_ih, w_hh, b, backend="scan")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
