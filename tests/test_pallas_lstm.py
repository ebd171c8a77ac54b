"""Last-only Pallas LSTM inference kernel vs the scan reference (interpret
mode — the kernel logic runs on CPU exactly as written). The training
kernel lives in tests/test_lstm_train_kernel.py; the r1 full-sequence
kernel was retired in r2 (see ops/pallas/lstm_kernel.py docstring)."""

import numpy as np

import jax
import jax.numpy as jnp

from stf_unet_tpu.ops.lstm import lstm_scan, pixel_lstm

RNG = np.random.default_rng(0)


def _setup(t=4, n=96, c=16):
    x = jnp.asarray(RNG.normal(size=(t, n, c)), jnp.float32)
    w_ih = jnp.asarray(RNG.normal(size=(c, 4 * c)) * 0.2, jnp.float32)
    w_hh = jnp.asarray(RNG.normal(size=(c, 4 * c)) * 0.2, jnp.float32)
    b = jnp.asarray(RNG.normal(size=(4 * c,)) * 0.1, jnp.float32)
    return x, w_ih, w_hh, b


def test_fused_last_matches_scan():
    x, w_ih, w_hh, b = _setup(n=70)
    from stf_unet_tpu.ops.pallas.lstm_kernel import fused_lstm_last
    x_proj = jnp.einsum("tnc,cd->tnd", x, w_ih)
    h_last = fused_lstm_last(x_proj, w_hh, b, tile_n=32, interpret=True)
    want = lstm_scan(x, w_ih, w_hh, b)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pixel_lstm_last_backend():
    feat = jnp.asarray(RNG.normal(size=(2, 3, 4, 5, 8)), jnp.float32)
    w_ih = jnp.asarray(RNG.normal(size=(8, 32)) * 0.2, jnp.float32)
    w_hh = jnp.asarray(RNG.normal(size=(8, 32)) * 0.2, jnp.float32)
    b = jnp.asarray(RNG.normal(size=(32,)) * 0.1, jnp.float32)
    scan_out = pixel_lstm(feat, w_ih, w_hh, b, backend="scan")
    last_out = pixel_lstm(feat, w_ih, w_hh, b,
                          backend="pallas_last_interpret")
    np.testing.assert_allclose(np.asarray(last_out), np.asarray(scan_out),
                               rtol=1e-5, atol=1e-5)
