"""Fused Pallas LSTM kernel vs the scan reference, forward + gradients
(interpret mode — the kernel logic runs on CPU exactly as written)."""

import numpy as np

import jax
import jax.numpy as jnp

from stf_unet_tpu.ops.lstm import lstm_scan, pixel_lstm
from stf_unet_tpu.ops.pallas.lstm_kernel import fused_lstm_sequence

RNG = np.random.default_rng(0)


def _setup(t=4, n=96, c=16):
    x = jnp.asarray(RNG.normal(size=(t, n, c)), jnp.float32)
    w_ih = jnp.asarray(RNG.normal(size=(c, 4 * c)) * 0.2, jnp.float32)
    w_hh = jnp.asarray(RNG.normal(size=(c, 4 * c)) * 0.2, jnp.float32)
    b = jnp.asarray(RNG.normal(size=(4 * c,)) * 0.1, jnp.float32)
    return x, w_ih, w_hh, b


def test_fused_forward_matches_scan():
    x, w_ih, w_hh, b = _setup()
    x_proj = jnp.einsum("tnc,cd->tnd", x, w_ih)
    h_seq = fused_lstm_sequence(x_proj, w_hh, b, tile_n=32, interpret=True)
    want = lstm_scan(x, w_ih, w_hh, b, return_sequence=True)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_ragged_rows():
    # N not a multiple of the tile: ragged last block must still be exact
    x, w_ih, w_hh, b = _setup(n=70)
    x_proj = jnp.einsum("tnc,cd->tnd", x, w_ih)
    h_seq = fused_lstm_sequence(x_proj, w_hh, b, tile_n=32, interpret=True)
    want = lstm_scan(x, w_ih, w_hh, b, return_sequence=True)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_scan():
    x, w_ih, w_hh, b = _setup(t=3, n=32, c=8)

    def loss_fused(x_proj, w_hh, b):
        h = fused_lstm_sequence(x_proj, w_hh, b, tile_n=16, interpret=True)
        return jnp.sum(h[-1] ** 2) + 0.5 * jnp.sum(h ** 2)

    def loss_scan(x_proj, w_hh, b):
        # scan formulation taking the same precomputed projection
        t, n, c4 = x_proj.shape
        c = c4 // 4
        from stf_unet_tpu.ops.lstm import lstm_cell

        def step(carry, xp):
            h, cc = carry
            h2, c2 = lstm_cell(xp, h, cc, w_hh, b)
            return (h2, c2), h2

        (_, _), seq = jax.lax.scan(
            step, (jnp.zeros((n, c)), jnp.zeros((n, c))), x_proj)
        return jnp.sum(seq[-1] ** 2) + 0.5 * jnp.sum(seq ** 2)

    x_proj = jnp.einsum("tnc,cd->tnd", x, w_ih)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x_proj, w_hh, b)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2))(x_proj, w_hh, b)
    for a, c in zip(g_fused, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_pixel_lstm_backend_switch():
    feat = jnp.asarray(RNG.normal(size=(2, 3, 4, 5, 8)), jnp.float32)
    w_ih = jnp.asarray(RNG.normal(size=(8, 32)) * 0.2, jnp.float32)
    w_hh = jnp.asarray(RNG.normal(size=(8, 32)) * 0.2, jnp.float32)
    b = jnp.asarray(RNG.normal(size=(32,)) * 0.1, jnp.float32)
    scan_out = pixel_lstm(feat, w_ih, w_hh, b, backend="scan")
    pallas_out = pixel_lstm(feat, w_ih, w_hh, b, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(scan_out),
                               rtol=1e-5, atol=1e-5)


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
