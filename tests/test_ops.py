"""Golden parity tests of the op layer against torch/PIL oracles
(SURVEY.md §7 "PyTorch op parity")."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as tF
from PIL import Image

from stf_unet_tpu.ops.conv import conv2d, conv_transpose2d_torch, max_pool_torch
from stf_unet_tpu.ops.lstm import lstm_scan
from stf_unet_tpu.ops.resize import (
    pil_resize_bilinear,
    pil_resize_weights,
    resize_bilinear_align_corners,
    resize_nearest,
    short_edge_size,
)

RNG = np.random.default_rng(0)


def test_conv2d_matches_torch():
    x = RNG.normal(size=(2, 9, 11, 3)).astype(np.float32)
    w = RNG.normal(size=(3, 3, 3, 5)).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1))
    theirs = tF.conv2d(torch.tensor(x).permute(0, 3, 1, 2),
                       torch.tensor(w).permute(3, 2, 0, 1),
                       stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p,op", [(2, 2, 0, 0), (3, 2, 1, 1)])
def test_conv_transpose_matches_torch(k, s, p, op):
    """Covers both reference upsamplers: UNet k2 s2 (ref:src/unet.py:28-34)
    and decoder k3 s2 p1 op1 (ref:src/stf_lstm_unet.py:43,135)."""
    cin, cout = 4, 6
    x = RNG.normal(size=(2, 7, 5, cin)).astype(np.float32)
    w_torch = RNG.normal(size=(cin, cout, k, k)).astype(np.float32)
    theirs = tF.conv_transpose2d(torch.tensor(x).permute(0, 3, 1, 2),
                                 torch.tensor(w_torch), stride=s, padding=p,
                                 output_padding=op).permute(0, 2, 3, 1).numpy()
    # importer transform: [in,out,kh,kw] -> flip spatial -> [kh,kw,in,out]
    w_ours = w_torch[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    ours = np.asarray(conv_transpose2d_torch(
        jnp.asarray(x), jnp.asarray(w_ours), stride=s, padding=p,
        output_padding=op))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 2, 1)])
def test_max_pool_matches_torch(k, s, p):
    x = RNG.normal(size=(2, 10, 12, 3)).astype(np.float32)
    ours = np.asarray(max_pool_torch(jnp.asarray(x), k, s, p))
    theirs = tF.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), k, s, p
                           ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("out_hw", [(14, 14), (7, 9), (13, 5)])
def test_bilinear_align_corners_matches_torch(out_hw):
    """ref:src/stf_lstm_unet.py:57,191-194 uses align_corners=True."""
    x = RNG.normal(size=(2, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), *out_hw))
    theirs = tF.interpolate(torch.tensor(x).permute(0, 3, 1, 2), size=out_hw,
                            mode="bilinear", align_corners=True
                            ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 48), (224, 168)),
                                          ((100, 80), (33, 27)),
                                          ((50, 50), (50, 50))])
def test_pil_bilinear_resize_parity(in_hw, out_hw):
    """Device-side resize weights reproduce PIL BILINEAR (ref:transforms.py:28)."""
    img = RNG.integers(0, 256, size=in_hw, dtype=np.uint8)
    pil_out = np.asarray(Image.fromarray(img).resize(
        (out_hw[1], out_hw[0]), Image.BILINEAR), dtype=np.float64)
    ours = np.asarray(pil_resize_bilinear(
        jnp.asarray(img, dtype=jnp.float32)[..., None], *out_hw))[..., 0]
    # PIL rounds to uint8; allow 1 intensity level.
    assert np.max(np.abs(np.round(ours) - pil_out)) <= 1.0


@pytest.mark.parametrize("in_hw,out_hw", [((64, 48), (224, 168)),
                                          ((100, 80), (33, 27))])
def test_nearest_resize_parity(in_hw, out_hw):
    """Mask resize matches PIL NEAREST (ref:transforms.py:31)."""
    img = RNG.integers(0, 2, size=in_hw, dtype=np.uint8) * 255
    pil_out = np.asarray(Image.fromarray(img).resize(
        (out_hw[1], out_hw[0]), Image.NEAREST))
    ours = np.asarray(resize_nearest(jnp.asarray(img), *out_hw))
    np.testing.assert_array_equal(ours, pil_out)


def test_short_edge_size():
    assert short_edge_size(100, 200, 224) == (224, 448)
    assert short_edge_size(200, 100, 224) == (448, 224)
    assert short_edge_size(224, 224, 224) == (224, 224)


def test_lstm_matches_torch():
    """Pixel-LSTM scan == torch nn.LSTM on the same weights
    (ref:src/stf_lstm_unet.py:124-127,219)."""
    torch.manual_seed(0)
    c, t, n = 16, 8, 32
    lstm = torch.nn.LSTM(c, c, batch_first=True)
    x = torch.randn(n, t, c)
    with torch.no_grad():
        out, _ = lstm(x)
    w_ih = lstm.weight_ih_l0.detach().numpy().T      # [C, 4C]
    w_hh = lstm.weight_hh_l0.detach().numpy().T
    b = (lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy()
    ours_seq = lstm_scan(jnp.asarray(x.numpy().transpose(1, 0, 2)),
                         jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(b),
                         return_sequence=True)
    np.testing.assert_allclose(np.asarray(ours_seq).transpose(1, 0, 2),
                               out.numpy(), rtol=1e-4, atol=1e-5)
    ours_last = lstm_scan(jnp.asarray(x.numpy().transpose(1, 0, 2)),
                          jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ours_last), out[:, -1].numpy(),
                               rtol=1e-4, atol=1e-5)
