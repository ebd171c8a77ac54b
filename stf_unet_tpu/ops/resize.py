"""Resize ops as separable weight-matrix matmuls (MXU-friendly).

Three resampling families the reference relies on, each with exact parity:
  * torch F.interpolate(mode='bilinear', align_corners=True) — used inside
    model decoders (ref:src/stf_lstm_unet.py:57,191-194).
  * PIL/torchvision nearest — mask resizing (ref:transforms.py:31).
  * PIL bilinear (antialiased) — image resizing (ref:transforms.py:28);
    weight construction mirrors PIL's triangle-filter resampling so the
    device-side matmul reproduces PIL output to float tolerance.

A separable resize is two small matmuls: y = W_h @ x @ W_w^T. On TPU these
ride the MXU instead of gather units.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True torch semantics. x:[...,H,W,C]."""
    h, w = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(_align_corners_weights(h, out_h), dtype=x.dtype)
    ww = jnp.asarray(_align_corners_weights(w, out_w), dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", wh, x)
    return jnp.einsum("pw,...owc->...opc", ww, y)


@lru_cache(maxsize=256)
def _align_corners_weights(in_size: int, out_size: int) -> np.ndarray:
    """W[out,in] for 1-D linear interpolation with align_corners=True."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        w[0, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        src = o * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[o, lo] += 1.0 - frac
        w[o, hi] += frac
    return w


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize with PIL semantics (src = floor((o+0.5)*scale)).

    Used for masks so labels stay crisp (ref:transforms.py:31).
    x: [..., H, W] — the last two dims are spatial (masks carry no channel).
    """
    rows = _nearest_indices(x.shape[-2], out_h)
    cols = _nearest_indices(x.shape[-1], out_w)
    return x[..., rows, :][..., :, cols]


@lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # Exact PIL parity: PIL's nearest affine path ACCUMULATES the scale step
    # (`xo += a[0]` in libImaging/Geometry.c ImagingScaleAffine), so results
    # at integer boundaries follow float64 accumulation drift, not
    # (o + 0.5) * scale. Replicate with sequential accumulation.
    scale = in_size / out_size
    steps = np.concatenate([[0.5 * scale], np.full(out_size - 1, scale)])
    xo = np.add.accumulate(steps)
    return np.clip(xo.astype(np.int64), 0, in_size - 1)


@lru_cache(maxsize=256)
def pil_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """W[out,in] replicating PIL's bilinear (triangle filter) resampling.

    PIL widens the filter support by the downscale factor (antialiasing),
    normalizes weights per output pixel, and clamps at borders. This is the
    algorithm behind Image.resize(..., BILINEAR) that torchvision F.resize
    applies to PIL inputs (ref:transforms.py:28).
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support
    for o in range(out_size):
        center = (o + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        idx = np.arange(lo, hi)
        arg = (idx + 0.5 - center) / filterscale
        k = np.where(np.abs(arg) < 1.0, 1.0 - np.abs(arg), 0.0)
        s = k.sum()
        if s > 0:
            k /= s
        w[o, lo:hi] = k
    return w.astype(np.float32)


def pil_resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Antialiased bilinear resize with PIL parity. x: [..., H, W, C]."""
    h, w = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(pil_resize_weights(h, out_h), dtype=x.dtype)
    ww = jnp.asarray(pil_resize_weights(w, out_w), dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", wh, x)
    return jnp.einsum("pw,...owc->...opc", ww, y)


def short_edge_size(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision F.resize(int) semantics: scale the short edge to `size`
    preserving aspect ratio, TRUNCATING the long edge
    (torchvision computes `int(size * long / short)` — ref:transforms.py:26-31)."""
    if h <= w:
        return size, max(1, int(size * w / h))
    return max(1, int(size * h / w)), size
