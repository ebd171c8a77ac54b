"""Convolution / pooling primitives with exact PyTorch arithmetic.

NHWC activations, HWIO kernels (TPU-native layouts). These exist so model
forward passes can be golden-tested against the reference's torch modules
(ref:src/unet.py:10-37, ref:src/stf_lstm_unet.py:43,105-137) with imported
weights.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


def conv2d(x: jax.Array, w: jax.Array, stride: Union[int, Sequence[int]] = 1,
           padding: Union[int, Sequence[int]] = 0, *, preferred_dtype=jnp.float32) -> jax.Array:
    """Plain 2-D convolution. x:[B,H,W,Cin], w:[kh,kw,Cin,Cout]."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return lax.conv_general_dilated(
        x, w, window_strides=(sh, sw), padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DN, preferred_element_type=preferred_dtype,
    )


def conv_transpose2d_torch(x: jax.Array, w: jax.Array, *, stride: int,
                           padding: int, output_padding: int = 0,
                           preferred_dtype=jnp.float32) -> jax.Array:
    """Transposed conv with torch ConvTranspose2d(k,s,p,op) arithmetic.

    out = (in-1)*s - 2p + k + op  (ref decoder upsamples:
    ref:src/unet.py:28-34 k2 s2; ref:src/stf_lstm_unet.py:43,135 k3 s2 p1 op1).

    Implemented as an input-dilated regular convolution:
    lhs_dilation=s, explicit padding (k-1-p, k-1-p+op) per spatial dim.
    `w` is stored in forward-conv form [kh,kw,Cin,Cout]: already spatially
    flipped relative to torch's ConvTranspose weight (the torch importer
    performs flip + in/out transpose once at load time).
    """
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride), dimension_numbers=_DN,
        preferred_element_type=preferred_dtype,
    )


def max_pool_torch(x: jax.Array, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """MaxPool2d with torch semantics (pad with -inf, floor output size).

    Covers MaxPool2d(2) (ref:src/unet.py:25) and the ResNet stem pool
    k3 s2 p1 (torchvision resnet34, used at ref:src/stf_lstm_unet.py:110).
    """
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
