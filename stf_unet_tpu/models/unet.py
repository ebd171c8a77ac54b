"""Vanilla 2-D UNet (ref:src/unet.py:5-57), NHWC Flax.

Consumes the T temporal frames as stacked channels
(input_format="flat_channels": [B, H, W, T*C]); encoder widths
base_c * (1, 2, 4, 8), 1024-ch bottleneck, ConvTranspose k2 s2 upsampling,
skip concats, 1x1 head. Returns {"out": logits} like the reference.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from stf_unet_tpu.models.blocks import ConvTranspose, DoubleConv
from stf_unet_tpu.ops.conv import max_pool_torch


class UNet(nn.Module):
    input_format = "flat_channels"

    num_classes: int = 2
    base_c: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        c = self.base_c
        e1 = DoubleConv(c, dtype=self.dtype, name="enc1")(x, train=train)
        e2 = DoubleConv(c * 2, dtype=self.dtype, name="enc2")(
            max_pool_torch(e1, 2, 2), train=train)
        e3 = DoubleConv(c * 4, dtype=self.dtype, name="enc3")(
            max_pool_torch(e2, 2, 2), train=train)
        e4 = DoubleConv(c * 8, dtype=self.dtype, name="enc4")(
            max_pool_torch(e3, 2, 2), train=train)

        b = DoubleConv(c * 16, dtype=self.dtype, name="bottleneck")(
            max_pool_torch(e4, 2, 2), train=train)

        d4 = ConvTranspose(c * 8, kernel=2, stride=2, dtype=self.dtype, name="up4")(b)
        d4 = DoubleConv(c * 8, dtype=self.dtype, name="dec4")(
            jnp.concatenate([d4, e4], axis=-1), train=train)
        d3 = ConvTranspose(c * 4, kernel=2, stride=2, dtype=self.dtype, name="up3")(d4)
        d3 = DoubleConv(c * 4, dtype=self.dtype, name="dec3")(
            jnp.concatenate([d3, e3], axis=-1), train=train)
        d2 = ConvTranspose(c * 2, kernel=2, stride=2, dtype=self.dtype, name="up2")(d3)
        d2 = DoubleConv(c * 2, dtype=self.dtype, name="dec2")(
            jnp.concatenate([d2, e2], axis=-1), train=train)
        d1 = ConvTranspose(c, kernel=2, stride=2, dtype=self.dtype, name="up1")(d2)
        d1 = DoubleConv(c, dtype=self.dtype, name="dec1")(
            jnp.concatenate([d1, e1], axis=-1), train=train)

        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="out_conv")(d1)
        return {"out": out.astype(jnp.float32)}
