"""Shared conv building blocks (Flax linen, NHWC).

BatchNorm parity with torch defaults: eps=1e-5; torch momentum 0.1 ==
flax momentum 0.9 (running = 0.9*running + 0.1*batch).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from stf_unet_tpu.ops.conv import conv_transpose2d_torch
from stf_unet_tpu.ops.resize import resize_bilinear_align_corners

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch default hyperparameters.

    Under jit+GSPMD with a sharded batch axis the batch statistics are
    global across the data-parallel mesh automatically (XLA inserts the
    cross-replica reductions) — this is the cross-replica BN choice called
    out in SURVEY.md §7.
    """

    use_running_average: Optional[bool] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        return nn.BatchNorm(
            use_running_average=ura, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn",
        )(x)


class ConvBNRelu(nn.Module):
    """Conv3x3(pad 1) -> BN -> ReLU (half of ref:src/unet.py:10-18)."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=self.use_bias,
                    dtype=self.dtype, name="conv")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="norm")(x, use_running_average=not train)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """2x(Conv3x3 -> BN -> ReLU): the UNet conv_block (ref:src/unet.py:10-18)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = ConvBNRelu(self.features, dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvBNRelu(self.features, dtype=self.dtype, name="conv2")(x, train=train)
        return x


class ResidualConvBlock(nn.Module):
    """2x(Conv3x3 no-bias -> BN) + projection shortcut, then ReLU
    (ref:src/stf_lstm_unet.py:7-35)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="norm1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = TorchBatchNorm(dtype=self.dtype, name="norm2")(y, use_running_average=not train)
        if x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), use_bias=False,
                               dtype=self.dtype, name="shortcut_conv")(x)
            residual = TorchBatchNorm(dtype=self.dtype, name="shortcut_norm")(
                residual, use_running_average=not train)
        return nn.relu(y + residual)


class ConvTranspose(nn.Module):
    """Transposed conv with torch ConvTranspose2d(k,s,p,op) arithmetic.

    Kernel stored in forward-conv HWIO form (see ops/conv.py).
    """

    features: int
    kernel: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        # torch ConvTranspose2d default init: uniform(-k, k), k=1/sqrt(in_c*kh*kw)
        bound = 1.0 / (in_c * self.kernel * self.kernel) ** 0.5
        init = nn.initializers.uniform(scale=2 * bound)

        def centered(key, shape, dtype):
            return init(key, shape, dtype) - bound

        w = self.param("kernel", centered,
                       (self.kernel, self.kernel, in_c, self.features), jnp.float32)
        y = conv_transpose2d_torch(
            x, w.astype(x.dtype), stride=self.stride, padding=self.padding,
            output_padding=self.output_padding,
            preferred_dtype=x.dtype,
        )
        if self.use_bias:
            b = self.param("bias", centered, (self.features,), jnp.float32)
            y = y + b.astype(x.dtype)
        return y


class DecoderBlock(nn.Module):
    """ConvT k3 s2 p1 op1 upsample -> (bilinear size-fix) -> skip concat ->
    1x1 fusion -> ResidualConvBlock (ref:src/stf_lstm_unet.py:38-68)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        x = ConvTranspose(self.features, kernel=3, stride=2, padding=1,
                          output_padding=1, dtype=self.dtype, name="up")(x)
        if x.shape[1:3] != skip.shape[1:3]:
            x = resize_bilinear_align_corners(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="fusion")(x)
        return ResidualConvBlock(self.features, dtype=self.dtype,
                                 name="res_conv")(x, train=train)
