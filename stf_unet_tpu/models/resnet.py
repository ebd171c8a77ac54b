"""ResNet-34 encoder (Flax linen, NHWC).

The reference uses torchvision resnet34(weights=None) as a per-time-step
encoder, replacing conv1 for the actual input channel count and discarding
avgpool/fc (ref:src/stf_lstm_unet.py:102-114). This is the same topology
built natively: stem (7x7 s2 + BN + ReLU + maxpool 3x3 s2 p1) then BasicBlock
stages [3, 4, 6, 3] at widths [64, 128, 256, 512], strides [1, 2, 2, 2].
Returns the four per-scale feature maps (1/4, 1/8, 1/16, 1/32).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax

from stf_unet_tpu.models.blocks import TorchBatchNorm
from stf_unet_tpu.ops.conv import max_pool_torch


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = TorchBatchNorm(dtype=self.dtype, name="bn2")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = TorchBatchNorm(dtype=self.dtype, name="down_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class ResNet34Encoder(nn.Module):
    """Four-scale feature extractor. Input [N, H, W, C] -> tuple of
    [N, H/4, W/4, 64], [N, H/8, W/8, 128], [N, H/16, W/16, 256],
    [N, H/32, W/32, 512]."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool) -> Tuple[jax.Array, ...]:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_torch(x, kernel=3, stride=2, padding=1)

        feats = []
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = BasicBlock(width, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_block{i}")(x, train=train)
            feats.append(x)
        return tuple(feats)
