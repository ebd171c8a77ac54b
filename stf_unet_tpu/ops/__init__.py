from stf_unet_tpu.ops.conv import conv2d, conv_transpose2d_torch, max_pool_torch
from stf_unet_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    pil_resize_weights,
)
from stf_unet_tpu.ops.lstm import lstm_scan

__all__ = [
    "conv2d",
    "conv_transpose2d_torch",
    "max_pool_torch",
    "resize_bilinear_align_corners",
    "resize_nearest",
    "pil_resize_weights",
    "lstm_scan",
]
