"""Model factory + input adaptation (ref:train.py:76-92,
ref:train_utils/train_and_eval.py:9-22)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from stf_unet_tpu.core.config import ModelConfig
from stf_unet_tpu.models.stf_lstm_unet import STFLSTMUNet
from stf_unet_tpu.models.unet import UNet


def create_model(cfg: ModelConfig, dtype: Any = None) -> nn.Module:
    """Build the configured model (ref:train.py:76-92).

    Mirrors the reference's channel arithmetic: the vanilla UNet takes the
    8 frames as stacked channels (+3 when PK maps ride along,
    ref:train.py:85-90).
    """
    if cfg.model == "stflstm":
        return STFLSTMUNet(
            num_classes=cfg.total_classes,
            time_steps=cfg.time_steps,
            use_pk_maps=cfg.use_pk_maps,
            pk_channels=cfg.pk_channels,
            dtype=dtype,
            lstm_backend=cfg.lstm_backend,
            remat=cfg.remat,
        )
    if cfg.model == "unet":
        return UNet(num_classes=cfg.total_classes, base_c=cfg.base_c, dtype=dtype)
    raise ValueError(f"Unknown model type: {cfg.model}")


def preprocess_input(inputs: jax.Array, model: nn.Module) -> jax.Array:
    """Adapt the batched [B, T, H, W, C] sequence to the model's declared
    input contract (ref:train_utils/train_and_eval.py:9-22)."""
    input_format = getattr(model, "input_format", "time_sequence")
    if input_format == "flat_channels":
        b, t, h, w, c = inputs.shape
        return inputs.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
    if input_format == "average_frame":
        return inputs.mean(axis=1)
    if input_format == "time_sequence":
        return inputs
    raise ValueError(f"Unsupported input_format: {input_format}")
