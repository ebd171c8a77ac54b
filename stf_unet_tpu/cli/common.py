"""Shared CLI plumbing: restore a trained model for inference, recovering
architecture-affecting settings from the checkpoint's config sidecar
(CheckpointManager.read_meta) so non-default checkpoints work with zero
extra flags. Explicit values win over the sidecar; reference defaults
(ref:train.py:96-121) fill any gap. Used by cli/test and cli/serve.
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import jax.numpy as jnp

from stf_unet_tpu.core.config import DataConfig, ModelConfig
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.checkpoint import CheckpointManager


def restore_inference_state(ckpt: CheckpointManager, kind: str):
    """Template-free inference restore (CheckpointManager
    .restore_variables — no optimizer/EMA structure assumptions can
    mismatch, so --grad-accum / --optim-ema-decay checkpoints load in
    every inference CLI). Returns a TrainState whose live params are the
    EMA weights when the checkpoint carries them."""
    from stf_unet_tpu.train.state import TrainState

    variables, used_ema, meta = ckpt.restore_variables(kind)
    if used_ema:
        print("using EMA weights (checkpoint carries an ema_params tree)")
    return TrainState(params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=None,
                      step=jnp.asarray(0, jnp.int32)), meta


def restore_for_inference(
        model_name: str, model_dir: str, *, root: str = ".",
        use_pk_maps: bool = False, use_subtraction: bool = False,
        num_classes: Optional[int] = None, base_c: Optional[int] = None,
        crop_size: Optional[int] = None, mask_format: Optional[str] = None,
        dtype=None,
) -> Tuple[object, object, DataConfig, ModelConfig, CheckpointManager, str,
           int]:
    """Load the best (else latest) checkpoint and build the model around
    its own training config. Returns (model, state, data_cfg, model_cfg,
    ckpt, kind, num_classes)."""
    from stf_unet_tpu.core import config as config_lib

    ckpt = CheckpointManager(model_dir, model_name,
                             "_pk" if use_pk_maps else "")
    kind = "best" if ckpt.exists("best") else "latest"
    if not ckpt.exists(kind):
        raise FileNotFoundError(
            f"{model_name}_best_model not found in {model_dir}")

    saved = None
    meta_cfg = ckpt.read_meta(kind).get("config")
    if meta_cfg:
        try:
            saved = config_lib.config_from_dict(config_lib.TrainConfig,
                                                json.loads(meta_cfg))
        except Exception as e:  # malformed sidecar: fall back to defaults
            print(f"note: unreadable checkpoint config ({e})")
    if saved is not None:
        # Sequence selection / PK channels pick the checkpoint FILE suffix,
        # so they cannot default from the sidecar — but a mismatch silently
        # evaluates on the wrong inputs; warn loudly.
        for flag, ours, theirs in (
                ("--use-subtraction", use_subtraction,
                 saved.data.use_subtraction),
                ("--use-pk-maps", use_pk_maps, saved.data.use_pk_maps)):
            if bool(ours) != bool(theirs):
                print(f"WARNING: checkpoint was trained with "
                      f"{flag}={bool(theirs)} but this run uses "
                      f"{flag}={bool(ours)} — inference will see different "
                      f"input sequences/channels than training did")

    num_classes = num_classes if num_classes is not None else (
        saved.model.total_classes if saved else 2)
    base_c = base_c if base_c is not None else (
        saved.model.base_c if saved else ModelConfig.base_c)
    crop_size = crop_size if crop_size is not None else (
        saved.data.crop_size if saved else DataConfig.crop_size)
    mask_format = mask_format if mask_format is not None else (
        saved.data.mask_format if saved else "binary")

    data_cfg = DataConfig(data_path=root,
                          use_subtraction=use_subtraction,
                          use_pk_maps=use_pk_maps,
                          crop_size=crop_size,
                          mask_format=mask_format,
                          **({"base_size": saved.data.base_size,
                              "mean": saved.data.mean,
                              "std": saved.data.std} if saved else {}))
    seq_types = data_cfg.resolved_sequence_types
    model_cfg = ModelConfig(model=model_name,
                            num_classes=num_classes - 1,
                            base_c=base_c,
                            time_steps=len(seq_types),
                            use_pk_maps=use_pk_maps)
    model = create_model(model_cfg, dtype=dtype)

    # Template-free restore: no optimizer (--grad-accum) or EMA-layout
    # structure to mismatch; the EMA weights are selected automatically.
    state, _ = restore_inference_state(ckpt, kind)
    return model, state, data_cfg, model_cfg, ckpt, kind, num_classes
