"""Combined CE + dice training loss (ref:train_utils/train_and_eval.py:299-313)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stf_unet_tpu.losses.dice import build_target, dice_loss


def cross_entropy(logits: jax.Array, target: jax.Array,
                  ignore_index: int = -100,
                  weight: Optional[jax.Array] = None) -> jax.Array:
    """torch F.cross_entropy semantics: softmax CE, mean over non-ignored
    pixels; with class weights the mean is weight-normalized.

    logits: [B, H, W, C]; target: [B, H, W] int.
    """
    num_classes = logits.shape[-1]
    valid = (target != ignore_index) & (target >= 0) & (target < num_classes)
    safe_target = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # One-hot contraction instead of take_along_axis: a per-pixel gather
    # lowers to an 11.8 ms/step kCustom fusion on TPU (measured via xplane
    # trace, r2) while the one-hot multiply-sum is a plain VPU fusion.
    onehot = jax.nn.one_hot(safe_target, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weight is not None:
        w = jnp.sum(weight.astype(logp.dtype) * onehot, axis=-1) * valid
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    valid_f = valid.astype(jnp.float32)
    return jnp.sum(nll * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)


def criterion(outputs: Dict[str, jax.Array], target: jax.Array,
              loss_weight: Optional[jax.Array] = None, num_classes: int = 2,
              dice: bool = True, ignore_index: int = -100) -> jax.Array:
    """Per-head CE (+ dice); aux head weighted 0.5 when present
    (ref:train_and_eval.py:299-313)."""
    losses = {}
    for name, logits in outputs.items():
        loss = cross_entropy(logits, target, ignore_index=ignore_index,
                             weight=loss_weight)
        if dice:
            dice_target = build_target(target, num_classes, ignore_index)
            loss = loss + dice_loss(logits, dice_target, multiclass=True,
                                    ignore_index=ignore_index)
        losses[name] = loss
    if len(losses) == 1:
        return losses["out"]
    return losses["out"] + 0.5 * losses["aux"]
