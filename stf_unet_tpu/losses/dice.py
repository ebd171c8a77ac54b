"""Dice loss with reference semantics (ref:train_utils/dice_coefficient_loss.py).

All functions are pure and jit-safe (no data-dependent shapes): the
ignore-mask filtering of the reference (boolean indexing at ref:29-31)
becomes multiplicative masking, which is algebraically identical for dice
(ignored lanes contribute 0 to both intersection and sums).

Layout note: logits/targets are channels-last [B, H, W, C] / [B, H, W].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_target(target: jax.Array, num_classes: int = 2,
                 ignore_index: int = -100) -> jax.Array:
    """One-hot the labels; ignored pixels get value `ignore_index` in every
    channel (ref:dice_coefficient_loss.py:5-17). Returns [B, H, W, C]."""
    if ignore_index >= 0:
        ignore_mask = target == ignore_index
        cleaned = jnp.where(ignore_mask, 0, target)
        one_hot = jax.nn.one_hot(cleaned, num_classes, dtype=jnp.float32)
        return jnp.where(ignore_mask[..., None],
                         jnp.float32(ignore_index), one_hot)
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def dice_coeff(x: jax.Array, target: jax.Array, ignore_index: int = -100,
               epsilon: float = 1e-6) -> jax.Array:
    """Per-image dice averaged over the batch, one class channel.

    x, target: [B, H, W]. Mirrors ref:dice_coefficient_loss.py:20-39
    including the empty-set guard sets_sum==0 -> 2*inter.
    """
    x = x.reshape(x.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    if ignore_index >= 0:
        keep = (target != ignore_index).astype(x.dtype)
        x = x * keep
        target = jnp.where(target == ignore_index, 0.0, target)
    inter = jnp.sum(x * target, axis=1)
    sets_sum = jnp.sum(x, axis=1) + jnp.sum(target, axis=1)
    sets_sum = jnp.where(sets_sum == 0, 2 * inter, sets_sum)
    d = (2 * inter + epsilon) / (sets_sum + epsilon)
    return jnp.mean(d)


def multiclass_dice_coeff(x: jax.Array, target: jax.Array,
                          ignore_index: int = -100,
                          epsilon: float = 1e-6) -> jax.Array:
    """Mean dice over class channels. x, target: [B, H, W, C]
    (ref:dice_coefficient_loss.py:42-48)."""
    num_classes = x.shape[-1]
    total = 0.0
    for c in range(num_classes):
        total = total + dice_coeff(x[..., c], target[..., c], ignore_index, epsilon)
    return total / num_classes


def dice_loss(logits: jax.Array, dice_target: jax.Array, multiclass: bool = True,
              ignore_index: int = -100) -> jax.Array:
    """1 - dice(softmax(logits)) (ref:dice_coefficient_loss.py:51-55)."""
    probs = jax.nn.softmax(logits, axis=-1)
    fn = multiclass_dice_coeff if multiclass else dice_coeff
    return 1.0 - fn(probs, dice_target, ignore_index=ignore_index)
