"""Eval-time Dice (ref:train_utils/train_and_eval.py:72-142).

Reference semantics replicated exactly, including the quirk that
ignore-masked pixels are zeroed into class 0 for BOTH pred and target
(ref:87-90) rather than excluded, and union==0 -> dice=1 (ref:104-107).
Running state is (cumulative_dice[C], count) so it reduces globally under
the mesh, replacing dist.all_reduce (ref:125-132).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def eval_dice_update(cumulative: jax.Array, count: jax.Array,
                     logits: jax.Array, target: jax.Array,
                     ignore_index: int = 255) -> Tuple[jax.Array, jax.Array]:
    """One batch update. logits: [B, H, W, C]; target: [B, H, W].

    Dice is computed PER IMAGE and summed (count advances by B), so batched
    eval is exactly the reference's batch_size=1 accumulation
    (ref:train.py:206-211 loaders are batch 1; at B=1 the two readings of
    ref:93-118 coincide)."""
    num_classes = logits.shape[-1]
    b = logits.shape[0]
    pred = jnp.argmax(logits, axis=-1)
    keep = target != ignore_index
    pred = jnp.where(keep, pred, 0)
    tgt = jnp.where(keep, target, 0)

    pred = pred.reshape(b, -1)
    tgt = tgt.reshape(b, -1)
    dice_per_class = []
    for c in range(num_classes):
        p = (pred == c).astype(jnp.float32)
        t = (tgt == c).astype(jnp.float32)
        inter = jnp.sum(p * t, axis=1)                    # [B]
        union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)   # [B]
        dice = jnp.where(union > 0, 2.0 * inter / union, 1.0)
        dice_per_class.append(jnp.sum(dice))
    return cumulative + jnp.stack(dice_per_class), count + b


def eval_dice_value(cumulative: jax.Array, count: jax.Array) -> jax.Array:
    """Mean over classes of the running mean (ref:120-138)."""
    return jnp.where(count > 0, jnp.mean(cumulative / jnp.maximum(count, 1)), 0.0)
