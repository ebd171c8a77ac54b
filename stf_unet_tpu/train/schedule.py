"""Per-step warmup + poly-decay LR schedule
(ref:train_utils/train_and_eval.py:414-438)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_schedule(base_lr: float, num_step: int, epochs: int,
                         warmup: bool = True, warmup_epochs: int = 1,
                         warmup_factor: float = 1e-3, power: float = 0.9):
    """Returns an optax-compatible schedule fn: step -> lr.

    Linear warmup factor warmup_factor -> 1 over `warmup_epochs` epochs, then
    polynomial decay (1 - progress)^power to 0 at the final step (deeplab
    style). Step counting matches LambdaLR: lr used at step x is f(x).
    """
    assert num_step > 0 and epochs > 0
    if not warmup:
        warmup_epochs = 0
    warmup_steps = warmup_epochs * num_step
    total_decay = (epochs - warmup_epochs) * num_step

    def schedule(step):
        x = jnp.asarray(step, dtype=jnp.float32)
        alpha = x / jnp.maximum(warmup_steps, 1)
        warm = warmup_factor * (1 - alpha) + alpha
        progress = (x - warmup_steps) / jnp.maximum(total_decay, 1)
        decay = jnp.maximum(1.0 - progress, 0.0) ** power
        factor = jnp.where((warmup_steps > 0) & (x <= warmup_steps), warm, decay)
        return base_lr * factor

    return schedule
