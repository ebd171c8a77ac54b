"""PRNG key management.

Deterministic, resumable randomness: one root seed; per-purpose streams
derived by folding in stable integers. The data-augmentation stream folds in
(epoch, step) so checkpoint resume is step-exact (SURVEY.md §5 elasticity).
"""

from __future__ import annotations

import jax

# Stable stream ids.
STREAM_INIT = 0
STREAM_AUGMENT = 1
STREAM_DROPOUT = 2
STREAM_PK = 3


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def stream(key: jax.Array, stream_id: int) -> jax.Array:
    return jax.random.fold_in(key, stream_id)


def augment_key(key: jax.Array, epoch: int, step: int) -> jax.Array:
    k = stream(key, STREAM_AUGMENT)
    k = jax.random.fold_in(k, epoch)
    return jax.random.fold_in(k, step)
