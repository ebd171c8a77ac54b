"""Mixed-precision policy.

TPU-native stand-in for torch.cuda.amp (ref:train.py:112-113,240-242 and
train_and_eval.py:389): params and optimizer state stay float32, activations
compute in bfloat16, losses/reductions in float32. bf16 has the same exponent
range as f32, so no GradScaler / loss scaling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def make_policy(amp: bool) -> Policy:
    if amp:
        return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
                      output_dtype=jnp.float32)
    return Policy()
