"""Train state: params + BN running stats + optimizer state.

Optimizer: AdamW lr=1e-3 betas=(0.9,0.999) wd=1e-4 eps=1e-8 over all
trainable params (ref:train.py:227-237), with the warmup-poly per-step
schedule folded in (XLA fuses the whole update — the TPU equivalent of
torch's fused=True).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from stf_unet_tpu.core.config import ModelConfig, OptimConfig
from stf_unet_tpu.models.registry import create_model, preprocess_input


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    # Exponential moving average of params (None = EMA off). Initialized
    # to a copy of params, updated ema = d*ema + (1-d)*params inside the
    # jitted train step (one fused elementwise pass over the weights —
    # negligible against the conv FLOPs). No bias correction: the
    # init-to-params convention (torch.optim.swa_utils / flax common
    # practice). No reference counterpart.
    ema_params: Any = None

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def with_ema_weights(self) -> "TrainState":
        """State whose live params are the EMA weights (for eval/serving);
        identity when EMA is off."""
        if self.ema_params is None:
            return self
        return self.replace(params=self.ema_params)


def make_optimizer(cfg: OptimConfig, schedule,
                   grad_accum: int = 1) -> optax.GradientTransformation:
    """grad_accum > 1 wraps the optimizer in optax.MultiSteps: gradients
    average over k consecutive train steps and AdamW applies once per k
    (zero-updates in between), so a memory-capped per-step batch B trains
    with effective batch k*B (see PERFORMANCE.md memory envelope).
    Matches torch-style accumulation semantics: BN statistics and the
    dice-loss batch term see each microbatch separately. The schedule is
    consumed in optimizer-apply units (MultiSteps advances the inner count
    only on applies) — size it with steps_per_epoch/k."""
    optim = optax.adamw(
        learning_rate=schedule,
        b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    )
    if grad_accum > 1:
        optim = optax.MultiSteps(optim, every_k_schedule=int(grad_accum))
    return optim


def create_train_state(rng: jax.Array, model_cfg: ModelConfig,
                       optim: optax.GradientTransformation,
                       sample_input: jax.Array,
                       dtype: Any = None, ema: bool = False) -> TrainState:
    """Initialize model + optimizer from one example input batch
    ([B, T, H, W, C] sequence layout). ema=True tracks an EMA copy of the
    params (starts equal; a REAL buffer copy — the train step donates the
    state, and donation rejects the same buffer at two leaves)."""
    model = create_model(model_cfg, dtype=dtype)
    x = preprocess_input(sample_input, model)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optim.init(params)
    import jax.numpy as jnp
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                      ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                                  if ema else None))
