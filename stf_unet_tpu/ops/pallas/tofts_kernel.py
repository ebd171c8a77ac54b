"""Pallas TPU kernel: fused extended-Tofts quadrature.

The Tofts forward/Jacobian (pk/tofts.py) computes
    E = exp(-(K/ve) Δ)           [N, T, Q]
    S = Σ_q w E,  S_Δ = Σ_q (wΔ) E
The XLA formulation can materialize the [N, T, Q] decay tensor in HBM
(~367 MB per 16k-voxel chunk at Q=700). This kernel streams voxel tiles:
per tile the exp and BOTH contractions happen in VMEM and only the
[tile, T] results are written.

Forward-only (the LM solver consumes S/S_Δ directly through the analytic
Jacobian; no autodiff through the kernel is needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tofts_kernel(rate_ref, lags_ref, w_ref, wlag_ref, s_ref, slag_ref):
    rate = rate_ref[:]                       # [tile, 1]
    lags = lags_ref[:]                       # [T, Q]
    t_steps = lags.shape[0]
    for t in range(t_steps):                 # T is small and static (8)
        decay = jnp.exp(-rate * lags[t][None, :])          # [tile, Q]
        s_ref[:, t] = jnp.sum(decay * w_ref[t][None, :], axis=1)
        slag_ref[:, t] = jnp.sum(decay * wlag_ref[t][None, :], axis=1)


def tofts_sums(rate: jax.Array, lags: jax.Array, weights: jax.Array,
               wlags: jax.Array, tile_n: int = 512,
               interpret: bool = False):
    """rate [N] (=K/ve), lags/weights/wlags [T, Q] ->
    (S [N, T], S_Δ [N, T])."""
    n = rate.shape[0]
    t_steps, q = lags.shape
    tile = max(8, min(tile_n, n))
    grid = (pl.cdiv(n, tile),)
    s, slag = pl.pallas_call(
        _tofts_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_steps, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_steps, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_steps, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, t_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, t_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t_steps), jnp.float32),
            jax.ShapeDtypeStruct((n, t_steps), jnp.float32),
        ],
        interpret=interpret,
    )(rate.reshape(n, 1).astype(jnp.float32), lags, weights, wlags)
    return s, slag
