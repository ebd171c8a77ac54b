"""Extended Tofts forward model on a precomputed quadrature grid.

C(t) = vp*Cp(t) + Ktrans * ∫₀ᵗ Cp(τ) exp(-Ktrans (t-τ)/ve) dτ

The reference evaluates the convolution with a Python loop over the T output
time points, masking a dt=0.01 grid each iteration
(ref:pk_fitting.py:193-231). TPU-native design: precompute once
  * the masked quadrature weights  W[T, Q] = dt * Cp(τ_q) * [τ_q < t_i]
  * the lag matrix                 Δ[T, Q] = max(t_i − τ_q, 0)
then a batch of voxels is two fused elementwise ops and one einsum:
  C[n, i] = vp_n Cp(t_i) + Ktrans_n * Σ_q W[i,q] exp(−(Ktrans_n/ve_n) Δ[i,q])
The exp term is [N, T, Q]; the Σ_q contraction rides the MXU. Numerics are
identical to the reference loop (same grid, same mask, same dt scaling).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ToftsQuadrature:
    """Precomputed grid tensors shared by every voxel batch (a pytree, so
    it flows through jit as data)."""

    time_points: jax.Array   # [T]
    aif_at_t: jax.Array      # [T]  Cp(t_i)
    weights: jax.Array       # [T, Q]  dt * Cp(tau_q) * [tau_q < t_i]
    lags: jax.Array          # [T, Q]  max(t_i - tau_q, 0)

    @staticmethod
    def build(time_points, aif: Callable, dt: float = 0.01) -> "ToftsQuadrature":
        t = jnp.asarray(time_points, jnp.float32)
        # Same grid as the reference: arange(0, t_max, dt) (ref:204-207).
        max_time = float(np.asarray(time_points)[-1])
        tau = jnp.arange(0.0, max_time, dt, dtype=jnp.float32)
        aif_tau = aif(tau)                       # [Q]
        mask = (tau[None, :] < t[:, None])       # [T, Q]
        weights = dt * aif_tau[None, :] * mask
        lags = jnp.maximum(t[:, None] - tau[None, :], 0.0)
        return ToftsQuadrature(time_points=t, aif_at_t=aif(t),
                               weights=weights, lags=lags)


def extended_tofts_batch(quad: ToftsQuadrature, ktrans: jax.Array,
                         ve: jax.Array, vp: jax.Array) -> jax.Array:
    """[N] params -> [N, T] concentration curves."""
    rate = (ktrans / ve)[:, None, None]                       # [N,1,1]
    decay = jnp.exp(-rate * quad.lags[None, :, :])            # [N,T,Q]
    conv = jnp.einsum("ntq,tq->nt", decay, quad.weights)      # [N,T]
    return vp[:, None] * quad.aif_at_t[None, :] + ktrans[:, None] * conv


def _dual_sums(quad: ToftsQuadrature, rate: jax.Array, backend: str):
    """S = Σ_q w E and S_Δ = Σ_q w Δ E where E = exp(-rate Δ)."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend.startswith("pallas"):
        # Fused VMEM kernel: no [N,T,Q] HBM materialization (measured ~27%
        # faster than the XLA einsum pair at 16k voxels on v5e).
        from stf_unet_tpu.ops.pallas.tofts_kernel import tofts_sums
        return tofts_sums(rate, quad.lags, quad.weights,
                          quad.weights * quad.lags,
                          interpret=backend.endswith("_interpret"))
    decay = jnp.exp(-rate[:, None, None] * quad.lags[None, :, :])  # [N,T,Q]
    s = jnp.einsum("ntq,tq->nt", decay, quad.weights)
    s_lag = jnp.einsum("ntq,tq->nt", decay, quad.weights * quad.lags)
    return s, s_lag


def extended_tofts_from_sums(quad: ToftsQuadrature, ktrans: jax.Array,
                             vp: jax.Array, s: jax.Array) -> jax.Array:
    """C = vp Cp(t) + K S — the forward model given a precomputed S.
    Single source of truth for the expression (used by the batch forward,
    the Jacobian path, and the LM trial step)."""
    return vp[:, None] * quad.aif_at_t[None, :] + ktrans[:, None] * s


def extended_tofts_with_jacobian(quad: ToftsQuadrature, ktrans: jax.Array,
                                 ve: jax.Array, vp: jax.Array,
                                 backend: str = "auto"):
    """-> (C [N, T], J [N, T, 3]) with the ANALYTIC parameter Jacobian.

    With S = Σ_q w E and S_Δ = Σ_q w Δ E where E = exp(-(K/ve) Δ):
        C        = vp Cp(t) + K S
        ∂C/∂K    = S - (K/ve) S_Δ
        ∂C/∂ve   = (K²/ve²) S_Δ
        ∂C/∂vp   = Cp(t)
    One exp sweep and two contractions replace the four forward/JVP
    evaluations of an autodiff Jacobian — the Gauss-Newton inner loop's
    dominant cost halves. backend 'auto' routes the sums through the fused
    Pallas kernel on TPU (forward-only; no autodiff needed here).
    """
    s, s_lag = _dual_sums(quad, ktrans / ve, backend)
    c = extended_tofts_from_sums(quad, ktrans, vp, s)
    d_k = s - (ktrans / ve)[:, None] * s_lag
    d_ve = ((ktrans ** 2) / (ve ** 2))[:, None] * s_lag
    d_vp = jnp.broadcast_to(quad.aif_at_t[None, :], c.shape)
    jac = jnp.stack([d_k, d_ve, d_vp], axis=-1)
    return c, jac
