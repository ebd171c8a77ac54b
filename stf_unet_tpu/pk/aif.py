"""Arterial input function models (ref:pk_fitting.py:28-129).

Three methods, selectable like the reference's aif_method:
  * population — Parker biexponential with dose scaling (ref:28-46),
  * modified   — same biexponential without dose (ref:48-56),
  * auto       — data-driven: the voxel with the steepest temporal rise
    inside the tissue mask supplies the reference curve (ref:96-129; the
    reference's own auto path is incomplete — it references an undefined
    `aif_concentration` at ref:127 — so this implementation follows the
    completed variant's structure with linear-interp resampling).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Parker model parameters (ref:pk_fitting.py:40-42).
_A1, _A2 = 3.99, 4.78
_M1, _M2 = 0.144, 0.0111


def population_aif(t: jax.Array, dose: float = 0.1) -> jax.Array:
    """dose * (a1*exp(-m1 t) + a2*exp(-m2 t)) (ref:28-46)."""
    return dose * (_A1 * jnp.exp(-_M1 * t) + _A2 * jnp.exp(-_M2 * t))


def modified_aif(t: jax.Array) -> jax.Array:
    """Biexponential without the dose factor (ref:48-56)."""
    return _A1 * jnp.exp(-_M1 * t) + _A2 * jnp.exp(-_M2 * t)


def _interp_aif(sample_times: np.ndarray, curve: np.ndarray) -> Callable:
    """Linear-interp resampler with extrapolation (ref:75-84 uses scipy
    interp1d(fill_value='extrapolate'); jnp.interp clamps, so extrapolate
    the end segments explicitly)."""
    st = np.asarray(sample_times, dtype=np.float32)
    cv = np.asarray(curve, dtype=np.float32)

    def aif(t: jax.Array) -> jax.Array:
        t = jnp.asarray(t, jnp.float32)
        inner = jnp.interp(t, st, cv)
        lo_slope = (cv[1] - cv[0]) / (st[1] - st[0])
        hi_slope = (cv[-1] - cv[-2]) / (st[-1] - st[-2])
        lo = cv[0] + (t - st[0]) * lo_slope
        hi = cv[-1] + (t - st[-1]) * hi_slope
        return jnp.where(t < st[0], lo, jnp.where(t > st[-1], hi, inner))

    return aif


def auto_detect_aif(images: np.ndarray, tissue_mask: np.ndarray,
                    sample_times: np.ndarray
                    ) -> Tuple[Callable, Tuple[int, int]]:
    """Pick the masked voxel with the largest single-step temporal increase
    and use its curve as the AIF (ref:96-129)."""
    diff = np.diff(images, axis=0)
    peak = diff.max(axis=0) * np.asarray(tissue_mask, dtype=images.dtype)
    pos = np.unravel_index(int(np.argmax(peak)), peak.shape)
    curve = images[:, pos[0], pos[1]]
    return _interp_aif(sample_times, curve), (int(pos[0]), int(pos[1]))


def make_aif(method: str, dose: float = 0.1,
             auto_curve: Optional[Callable] = None) -> Callable:
    """Resolve aif_method to a t -> Cp(t) callable (ref:58-94). The 'auto'
    method falls back to `modified` when no detected curve is supplied
    (matching ref:85-87)."""
    if method == "population":
        return lambda t: population_aif(t, dose)
    if method == "modified":
        return modified_aif
    if method == "auto":
        return auto_curve if auto_curve is not None else modified_aif
    raise ValueError(f"Unsupported AIF method: {method}")
