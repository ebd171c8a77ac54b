"""Flip test-time augmentation (TTA) for segmentation inference.

Average the logits over {identity, hflip, vflip, hvflip} of the input,
un-flipping each logit map before the mean — a standard segmentation
ensemble trick (no reference counterpart; the reference predicts one
orientation, ref:test.py:158-162). Costs k forwards for k orientations;
everything stays inside one jitted program so XLA schedules the k
forwards back-to-back with no host round-trips.

Works for every model in the registry because all preprocessed layouts
put (H, W) at axes (-3, -2): UNet flat-channels [B, H, W, T], flagship
time-sequence [B, T, H, W, 1], average-frame [B, H, W, 1] — and logits
come back [B, H, W, C]. Flip equivariance of the conv stack makes the
orientations consistent estimators; exact equivariance is not required
(it is an ensemble, not an identity).

Usage (the cli/test --tta flag does this):
    model = FlipTTAModel(model)
    evaluate(state, model, ...)   # or engine/tiled — same .apply contract
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp

_MODES: Tuple[str, ...] = ("h", "v", "hv")


def _flip(a: jnp.ndarray, mode: str) -> jnp.ndarray:
    axes = []
    if "v" in mode:
        axes.append(a.ndim - 3)  # H
    if "h" in mode:
        axes.append(a.ndim - 2)  # W
    return jnp.flip(a, axes) if axes else a


class FlipTTAModel:
    """Drop-in model wrapper: `.apply` returns flip-ensembled logits
    ({"out": mean over orientations}); everything else delegates."""

    def __init__(self, model, modes: Sequence[str] = _MODES):
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_modes", tuple(modes))

    def apply(self, variables, x, *args, **kwargs) -> Any:
        def one(mode: str) -> jnp.ndarray:
            out = self._model.apply(variables, _flip(x, mode),
                                    *args, **kwargs)
            logits = out["out"] if isinstance(out, dict) else out
            return _flip(logits, mode)

        acc = one("")
        for mode in self._modes:
            acc = acc + one(mode)
        return {"out": acc / (1 + len(self._modes))}

    def __getattr__(self, name):
        return getattr(self._model, name)
