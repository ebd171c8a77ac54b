"""Confusion-matrix metrics (ref:train_utils/train_and_eval.py:25-70,338-374).

Functional running state: an [n, n] int array updated inside jit. Under a
data-parallel mesh the scatter-add reduces globally (GSPMD), replacing the
reference's optional dist.all_reduce (ref:51-57).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def confusion_init(num_classes: int) -> jax.Array:
    # int32 holds ~2e9 pixel counts — ample for any BreaDM-scale eval —
    # and avoids needing jax_enable_x64.
    return jnp.zeros((num_classes, num_classes), dtype=jnp.int32)


# f32 one-hot contraction counts are exact only while a single matmul's
# per-cell count stays below 2^24 (f32 integer-exactness bound); chunk the
# pixel axis below this so e.g. batch-16 eval at 1024^2 (16.8M px) cannot
# silently lose counts. The pixel count is static under jit, so chunking
# is a trace-time decision with zero cost for normal shapes.
_EXACT_F32_PIXELS = 1 << 23


def confusion_update(mat: jax.Array, target: jax.Array, pred: jax.Array) -> jax.Array:
    """mat += bincount(n*a + b) over pixels with 0 <= a < n (ref:30-39).

    The `0 <= a < n` guard is what drops the 255 padding label.

    Computed as a one-hot cross matmul instead of a scatter-add: per-pixel
    scatters lower to the same catastrophic TPU path as gathers (the CE
    take_along_axis measured 11.8 ms/step before its one-hot rewrite),
    while [P, n]^T @ [P, n] rides the MXU. f32 partial counts are exact
    per chunk (pixel count bounded < 2^24 by _EXACT_F32_PIXELS chunking);
    accumulation between chunks stays int32.
    """
    n = mat.shape[0]
    a = target.reshape(-1)
    b = pred.reshape(-1)

    def one_chunk(a_c, b_c):
        valid = (a_c >= 0) & (a_c < n)
        oh_a = jax.nn.one_hot(jnp.where(valid, a_c, 0), n, dtype=jnp.float32)
        oh_a = oh_a * valid[:, None].astype(jnp.float32)
        oh_b = jax.nn.one_hot(b_c, n, dtype=jnp.float32)  # OOB pred -> zero row
        counts = jnp.einsum("pc,pd->cd", oh_a, oh_b,
                            preferred_element_type=jnp.float32)
        return jnp.round(counts).astype(mat.dtype)

    for start in range(0, max(a.shape[0], 1), _EXACT_F32_PIXELS):
        mat = mat + one_chunk(a[start:start + _EXACT_F32_PIXELS],
                              b[start:start + _EXACT_F32_PIXELS])
    return mat


def confusion_compute(mat: jax.Array):
    """-> (global acc, per-class acc, per-class IoU) (ref:44-49)."""
    h = mat.astype(jnp.float64)
    diag = jnp.diagonal(h)
    acc_global = diag.sum() / h.sum()
    acc = diag / h.sum(axis=1)
    iu = diag / (h.sum(axis=1) + h.sum(axis=0) - diag)
    return acc_global, acc, iu


def confusion_report(mat: np.ndarray, eps: float = 1e-6) -> Dict:
    """Post-hoc numpy precision/recall/IoU per class + means (ref:338-366)."""
    total = mat.sum()
    global_accuracy = float(np.diag(mat).sum() / total) if total != 0 else 0.0
    class_metrics: List[Dict[str, float]] = []
    for c in range(mat.shape[0]):
        tp = mat[c, c]
        fp = mat[:, c].sum() - tp
        fn = mat[c, :].sum() - tp
        class_metrics.append({
            "precision": float(tp / (tp + fp + eps)),
            "recall": float(tp / (tp + fn + eps)),
            "iou": float(tp / (tp + fp + fn + eps)),
        })
    mean_metrics = {
        "mprecision": float(np.mean([m["precision"] for m in class_metrics])),
        "mrecall": float(np.mean([m["recall"] for m in class_metrics])),
        "miou": float(np.mean([m["iou"] for m in class_metrics])),
    }
    return {
        "global_accuracy": global_accuracy,
        "class_metrics": class_metrics,
        "mean_metrics": mean_metrics,
    }


def format_confusion(mat: np.ndarray) -> str:
    """Pretty string matching ref ConfusionMatrix.__str__ (ref:59-70)."""
    h = mat.astype(np.float64)
    diag = np.diag(h)
    acc_global = diag.sum() / max(h.sum(), 1e-12)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = diag / h.sum(axis=1)
        iu = diag / (h.sum(axis=1) + h.sum(axis=0) - diag)
    return (
        "global correct: {:.1f}\n"
        "average row correct: {}\n"
        "IoU: {}\n"
        "mean IoU: {:.1f}"
    ).format(
        acc_global * 100,
        ["{:.1f}".format(i) for i in (acc * 100).tolist()],
        ["{:.1f}".format(i) for i in (iu * 100).tolist()],
        np.nanmean(iu) * 100,
    )
