"""Thresholded binary IoU/Dice (ref:metrics.py:7-40,
ref:train_utils/visualize.py:9-50)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def iou_score(output, target, smooth: float = 1e-5) -> Tuple[float, float]:
    """sigmoid -> 0.5 threshold -> (IoU, Dice) (ref:metrics.py:7-40).

    Accepts numpy arrays or anything np.asarray can consume; if `output`
    looks like logits (outside [0,1]) a sigmoid is applied, matching the
    reference's torch.sigmoid on raw model output.
    """
    output = np.asarray(output, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    if output.min() < 0.0 or output.max() > 1.0:
        output = 1.0 / (1.0 + np.exp(-output))
    o = output > 0.5
    t = target > 0.5
    inter = np.logical_and(o, t).sum()
    union = np.logical_or(o, t).sum()
    iou = (inter + smooth) / (union + smooth)
    dice = (2.0 * inter + smooth) / (o.sum() + t.sum() + smooth)
    return float(iou), float(dice)


def compute_metrics(pred, target, smooth: float = 1e-5) -> Tuple[float, float]:
    """Per-sample (dice, iou) on already-thresholded masks
    (ref:train_utils/visualize.py:9-50). Returns (dice, iou) in the
    reference's order."""
    pred = np.asarray(pred, dtype=np.float64) > 0.5
    target = np.asarray(target, dtype=np.float64) > 0.5
    inter = np.logical_and(pred, target).sum()
    union = np.logical_or(pred, target).sum()
    iou = (inter + smooth) / (union + smooth)
    dice = (2.0 * inter + smooth) / (pred.sum() + target.sum() + smooth)
    return float(dice), float(iou)
