"""PK fit debug/diagnostic renders (ref:pk_fitting.py:271-287,357-366;
ref:test_pk_fitting.py:204-231 get_auto_detected_aif artifacts).

Artifact set (written into a debug output directory):
  * sample_time_curves.png  — 10 random tissue-voxel signal curves
  * training_loss.png       — Adam fit loss-vs-epoch curve
  * detected_aif_curve.png  — the auto-detected AIF signal curve
  * aif_location.png        — AIF voxel circled on the max-enhancement image
  * max_time_derivative.png — masked peak temporal-derivative map

All are one-shot host-side matplotlib/cv2 renders; the fit itself stays on
device.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_sample_time_curves(valid_pixels: np.ndarray, time_points,
                            output_dir: str, num_samples: int = 10,
                            seed: int = 0) -> str:
    """Random tissue-voxel signal curves (ref:pk_fitting.py:271-287)."""
    plt = _plt()
    os.makedirs(output_dir, exist_ok=True)
    n = min(num_samples, valid_pixels.shape[0])
    idx = np.random.default_rng(seed).permutation(valid_pixels.shape[0])[:n]
    t = np.asarray(time_points)
    plt.figure(figsize=(10, 6))
    for i, j in enumerate(idx):
        plt.plot(t, np.asarray(valid_pixels[j]), marker="o",
                 label=f"Pixel {i + 1}")
    plt.xlabel("Time (min)")
    plt.ylabel("Signal Intensity")
    plt.title("Sample Pixel Time Curves")
    plt.legend()
    plt.grid(True)
    path = os.path.join(output_dir, "sample_time_curves.png")
    plt.savefig(path)
    plt.close()
    return path


def plot_loss_curve(losses: np.ndarray, output_dir: str) -> str:
    """Fit loss vs epoch (ref:pk_fitting.py:357-366)."""
    plt = _plt()
    os.makedirs(output_dir, exist_ok=True)
    plt.figure(figsize=(10, 6))
    plt.plot(np.asarray(losses))
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.title("Training Loss")
    plt.grid(True)
    path = os.path.join(output_dir, "training_loss.png")
    plt.savefig(path)
    plt.close()
    return path


def fit_with_debug(valid: np.ndarray, quad, cfg, output_dir: str
                   ) -> np.ndarray:
    """Debug-mode solver dispatch shared by fit_volume and
    fit_volume_enhanced: sample voxel curves always; Adam additionally
    renders its loss curve (ref:pk_fitting.py:271-287,357-366)."""
    from stf_unet_tpu.pk.fit import fit_adam_debug, fit_lm

    plot_sample_time_curves(valid, cfg.time_points, output_dir)
    if cfg.solver == "adam":
        fitted, losses = fit_adam_debug(valid, quad, cfg)
        plot_loss_curve(losses, output_dir)
        return fitted
    return fit_lm(valid, quad, cfg)


def render_aif_debug(images: np.ndarray, tissue_mask: np.ndarray,
                     time_points, output_dir: str,
                     position=None) -> dict:
    """Auto-AIF diagnostics (ref:test_pk_fitting.py:204-231): detected
    curve, location marker on the max-enhancement image, and the masked
    peak temporal-derivative map the detector maximizes. `position` is the
    (row, col) voxel auto_detect_aif picked — pass it so the renders mark
    the voxel that was actually used for fitting."""
    import cv2

    plt = _plt()
    os.makedirs(output_dir, exist_ok=True)
    imgs = np.asarray(images, np.float32)
    if imgs.max() > 1.5:
        imgs = imgs / 255.0
    mask = np.asarray(tissue_mask)

    diff = np.diff(imgs, axis=0)
    peak = diff.max(axis=0) * mask.astype(imgs.dtype)
    if position is None:
        position = np.unravel_index(int(np.argmax(peak)), peak.shape)
    x, y = int(position[0]), int(position[1])
    curve = imgs[:, x, y]

    plt.figure(figsize=(10, 6))
    plt.plot(np.asarray(time_points), curve, "ro-", linewidth=2)
    plt.xlabel("Time (min)")
    plt.ylabel("Signal Intensity")
    plt.title("Detected AIF Curve")
    plt.grid(True)
    curve_path = os.path.join(output_dir, "detected_aif_curve.png")
    plt.savefig(curve_path)
    plt.close()

    max_image = (imgs.max(axis=0) * 255).astype(np.uint8)
    marker = max_image.copy()
    cv2.circle(marker, (int(y), int(x)), 5, 255, 2)
    loc_path = os.path.join(output_dir, "aif_location.png")
    cv2.imwrite(loc_path, marker)

    plt.figure(figsize=(8, 6))
    plt.imshow(peak, cmap="hot")
    plt.colorbar(label="Max Time Derivative")
    plt.title("Maximum Time Derivative Map")
    deriv_path = os.path.join(output_dir, "max_time_derivative.png")
    plt.savefig(deriv_path)
    plt.close()

    return {"position": (int(x), int(y)), "curve": curve_path,
            "location": loc_path, "derivative_map": deriv_path}
