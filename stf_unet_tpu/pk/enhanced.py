"""Enhanced PK preprocessing/postprocessing + AIF experiment harness
(ref:test_pk_fitting.py — the reference's enhanced fitter fork).

Capabilities reproduced:
  * enhanced_preprocess — Otsu threshold on the Gaussian-blurred max-
    projection, close/open morphology, per-frame bilateral filtering,
    mask-and-minmax normalization (ref:239-325).
  * postprocess_param_maps — Gaussian smoothing, per-parameter thresholds
    (Ktrans .01 / ve .05 / vp .005), tissue re-masking (ref:467-521).
  * compare_aif_methods — fit with all three AIF modes and render per-method
    maps plus pairwise difference maps (ref:709-887 test_aif_methods).

Host-side cv2/numpy image ops (they are one-shot per volume); the fitting
itself runs through the device-side solvers in pk/fit.py.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from stf_unet_tpu.core.config import PKConfig
from stf_unet_tpu.pk.aif import auto_detect_aif, make_aif
from stf_unet_tpu.pk.fit import fit_adam, fit_lm
from stf_unet_tpu.pk.maps import PARAM_NAMES, save_param_maps
from stf_unet_tpu.pk.tofts import ToftsQuadrature

# Per-parameter low-value thresholds (ref:test_pk_fitting.py:477).
POSTPROCESS_THRESHOLDS = {"ktrans": 0.01, "ve": 0.05, "vp": 0.005}


def enhanced_preprocess(images: np.ndarray, debug_output_dir: Optional[str] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """[T, H, W] (uint8 or [0,1] float) ->
    (processed [T, H, W] float32, tissue mask [H, W] bool) (ref:239-325)."""
    import cv2

    imgs = np.asarray(images, np.float32)
    if imgs.max() > 1.5:
        imgs = imgs / 255.0

    max_image = imgs.max(axis=0)
    max_u8 = (max_image * 255).astype(np.uint8)
    blurred = cv2.GaussianBlur(max_u8, (5, 5), 0)
    _, mask_u8 = cv2.threshold(blurred, 0, 255,
                               cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    # close (fill holes) then open (drop islands) — ref order (ref:270-273)
    kernel = np.ones((5, 5), np.uint8)
    mask_u8 = cv2.morphologyEx(mask_u8, cv2.MORPH_CLOSE, kernel)
    mask_u8 = cv2.morphologyEx(mask_u8, cv2.MORPH_OPEN, kernel)
    tissue_mask = mask_u8 > 0

    processed = []
    for t in range(imgs.shape[0]):
        filtered = cv2.bilateralFilter(imgs[t], 5, 75, 75)
        masked = filtered * (mask_u8 / 255.0)
        enhanced = cv2.normalize(masked, None, 0, 1, cv2.NORM_MINMAX)
        processed.append(enhanced.astype(np.float32))
        if debug_output_dir is not None:
            os.makedirs(debug_output_dir, exist_ok=True)
            for tag, arr in (("original", imgs[t]), ("filtered", filtered),
                             ("masked", masked), ("enhanced", enhanced)):
                cv2.imwrite(os.path.join(debug_output_dir, f"{tag}_t{t}.png"),
                            (arr * 255).astype(np.uint8))
    if debug_output_dir is not None:
        cv2.imwrite(os.path.join(debug_output_dir, "tissue_mask.png"), mask_u8)
        cv2.imwrite(os.path.join(debug_output_dir, "max_image.png"), max_u8)
    return np.stack(processed), tissue_mask


def postprocess_param_maps(param_maps: np.ndarray, tissue_mask: np.ndarray,
                           debug_output_dir: Optional[str] = None) -> np.ndarray:
    """Gaussian smooth -> per-parameter threshold -> tissue re-mask
    (ref:467-521)."""
    import cv2

    out = np.zeros_like(param_maps)
    for i, name in enumerate(PARAM_NAMES):
        smooth = cv2.GaussianBlur(param_maps[i], (5, 5), 0.5)
        thresholded = np.where(smooth < POSTPROCESS_THRESHOLDS[name], 0, smooth)
        out[i] = thresholded * tissue_mask
        if debug_output_dir is not None:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            os.makedirs(debug_output_dir, exist_ok=True)
            for tag, arr in (("original", param_maps[i]), ("smooth", smooth),
                             ("threshold", thresholded), ("final", out[i])):
                plt.figure(figsize=(8, 6))
                plt.imshow(arr, cmap="hot")
                plt.colorbar()
                plt.title(f"{tag} {name} map")
                plt.savefig(os.path.join(debug_output_dir,
                                         f"param_{i}_{tag}.png"))
                plt.close()
    return out


def fit_volume_enhanced(images: np.ndarray, cfg: PKConfig,
                        output_dir: Optional[str] = None,
                        debug_output_dir: Optional[str] = None,
                        mesh=None) -> np.ndarray:
    """Enhanced pipeline: enhanced preprocessing -> fit -> postprocessing
    (the test_pk_fitting.py fork's fit_volume_gpu)."""
    t_steps, h, w = images.shape
    processed, tissue_mask = enhanced_preprocess(images, debug_output_dir)

    aif = make_aif(cfg.aif_method, cfg.aif_dose)
    pos = None
    if cfg.aif_method == "auto":
        aif, pos = auto_detect_aif(processed, tissue_mask,
                                   np.asarray(cfg.time_points))
    quad = ToftsQuadrature.build(cfg.time_points, aif, cfg.dt)

    pixels = processed.transpose(1, 2, 0).reshape(-1, t_steps)
    flat_mask = tissue_mask.reshape(-1)
    valid = pixels[flat_mask]

    if debug_output_dir is not None:
        from stf_unet_tpu.pk.debug import fit_with_debug, render_aif_debug
        if pos is not None:
            render_aif_debug(processed, tissue_mask, cfg.time_points,
                             debug_output_dir, position=pos)
        fitted = fit_with_debug(valid, quad, cfg, debug_output_dir)
    else:
        solver = fit_lm if cfg.solver == "lm" else fit_adam
        fitted = solver(valid, quad, cfg, mesh=mesh)

    maps = np.zeros((3, h * w), np.float32)
    maps[:, flat_mask] = fitted.T
    maps = maps.reshape(3, h, w)
    maps = postprocess_param_maps(maps, tissue_mask, debug_output_dir)
    if output_dir is not None:
        save_param_maps(maps, output_dir)
    return maps


def compare_aif_methods(images: np.ndarray, cfg: PKConfig, output_dir: str,
                        mesh=None) -> Dict[str, np.ndarray]:
    """Fit the same volume with all three AIF methods and render per-method
    maps + pairwise difference maps (ref:709-887 test_aif_methods)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import dataclasses

    os.makedirs(output_dir, exist_ok=True)
    results: Dict[str, np.ndarray] = {}
    for method in ("population", "modified", "auto"):
        mcfg = dataclasses.replace(cfg, aif_method=method)
        results[method] = fit_volume_enhanced(
            images, mcfg, output_dir=os.path.join(output_dir, method),
            mesh=mesh)

    methods = list(results)
    for i, name in enumerate(PARAM_NAMES):
        fig, axs = plt.subplots(1, len(methods), figsize=(4 * len(methods), 4))
        for ax, m in zip(axs, methods):
            im = ax.imshow(results[m][i], cmap="hot")
            ax.set_title(f"{name} ({m})")
            ax.axis("off")
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.savefig(os.path.join(output_dir, f"compare_{name}.png"))
        plt.close(fig)

        for a in range(len(methods)):
            for b in range(a + 1, len(methods)):
                diff = results[methods[a]][i] - results[methods[b]][i]
                plt.figure(figsize=(5, 4))
                plt.imshow(diff, cmap="coolwarm")
                plt.colorbar()
                plt.title(f"{name}: {methods[a]} - {methods[b]}")
                plt.savefig(os.path.join(
                    output_dir, f"diff_{name}_{methods[a]}_{methods[b]}.png"))
                plt.close()
    return results


def test_single_patient(patient_path: str, output_dir: str,
                        cfg: Optional[PKConfig] = None) -> Optional[np.ndarray]:
    """Manual harness over one patient's SUB1..8 first slices
    (ref:658-706)."""
    from PIL import Image
    cfg = cfg or PKConfig()
    frames = []
    for i in range(1, 9):
        sub = os.path.join(patient_path, f"SUB{i}")
        if not os.path.isdir(sub):
            continue
        files = sorted(f for f in os.listdir(sub)
                       if f.endswith((".jpg", ".png")))
        if files:
            with Image.open(os.path.join(sub, files[0])) as im:
                frames.append(np.asarray(im.convert("L"), np.uint8))
    if not frames:
        print(f"no SUB frames under {patient_path}")
        return None
    return fit_volume_enhanced(np.stack(frames), cfg, output_dir,
                               debug_output_dir=os.path.join(output_dir, "debug"))
