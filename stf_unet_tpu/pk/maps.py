"""PK parameter-map generation over the BreaDM dataset
(ref:pk_fitting.py:233-420 saving, :605-730 dataset drivers).

Writes `<root>/seg/<split>/pk_maps/<patient>/{ktrans,ve,vp}.png` (+ raw .npy,
heatmaps, combined RGB) — the exact artifact contract DriveDataset and the
index scanner consume (ref:my_dataset.py:198-227).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import numpy as np
from PIL import Image

from stf_unet_tpu.core.config import PKConfig
from stf_unet_tpu.pk.aif import auto_detect_aif, make_aif
from stf_unet_tpu.pk.fit import fit_adam, fit_lm, preprocess_images
from stf_unet_tpu.pk.tofts import ToftsQuadrature

PARAM_NAMES = ("ktrans", "ve", "vp")


def fit_volume(images: np.ndarray, cfg: PKConfig,
               output_dir: Optional[str] = None,
               debug_output_dir: Optional[str] = None,
               mesh=None) -> np.ndarray:
    """[T, H, W] signal volume -> [3, H, W] (Ktrans, ve, vp) maps
    (ref:fit_volume_gpu, pk_fitting.py:233-420). debug_output_dir enables
    the reference's diagnostic renders: sample voxel curves, Adam loss
    curve, auto-AIF location/curve/derivative maps
    (ref:271-287,357-366; ref:test_pk_fitting.py:204-231).

    mesh: optional 1-D device mesh — shards the tissue-voxel axis of the
    solver across chips (identical results; the debug path stays
    single-device)."""
    t_steps, height, width = images.shape
    if t_steps != len(cfg.time_points):
        # Missing SUBk sequences were warn-and-skipped upstream
        # (ref:pk_fitting.py:626-636); fit over the frames that exist.
        import dataclasses
        cfg = dataclasses.replace(
            cfg, time_points=tuple(float(i) for i in range(t_steps)))
        print(f"note: {t_steps} frames present; time grid adjusted")
    t0 = time.time()
    imgs, tissue_mask = preprocess_images(images, cfg)
    mask_np = np.asarray(tissue_mask)

    pixels = np.asarray(imgs).transpose(1, 2, 0).reshape(-1, t_steps)
    valid = pixels[mask_np.reshape(-1)]
    print(f"total pixels: {height * width}, valid pixels: {valid.shape[0]} "
          f"(preprocess {time.time() - t0:.2f}s)")

    aif = make_aif(cfg.aif_method, cfg.aif_dose)
    pos = None
    if cfg.aif_method == "auto":
        aif, pos = auto_detect_aif(np.asarray(imgs), mask_np,
                                   np.asarray(cfg.time_points))
        print(f"auto AIF voxel at {pos}")
    quad = ToftsQuadrature.build(cfg.time_points, aif, cfg.dt)

    t0 = time.time()
    if debug_output_dir is not None:
        from stf_unet_tpu.pk.debug import fit_with_debug, render_aif_debug
        if pos is not None:
            render_aif_debug(np.asarray(imgs), mask_np, cfg.time_points,
                             debug_output_dir, position=pos)
        fitted = fit_with_debug(valid, quad, cfg, debug_output_dir)
    else:
        solver = fit_lm if cfg.solver == "lm" else fit_adam
        fitted = solver(valid, quad, cfg, mesh=mesh)  # [Nvalid, 3]
    print(f"fit ({cfg.solver}) done in {time.time() - t0:.2f}s")

    param_maps = np.zeros((3, height * width), np.float32)
    param_maps[:, mask_np.reshape(-1)] = fitted.T
    param_maps = param_maps.reshape(3, height, width)

    if output_dir is not None:
        save_param_maps(param_maps, output_dir)
    return param_maps


def _percentile_normalize(param_map: np.ndarray) -> np.ndarray:
    """Percentile-1/99 clip + [0,255] scale (ref:393-400)."""
    if np.max(param_map) > 0:
        positive = param_map[param_map > 0]
        p_min, p_max = np.percentile(positive, [1, 99])
        if p_max <= p_min:
            p_max = p_min + 1e-6
        norm = np.clip(param_map, p_min, p_max)
        return ((norm - p_min) / (p_max - p_min) * 255).astype(np.uint8)
    return np.zeros_like(param_map, dtype=np.uint8)


def save_param_maps(param_maps: np.ndarray, output_dir: str,
                    heatmaps: bool = False) -> None:
    """PNG + raw .npy per parameter, plus the combined RGB map
    (ref:380-418, 568-602)."""
    os.makedirs(output_dir, exist_ok=True)
    for i, name in enumerate(PARAM_NAMES):
        Image.fromarray(_percentile_normalize(param_maps[i])).save(
            os.path.join(output_dir, f"{name}.png"))
        np.save(os.path.join(output_dir, f"{name}_raw.npy"), param_maps[i])
        if heatmaps:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            cmaps = {"ktrans": "hot", "ve": "cool", "vp": "spring"}
            plt.figure(figsize=(8, 6))
            plt.imshow(param_maps[i], cmap=cmaps[name])
            plt.colorbar(label=name)
            plt.title(f"{name.upper()} Parameter Map")
            plt.savefig(os.path.join(output_dir, f"{name}_heatmap.png"))
            plt.close()

    combined = np.zeros(param_maps.shape[1:] + (3,), np.float32)
    for i in range(3):
        combined[..., i] = _percentile_normalize(param_maps[i]) / 255.0
    Image.fromarray((combined * 255).astype(np.uint8)).save(
        os.path.join(output_dir, "combined_map.png"))


def _load_patient_frames(patient_path: str) -> Optional[np.ndarray]:
    """First slice of each SUB1..8 sequence -> [T<=8, H, W] uint8
    (ref:605-662 loading), warn-and-skip on missing sequences."""
    frames = []
    for i in range(1, 9):
        sub = os.path.join(patient_path, f"SUB{i}")
        if not os.path.exists(sub):
            print(f"warning: {sub} missing")
            continue
        files = sorted(f for f in os.listdir(sub)
                       if f.endswith((".jpg", ".png")))
        if not files:
            print(f"warning: no images in {sub}")
            continue
        with Image.open(os.path.join(sub, files[0])) as im:
            frames.append(np.asarray(im.convert("L"), np.uint8))
    if not frames:
        print(f"error: no valid subtraction images in {patient_path}")
        return None
    return np.stack(frames)


def process_patient(patient_path: str, output_base_dir: str,
                    cfg: Optional[PKConfig] = None,
                    enhanced: bool = False,
                    debug: bool = False,
                    mesh=None) -> Optional[np.ndarray]:
    """Fit the first slice of each SUB1..8 sequence for one patient
    (ref:605-670). enhanced=True routes through the test_pk_fitting.py
    fork's Otsu/bilateral preprocessing + param-map postprocessing;
    debug=True writes the diagnostic render set under <patient>/debug/."""
    cfg = cfg or PKConfig()
    patient_id = os.path.basename(patient_path)
    print(f"processing patient: {patient_id}")
    output_dir = os.path.join(output_base_dir, patient_id)
    debug_dir = os.path.join(output_dir, "debug") if debug else None

    frames = _load_patient_frames(patient_path)
    if frames is None:
        return None

    if enhanced:
        from stf_unet_tpu.pk.enhanced import fit_volume_enhanced
        maps = fit_volume_enhanced(frames, cfg, output_dir,
                                   debug_output_dir=debug_dir, mesh=mesh)
    else:
        maps = fit_volume(frames, cfg, output_dir,
                          debug_output_dir=debug_dir, mesh=mesh)
    print(f"PK maps for patient {patient_id} saved to {output_dir}")
    return maps


def process_dataset(dataset_path: str, split: str = "training",
                    cfg: Optional[PKConfig] = None,
                    enhanced: bool = False, debug: bool = False,
                    mesh=None, num_shards: int = 1,
                    shard_index: int = 0) -> None:
    """All patients of one split (ref:673-696).

    num_shards/shard_index: patient-level work sharding for fleet runs —
    shard i fits patients i, i+N, i+2N, ... so N independent machines (each
    with its own chip/mesh) cover a dataset with no coordination; the
    per-patient artifact contract makes the outputs trivially disjoint.
    """
    if not (0 <= shard_index < num_shards):
        raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
    images_dir = os.path.join(dataset_path, "seg", split, "images")
    output_base = os.path.join(dataset_path, "seg", split, "pk_maps")
    os.makedirs(output_base, exist_ok=True)
    patients = sorted(p for p in os.listdir(images_dir)
                      if os.path.isdir(os.path.join(images_dir, p)))
    if num_shards > 1:
        total = len(patients)
        patients = patients[shard_index::num_shards]
        print(f"found {total} patients; shard {shard_index}/{num_shards} "
              f"takes {len(patients)}")
    else:
        print(f"found {len(patients)} patients")
    done = 0
    for patient in patients:
        maps = process_patient(os.path.join(images_dir, patient), output_base,
                               cfg, enhanced=enhanced, debug=debug, mesh=mesh)
        done += maps is not None
    print(f"{split}: PK maps written for {done}/{len(patients)} patients")
    if patients and done == 0:
        # A silent all-skip (e.g. a tree with no SUB1..8 subtraction
        # sequences — PK fitting reads those only, ref:pk_fitting.py:625-662)
        # would later empty any --use-pk-maps dataset scan.
        print(f"warning: no PK maps generated for split '{split}' — "
              "PK fitting reads the SUB1..8 subtraction sequences")


def generate_pk_maps_for_dataset(dataset_path: str,
                                 splits: Optional[Sequence[str]] = None,
                                 cfg: Optional[PKConfig] = None,
                                 enhanced: bool = False,
                                 debug: bool = False,
                                 mesh=None, num_shards: int = 1,
                                 shard_index: int = 0
                                 ) -> Dict[str, str]:
    """All splits (ref:699-722); hooked into training via
    --generate-pk-maps (ref:train.py:165-169)."""
    splits = splits or ["training", "val", "test"]
    out = {}
    for split in splits:
        print(f"generating PK maps for {split}...")
        process_dataset(dataset_path, split, cfg, enhanced=enhanced,
                        debug=debug, mesh=mesh, num_shards=num_shards,
                        shard_index=shard_index)
        out[split] = os.path.join(dataset_path, "seg", split, "pk_maps")
    return out


def compare_aif_for_dataset(dataset_path: str,
                            splits: Optional[Sequence[str]] = None,
                            cfg: Optional[PKConfig] = None,
                            mesh=None, num_shards: int = 1,
                            shard_index: int = 0) -> Dict[str, str]:
    """Per-patient AIF-method comparison artifacts
    (ref:test_pk_fitting.py:709-887 test_aif_methods): fits each patient
    volume with population/modified/auto AIFs and renders per-method maps
    plus pairwise difference maps under
    `<root>/seg/<split>/pk_aif_comparison/<patient>/`."""
    from stf_unet_tpu.pk.enhanced import compare_aif_methods
    cfg = cfg or PKConfig()
    if not (0 <= shard_index < num_shards):
        raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
    splits = splits or ["training", "val", "test"]
    out = {}
    for split in splits:
        images_dir = os.path.join(dataset_path, "seg", split, "images")
        output_base = os.path.join(dataset_path, "seg", split,
                                   "pk_aif_comparison")
        patients = sorted(p for p in os.listdir(images_dir)
                          if os.path.isdir(os.path.join(images_dir, p)))
        if num_shards > 1:
            patients = patients[shard_index::num_shards]
        print(f"{split}: AIF comparison over {len(patients)} patients"
              + (f" (shard {shard_index}/{num_shards})"
                 if num_shards > 1 else ""))
        for patient in patients:
            frames = _load_patient_frames(os.path.join(images_dir, patient))
            if frames is None:
                continue
            compare_aif_methods(frames, cfg,
                                os.path.join(output_base, patient),
                                mesh=mesh)
            print(f"AIF comparison for {patient} -> "
                  f"{os.path.join(output_base, patient)}")
        out[split] = output_base
    return out


def main(argv=None):
    import argparse

    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Extended-Tofts PK map generation")
    ap.add_argument("dataset_path")
    ap.add_argument("--splits", type=str, default="training,val,test")
    ap.add_argument("--aif-method", type=str, default="population",
                    choices=["population", "modified", "auto"])
    ap.add_argument("--solver", type=str, default="lm",
                    choices=["lm", "adam"])
    ap.add_argument("--enhanced", action="store_true",
                    help="Otsu/bilateral preprocessing + param-map "
                         "postprocessing (ref:test_pk_fitting.py fork)")
    ap.add_argument("--compare-aif", action="store_true",
                    help="render per-patient AIF-method comparison maps "
                         "instead of pk_maps (ref:test_aif_methods)")
    ap.add_argument("--debug", action="store_true",
                    help="write diagnostic renders (sample curves, loss "
                         "curve, AIF maps) under <patient>/debug/")
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="shard the voxel axis of the solver over N devices "
                         "(0 = all visible devices, 1 = single-device)")
    ap.add_argument("--num-shards", type=int, default=1,
                    help="patient-level fleet sharding: run N independent "
                         "processes/machines, one per shard")
    ap.add_argument("--shard-index", type=int, default=0,
                    help="which patient shard this process fits")
    args = ap.parse_args(argv)
    cfg = PKConfig(aif_method=args.aif_method, solver=args.solver)
    mesh = None
    if args.data_parallel != 1:
        from stf_unet_tpu.core.mesh import create_mesh
        mesh = create_mesh(args.data_parallel)
        print(f"voxel-sharded fitting over {mesh.size} devices")
    if args.compare_aif:
        compare_aif_for_dataset(args.dataset_path, args.splits.split(","),
                                cfg, mesh=mesh,
                                num_shards=args.num_shards,
                                shard_index=args.shard_index)
    else:
        generate_pk_maps_for_dataset(args.dataset_path,
                                     args.splits.split(","), cfg,
                                     enhanced=args.enhanced,
                                     debug=args.debug, mesh=mesh,
                                     num_shards=args.num_shards,
                                     shard_index=args.shard_index)


if __name__ == "__main__":
    main()
