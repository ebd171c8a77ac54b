"""Offline inference on UNLABELED data (stf-predict).

Every other offline CLI drives `DatasetIndex`, which requires `labels/`
alongside `images/` (patients without masks are warn-and-skipped,
ref:my_dataset.py:124-126) — right for benchmarking against ground truth,
useless for the actual deployment case: NEW patients have no masks, and the
reference offers no way to segment them short of hand-editing its test.py.
stf-predict segments:

  * a BreaDM-style images tree:  <input>/<patient>/<SEQ>/<slice>.png
  * a single patient directory:  <input>/<SEQ>/<slice>.png
  * .npz volumes ("frames" uint8 [T, H, W] — the serving wire contract,
    serve/http.py): one file, or a directory of them

with the same restore + preprocessing + compiled-forward contract as
cli/test (checkpoint-sidecar self-configuration, eval-geometry resize or
`--tiled` native-resolution sliding windows, `--tta`, `--data-parallel`).
Outputs, per slice: `<output-dir>/<patient>/<slice>_mask.png` (binary
masks as 0/255 like the reference's renders; multiclass as raw class
indices) and `<slice>_overlay.png`.

Usage: python -m stf_unet_tpu.cli.predict --input <dir|file.npz>
       [--model stflstm] [--model-dir ./save_weights]
       [--output-dir ./output/predictions] [--tiled] [--tta] [--full-size]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg")


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="STF-UNet TPU inference on unlabeled data")
    p.add_argument("--input", type=str, required=True,
                   help="images tree (<patient>/<SEQ>/<slice>.png), a "
                        "single patient dir (<SEQ>/<slice>.png), an .npz "
                        "volume ('frames' uint8 [T, H, W]), or a directory "
                        "of .npz volumes")
    p.add_argument("--model", type=str, default="unet",
                   choices=["unet", "stflstm"])
    p.add_argument("--model-dir", type=str, default="./save_weights")
    p.add_argument("--output-dir", type=str, default="./output/predictions")
    p.add_argument("--use-subtraction", action="store_true")
    p.add_argument("--use-pk-maps", action="store_true",
                   help="model consumes PK parameter maps; needs --pk-maps")
    p.add_argument("--pk-maps", type=str, default="",
                   help="directory holding <patient>/{ktrans,ve,vp}.png "
                        "(stf-pk-maps output); missing maps zero-fill with "
                        "a warning (ref:my_dataset.py:206-224)")
    p.add_argument("--num-classes", type=int, default=None,
                   help="default: from checkpoint config")
    p.add_argument("--base-c", type=int, default=None,
                   help="default: from checkpoint config")
    p.add_argument("--crop-size", type=int, default=None,
                   help="eval short-edge size; default: from checkpoint "
                        "config")
    p.add_argument("--tiled", action="store_true",
                   help="segment at NATIVE resolution via sliding-window "
                        "tiles at the trained crop geometry")
    p.add_argument("--tile-overlap", type=float, default=0.5)
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation (4-orientation logit "
                        "ensemble)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard batches/tiles over N devices (0 = all)")
    p.add_argument("--max-batch", type=int, default=8,
                   help="batch same-geometry slices up to this size")
    p.add_argument("--full-size", action="store_true",
                   help="nearest-upsample masks/overlays back to the input "
                        "geometry (no-op with --tiled, which is native-"
                        "resolution already)")
    p.add_argument("--no-overlay", action="store_true",
                   help="write only the mask PNGs")
    p.add_argument("--save-probs", action="store_true",
                   help="also write per-class softmax probabilities as "
                        "<slice>_probs.npz ('probs' float16 [h, w, C] at "
                        "the eval geometry) — for downstream custom "
                        "thresholds / uncertainty analysis. Composes with "
                        "--data-parallel; unavailable with --tiled.")
    p.add_argument("--pk-fit", action="store_true",
                   help="also fit the extended Tofts model per voxel on "
                        "each slice's temporal stack (the cli/pipeline "
                        "analysis, labels-free): writes <slice>_pk.png "
                        "(Ktrans heat + predicted contour) and "
                        "<slice>_pk.npz (ktrans/ve/vp float32 [H, W])")
    p.add_argument("--pk-solver", type=str, default="lm",
                   choices=["lm", "adam"])
    p.add_argument("--pk-enhanced", action="store_true",
                   help="Otsu/bilateral enhanced PK preprocessing + map "
                        "postprocessing (the reference's "
                        "test_pk_fitting.py fork)")
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
# input scanning (the labels-free subset of data/index.py's scan)


def scan_unlabeled(input_path: str, sequence_types: Sequence[str]
                   ) -> List[Tuple[str, str, Optional[List[str]]]]:
    """-> [(patient_id, slice_name, frame_paths | None-for-npz)].

    Mirrors DatasetIndex's layout rules minus the mask requirement: every
    sequence dir must exist per patient (warn-and-skip otherwise,
    ref:my_dataset.py:69-77) and the same slice filename must exist in
    every sequence (warn-and-skip, ref:78-89)."""
    if os.path.isfile(input_path):
        if not input_path.endswith(".npz"):
            raise SystemExit(f"--input file must be .npz, got {input_path}")
        name = os.path.splitext(os.path.basename(input_path))[0]
        return [(name, name, None)]

    if not os.path.isdir(input_path):
        raise SystemExit(f"--input not found: {input_path}")

    entries = sorted(os.listdir(input_path))
    npzs = [e for e in entries if e.endswith(".npz")]
    if npzs:
        return [(os.path.splitext(e)[0], os.path.splitext(e)[0], None)
                for e in npzs]

    def patient_items(pid: str, pdir: str):
        missing = [s for s in sequence_types
                   if not os.path.isdir(os.path.join(pdir, s))]
        if missing:
            print(f"Warning: sequences {missing} not found for patient "
                  f"{pid} — skipping")
            return
        first = os.path.join(pdir, sequence_types[0])
        for nm in sorted(os.listdir(first)):
            if not nm.lower().endswith(IMG_EXTS):
                continue
            paths = [os.path.join(pdir, s, nm) for s in sequence_types]
            absent = [p for p in paths if not os.path.isfile(p)]
            if absent:
                print(f"Warning: slice {nm} missing in some sequences for "
                      f"patient {pid} — skipping")
                continue
            yield pid, os.path.splitext(nm)[0], paths

    items: List[Tuple[str, str, Optional[List[str]]]] = []
    # single-patient dir: the sequence dirs sit directly inside
    if all(os.path.isdir(os.path.join(input_path, s))
           for s in sequence_types):
        pid = os.path.basename(os.path.abspath(input_path))
        items = list(patient_items(pid, input_path))
    else:
        for pid in entries:
            pdir = os.path.join(input_path, pid)
            if os.path.isdir(pdir):
                items.extend(patient_items(pid, pdir))
    if not items:
        raise SystemExit(
            f"no predictable samples under {input_path}: expected "
            f"<patient>/<SEQ>/<slice>.png with sequences "
            f"{list(sequence_types)}, a single patient dir, or .npz "
            "volumes")
    return items


def _load_npz(path: str) -> np.ndarray:
    with np.load(path) as npz:
        if "frames" not in npz:
            raise SystemExit(f"{path}: expected 'frames' key "
                             "(uint8 [T, H, W], the serve/http.py wire "
                             "contract)")
        frames = np.asarray(npz["frames"])
    if frames.ndim != 3:
        raise SystemExit(f"{path}: 'frames' must be [T, H, W], got "
                         f"{frames.shape}")
    return frames.astype(np.uint8)


# ---------------------------------------------------------------------------


def _upsample_nearest(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    from stf_unet_tpu.ops.resize import _nearest_indices
    rows = _nearest_indices(mask.shape[0], h)
    cols = _nearest_indices(mask.shape[1], w)
    return mask[rows][:, cols]


def _write_outputs(mask: np.ndarray, raw_frame: np.ndarray, out_dir: str,
                   patient: str, name: str, num_classes: int,
                   overlay: bool) -> None:
    from PIL import Image

    from stf_unet_tpu.viz.overlay import save_overlay

    pdir = os.path.join(out_dir, patient)
    os.makedirs(pdir, exist_ok=True)
    # binary masks render 0/255 like the reference's saved predictions
    # (ref:test.py:168-176); multiclass keeps raw class indices.
    png = mask * 255 if num_classes == 2 else mask
    Image.fromarray(png.astype(np.uint8)).save(
        os.path.join(pdir, f"{name}_mask.png"))
    if overlay:
        # save_overlay names files {prefix}_{tag}.png; move to our contract
        src = save_overlay(mask > 0, raw_frame, pdir, "ov", prefix=patient)
        os.replace(src, os.path.join(pdir, f"{name}_overlay.png"))


def predict(args: argparse.Namespace) -> dict:
    from stf_unet_tpu.cli.common import restore_for_inference
    from stf_unet_tpu.core.cache import enable_compilation_cache
    from stf_unet_tpu.data.loader import decode_stack, load_pk_stack
    from stf_unet_tpu.data.transforms import eval_preprocess
    from stf_unet_tpu.serve.engine import InferenceEngine

    if args.use_pk_maps and not args.pk_maps:
        raise SystemExit(
            "--use-pk-maps needs --pk-maps <dir> holding "
            "<patient>/{ktrans,ve,vp}.png (generate with stf-pk-maps)")
    if args.save_probs and args.tiled:
        raise SystemExit("--save-probs is unavailable with --tiled (the "
                         "tile blend emits argmax masks only)")
    enable_compilation_cache()
    model, state, data_cfg, model_cfg, ckpt, kind, num_classes = (
        restore_for_inference(
            args.model, args.model_dir, root=".",
            use_pk_maps=args.use_pk_maps,
            use_subtraction=args.use_subtraction,
            num_classes=args.num_classes, base_c=args.base_c,
            crop_size=args.crop_size))
    print(f"model_path: {ckpt._path(kind)}")

    if args.tta:
        from stf_unet_tpu.ops.tta import FlipTTAModel
        model = FlipTTAModel(model)
        print("flip TTA: logits averaged over 4 orientations")

    mesh = None
    if args.data_parallel != 1:
        from stf_unet_tpu.core.mesh import create_mesh
        mesh = create_mesh(args.data_parallel)
        print(f"batches sharded over {mesh.size} devices")

    variables = state.variables()
    tiled = None
    engine = None
    if args.tiled:
        from stf_unet_tpu.serve.tiled import TiledPredictor
        tiled = TiledPredictor(model, variables, data_cfg.mean,
                               data_cfg.std, tile=data_cfg.crop_size,
                               overlap=args.tile_overlap, mesh=mesh)
        print(f"tiled native-resolution inference (tile={tiled.tile}, "
              f"stride={tiled.stride})")
    else:
        engine = InferenceEngine(model, variables, data_cfg.mean,
                                 data_cfg.std, max_batch=args.max_batch,
                                 mesh=mesh)

    pk_fit = None
    if args.pk_fit:
        from PIL import Image

        from stf_unet_tpu.core.config import PKConfig
        from stf_unet_tpu.viz.overlay import render_pk_overlay

        def pk_fit(frames, pred, pdir, name):
            """Tofts fit on the native temporal stack + combined render
            (the cli/pipeline analysis, reused labels-free)."""
            cfg = PKConfig(solver=args.pk_solver,
                           time_points=tuple(
                               float(i) for i in range(frames.shape[0])))
            if args.pk_enhanced:
                from stf_unet_tpu.pk.enhanced import fit_volume_enhanced
                maps3 = fit_volume_enhanced(frames, cfg)
            else:
                from stf_unet_tpu.pk.maps import fit_volume
                maps3 = fit_volume(frames, cfg)
            pred_native = (pred if pred.shape == frames.shape[1:]
                           else _upsample_nearest(pred, *frames.shape[1:]))
            Image.fromarray(render_pk_overlay(
                frames[0], maps3[0], pred_native)).save(
                os.path.join(pdir, f"{name}_pk.png"))
            np.savez_compressed(os.path.join(pdir, f"{name}_pk.npz"),
                                ktrans=maps3[0], ve=maps3[1], vp=maps3[2])

    items = scan_unlabeled(args.input, data_cfg.resolved_sequence_types)
    print(f"Found {len(items)} slices to segment")

    # same-geometry slices batch together on the eval-resize path
    pending: Dict[Tuple[int, ...], List] = {}
    written = 0
    patients = set()

    def flush(shape):
        nonlocal written
        batch = pending.pop(shape)
        images = np.stack([b[0] for b in batch])
        if args.save_probs:
            # the engine's own compiled forward (same program, same
            # bucketing) also emits float16 softmax probabilities
            masks, probs = engine.predict(images, return_probs=True)
        else:
            masks, probs = engine.predict(images), None
        for i, ((image, (h, w), meta), mask) in enumerate(zip(batch, masks)):
            patient, name, frames = meta
            mask = mask[:h, :w]  # drop the stride padding
            if args.full_size and mask.shape != frames.shape[1:]:
                mask = _upsample_nearest(mask, *frames.shape[1:])
                raw0 = frames[0]
            else:
                raw0 = image[0, :h, :w, 0]
            _write_outputs(mask, raw0, args.output_dir, patient, name,
                           num_classes, not args.no_overlay)
            if probs is not None:
                np.savez_compressed(
                    os.path.join(args.output_dir, patient,
                                 f"{name}_probs.npz"),
                    probs=probs[i, :h, :w])
            if pk_fit is not None:
                pk_fit(frames, mask,
                       os.path.join(args.output_dir, patient), name)
            written += 1

    for patient, name, paths in items:
        frames = _load_npz(args.input if os.path.isfile(args.input)
                           else os.path.join(args.input, f"{name}.npz")) \
            if paths is None else decode_stack(paths)
        patients.add(patient)
        pk = None
        if args.use_pk_maps:
            if paths is None:
                raise SystemExit("--use-pk-maps is not supported for .npz "
                                 "volumes (no patient directory to map)")
            pk = load_pk_stack(os.path.join(args.pk_maps, patient),
                               *frames.shape[1:], warn=True)
        if tiled is not None:
            img = frames if pk is None else np.concatenate([frames, pk], 0)
            mask = np.asarray(tiled.predict(img[..., None]))
            _write_outputs(mask, frames[0], args.output_dir, patient, name,
                           num_classes, not args.no_overlay)
            if pk_fit is not None:
                pk_fit(frames, mask,
                       os.path.join(args.output_dir, patient), name)
            written += 1
            continue
        dummy = np.zeros(frames.shape[1:], np.uint8)
        image, _ = eval_preprocess(frames, dummy, data_cfg, pk, raw=True)
        # Both models downsample 32x; pad non-multiple geometries up to
        # the stride with raw black and crop the mask back — the serving
        # path's convention (serve/http.py STRIDE), which keeps arbitrary
        # aspect ratios working where the reference torch UNet would
        # break on its own skip-concats.
        t, h, w, c = image.shape
        ph, pw = -h % 32, -w % 32
        if ph or pw:
            image = np.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        key = tuple(image.shape)
        pending.setdefault(key, []).append(
            (image, (h, w), (patient, name, frames)))
        if len(pending[key]) == args.max_batch:
            flush(key)
    for shape in list(pending):
        flush(shape)

    print(f"Wrote {written} masks"
          + ("" if args.no_overlay else " + overlays")
          + f" for {len(patients)} patients under {args.output_dir}")
    return {"patients": len(patients), "slices": written,
            "output_dir": args.output_dir}


def main(argv: Optional[Sequence[str]] = None) -> dict:
    return predict(parse_args(argv))


if __name__ == "__main__":
    main()
