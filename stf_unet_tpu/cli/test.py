"""Standalone inference entry point (ref:test.py:137-196).

Usage: python -m stf_unet_tpu.cli.test --model unet --model-dir ./save_weights
       --root <BreaDM root> [--output-dir ./output/test_results]
       [--use-subtraction] [--use-pk-maps] [--num-classes 2]

Loads the best checkpoint, runs test-set inference with overlay renders,
then prints the full eval metrics. Prediction semantics are unified on
argmax (SURVEY §3.3 — the reference's sigmoid/channel-0/inversion trio is
documented as inconsistent); `--pred-mode sigmoid` reproduces the
reference's binary path (sigmoid > 0.5 on channel 0, ref:test.py:161-172)
for compatibility. Eval metrics are argmax-based in both modes, exactly as
the reference's evaluate() is (ref:train_and_eval.py:331).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate
from stf_unet_tpu.viz.overlay import save_overlay


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="STF-UNet TPU inference")
    p.add_argument("--model", type=str, default="unet",
                   choices=["unet", "stflstm"])
    p.add_argument("--model-dir", type=str, default="./save_weights")
    p.add_argument("--root", type=str, default="./BreaDM")
    p.add_argument("--output-dir", type=str, default="./output/test_results")
    p.add_argument("--use-subtraction", action="store_true")
    p.add_argument("--use-pk-maps", action="store_true")
    # Architecture/data flags default to None = "recover from the
    # checkpoint's saved training config" (meta.json sidecar), falling back
    # to the reference defaults — so a checkpoint trained with any width /
    # crop / class count tests out of the box.
    p.add_argument("--num-classes", type=int, default=None,
                   help="TOTAL classes incl. background (ref default 2); "
                        "default: from checkpoint config")
    p.add_argument("--base-c", type=int, default=None,
                   help="model width; default: from checkpoint config")
    p.add_argument("--crop-size", type=int, default=None,
                   help="eval short-edge size; default: from checkpoint "
                        "config")
    p.add_argument("--mask-format", type=str, default=None,
                   choices=["binary", "index"],
                   help="mask pixel encoding: binary (//255, reference "
                        "parity) or index (pixels hold class indices — "
                        "multiclass datasets); default: from checkpoint "
                        "config")
    p.add_argument("--pred-mode", type=str, default="argmax",
                   choices=["argmax", "sigmoid"],
                   help="prediction semantics for saved overlays: argmax "
                        "(unified default) or the reference binary path "
                        "sigmoid(logits[...,0]) > 0.5 (ref:test.py:161-172)")
    p.add_argument("--tiled", action="store_true",
                   help="segment at NATIVE resolution via sliding-window "
                        "tiles at the trained crop geometry (serve/tiled), "
                        "instead of the reference's lossy resize-to-crop "
                        "(ref:train.py:70-74); metrics compare against the "
                        "native-resolution masks")
    p.add_argument("--tile-overlap", type=float, default=0.5,
                   help="tile overlap fraction for --tiled (default 0.5)")
    p.add_argument("--batch-size", type=int, default=1,
                   help="eval batch size (shape-bucketed batching; the "
                        "reference evaluates at 1, ref:train.py:206-211)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each eval batch over N devices "
                        "(0 = all visible; identical metrics)")
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation: average logits over "
                        "{id, hflip, vflip, hvflip} (4 forwards/sample; "
                        "ops/tta.py — composes with --tiled and "
                        "--data-parallel)")
    p.add_argument("--data-pack", type=str, default="",
                   help="dataset pack root (stf-pack): serve pre-decoded "
                        "samples by memmap instead of decoding images")
    p.add_argument("--per-patient", action="store_true",
                   help="aggregate metrics per patient (mean/std/median "
                        "dice ACROSS patients — the clinical reporting "
                        "unit; the reference pools all test pixels "
                        "globally). Requires --batch-size 1.")
    p.add_argument("--surface-metrics", action="store_true",
                   help="report boundary metrics (95th-percentile "
                        "Hausdorff distance + average symmetric surface "
                        "distance, pixel units) per patient; implies "
                        "--per-patient")
    p.add_argument("--threshold-sweep", action="store_true",
                   help="binary only: dice/IoU/precision/recall at "
                        "foreground-probability thresholds 0.05..0.95 "
                        "plus ROC/PR AUC — the reference hardcodes 0.5 "
                        "(ref:test.py:168-172) and never evaluates the "
                        "operating point")
    return p.parse_args(argv)


def predict_mask(logits: np.ndarray, mode: str = "argmax") -> np.ndarray:
    """[H, W, C] logits -> [H, W] int mask. 'argmax' is the unified
    default; 'sigmoid' reproduces the reference binary path
    sigmoid(logits) > 0.5 on channel 0 (ref:test.py:161-172)."""
    if mode == "sigmoid":
        probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float32)))
        return (probs[..., 0] > 0.5).astype(np.int32)
    return np.argmax(logits, axis=-1)


def test(args: argparse.Namespace) -> dict:
    from stf_unet_tpu.cli.common import restore_for_inference
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    # Recover the training config from the checkpoint sidecar so
    # architecture-affecting values (width, classes, crop, mask encoding)
    # default to what the checkpoint was trained with; explicit flags win.
    model, state, data_cfg, model_cfg, ckpt, kind, num_classes = (
        restore_for_inference(
            args.model, args.model_dir, root=args.root,
            use_pk_maps=args.use_pk_maps,
            use_subtraction=args.use_subtraction,
            num_classes=args.num_classes, base_c=args.base_c,
            crop_size=args.crop_size, mask_format=args.mask_format))
    seq_types = data_cfg.resolved_sequence_types
    print(f"model_path: {ckpt._path(kind)}")

    test_index = DatasetIndex(args.root, "test", seq_types,
                              use_pk_maps=args.use_pk_maps)
    pack = None
    if args.data_pack:
        from stf_unet_tpu.data.pack import open_split_pack
        pack = open_split_pack(args.data_pack, "test")
        pack.validate(test_index, mask_format=data_cfg.mask_format,
                      use_pk_maps=args.use_pk_maps)
        print(f"dataset pack [test]: {len(pack)} samples (decode-free)")

    if args.tta:
        from stf_unet_tpu.ops.tta import FlipTTAModel
        model = FlipTTAModel(model)
        print("flip TTA: logits averaged over 4 orientations")

    mesh = None
    if args.data_parallel != 1:
        from stf_unet_tpu.core.mesh import create_mesh
        mesh = create_mesh(args.data_parallel)
        print("tile batches sharded over" if args.tiled
              else "eval batches sharded over", f"{mesh.size} devices")

    per_patient = args.per_patient or args.surface_metrics
    if per_patient and not args.tiled and args.batch_size != 1:
        raise SystemExit("--per-patient/--surface-metrics need "
                         "--batch-size 1 (shape-bucketed batching reorders "
                         "samples relative to the dataset records)")
    if args.threshold_sweep and (num_classes != 2 or args.tiled):
        raise SystemExit("--threshold-sweep needs the binary (2-class) "
                         "non-tiled path: it sweeps the foreground "
                         "probability, and the tiled predictor emits "
                         "argmax masks only")

    if args.tiled:
        return _test_tiled(args, model, state, data_cfg, num_classes,
                           test_index, mesh=mesh, pack=pack)

    if mesh is not None and args.batch_size % mesh.size != 0:
        print(f"warning: --batch-size {args.batch_size} is not a multiple "
              f"of {mesh.size} — batches run replicated (no sharding "
              "speedup); pick a divisible batch size")

    print("Running inference on test set...")
    metrics = evaluate(
        state, model,
        eval_batches_from_index(test_index, data_cfg,
                                use_pk_maps=args.use_pk_maps,
                                batch_size=args.batch_size, pack=pack),
        num_classes, collect_outputs=True, data_cfg=data_cfg, mesh=mesh)

    os.makedirs(args.output_dir, exist_ok=True)
    idx = 0
    for logits, (image, _) in zip(metrics["outputs"], metrics["batches"]):
        for j in range(logits.shape[0]):
            pred = predict_mask(logits[j], args.pred_mode)
            save_overlay(pred, image[j, 0, :, :, 0], args.output_dir, idx,
                         prefix=args.model)
            idx += 1

    if per_patient:
        metrics["patient_report"] = _per_patient_report(
            test_index, metrics["outputs"], metrics["batches"], num_classes,
            surface=args.surface_metrics)
        _dump_json(metrics["patient_report"],
                   os.path.join(args.output_dir, "patient_report.json"))

    if args.threshold_sweep:
        from stf_unet_tpu.metrics.binary import (ThresholdSweep,
                                                 format_threshold_sweep)
        sweep = ThresholdSweep()
        for logits, (_, target) in zip(metrics["outputs"],
                                       metrics["batches"]):
            z = np.asarray(logits, np.float64)
            # stable 2-class softmax foreground probability
            prob_fg = 1.0 / (1.0 + np.exp(z[..., 0] - z[..., 1]))
            sweep.update(prob_fg, np.asarray(target))
        metrics["threshold_sweep"] = sweep.report()
        print("Foreground-probability threshold sweep:")
        print(format_threshold_sweep(metrics["threshold_sweep"]))
        _dump_json(metrics["threshold_sweep"],
                   os.path.join(args.output_dir, "threshold_sweep.json"))

    print("Test Set Metrics:")
    print(metrics["confusion_str"])
    print(f"Dice: {metrics['dice']:.4f}")
    print(f"mIoU: {metrics['mean_metrics']['miou']:.4f}")
    return metrics


def _dump_json(obj, path: str) -> None:
    """Persist a report dict next to the renders (nan -> null, numpy ->
    python), so the console tables survive as machine-readable artifacts."""
    import json
    import math

    def clean(x):
        if isinstance(x, dict):
            return {str(k): clean(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [clean(v) for v in x]
        if isinstance(x, (np.floating, float)):
            return None if math.isnan(x) else float(x)
        if isinstance(x, (np.integer,)):
            return int(x)
        return x

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(clean(obj), f, indent=2)
    print(f"wrote {path}")


def _per_patient_report(test_index: DatasetIndex, outputs, batches,
                        num_classes: int, *, surface: bool) -> dict:
    """Per-patient aggregation over the batch-1 eval stream (record order
    == batch order at batch 1; asserted). Metrics use argmax predictions,
    exactly like evaluate()'s confusion/dice (ref:train_and_eval.py:331)."""
    from stf_unet_tpu.metrics.patient import (PatientAggregator,
                                              format_patient_report)
    if len(outputs) != len(test_index.records):
        raise RuntimeError(
            f"eval stream yielded {len(outputs)} samples for "
            f"{len(test_index.records)} records — cannot map to patients")
    agg = PatientAggregator(num_classes, surface=surface)
    for rec, logits, (_, target) in zip(test_index.records, outputs,
                                        batches):
        agg.update(rec.patient_id, np.asarray(target[0], np.int32),
                   np.argmax(logits[0], axis=-1))
    report = agg.report()
    print("Per-patient metrics"
          + (" (hd95/assd in pixel units)" if surface else "") + ":")
    print(format_patient_report(report))
    return report


def _test_tiled(args: argparse.Namespace, model, state, data_cfg,
                num_classes: int, test_index: DatasetIndex,
                mesh=None, pack=None) -> dict:
    """Native-resolution test pass: sliding-window tiles at the trained
    crop geometry (serve/tiled.TiledPredictor — one jitted program per
    volume geometry), metrics accumulated against the NATIVE-resolution
    masks with the same confusion/dice semantics as evaluate()."""
    import jax

    from stf_unet_tpu.data.loader import load_sample_raw_native
    from stf_unet_tpu.metrics.confusion import (confusion_init,
                                                confusion_report,
                                                confusion_update,
                                                format_confusion)
    from stf_unet_tpu.metrics.dice import eval_dice_update, eval_dice_value
    from stf_unet_tpu.serve.tiled import TiledPredictor

    predictor = TiledPredictor(model, state.variables(), data_cfg.mean,
                               data_cfg.std, tile=data_cfg.crop_size,
                               overlap=args.tile_overlap, mesh=mesh)
    conf = confusion_init(num_classes)
    dice_cum = jnp.zeros((num_classes,), jnp.float32)
    dice_count = jnp.zeros((), jnp.int32)
    agg = None
    if args.per_patient or args.surface_metrics:
        from stf_unet_tpu.metrics.patient import PatientAggregator
        agg = PatientAggregator(num_classes, surface=args.surface_metrics)
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"Running tiled native-resolution inference on test set "
          f"(tile={predictor.tile}, stride={predictor.stride})...")
    for idx, rec in enumerate(test_index.records):
        if pack is not None:  # decode-free native-resolution frames
            frames, mask, pk, _ = pack.sample(idx,
                                              use_pk_maps=args.use_pk_maps)
        else:
            frames, mask, pk = load_sample_raw_native(
                rec, use_pk_maps=args.use_pk_maps,
                mask_format=data_cfg.mask_format)
        img = frames if pk is None else np.concatenate([frames, pk], axis=0)
        pred = predictor.predict(img[..., None])
        pred_j = jnp.asarray(pred)[None]
        target = jnp.asarray(mask.astype(np.int32))[None]
        conf = confusion_update(conf, target, pred_j)
        # eval_dice_update argmaxes its logits, and argmax(one_hot(pred))
        # == pred — so the mask-level dice is exactly evaluate()'s.
        dice_cum, dice_count = eval_dice_update(
            dice_cum, dice_count,
            jax.nn.one_hot(pred_j, num_classes), target, ignore_index=255)
        raw0 = (frames[0].astype(np.float32) / 255.0
                - data_cfg.mean) / data_cfg.std
        save_overlay(pred, raw0, args.output_dir, idx, prefix=args.model)
        if agg is not None:
            agg.update(rec.patient_id, mask.astype(np.int32),
                       np.asarray(pred))

    patient_report = None
    if agg is not None:
        from stf_unet_tpu.metrics.patient import format_patient_report
        patient_report = agg.report()
        print("Per-patient metrics (tiled, native resolution"
              + ("; hd95/assd in pixel units" if args.surface_metrics
                 else "") + "):")
        print(format_patient_report(patient_report))
        _dump_json(patient_report,
                   os.path.join(args.output_dir, "patient_report.json"))

    mat = np.asarray(conf)
    report = confusion_report(mat)
    dice = float(eval_dice_value(dice_cum, dice_count))
    print("Test Set Metrics (tiled, native resolution):")
    print(format_confusion(mat))
    print(f"Dice: {dice:.4f}")
    print(f"mIoU: {report['mean_metrics']['miou']:.4f}")
    return {
        **({"patient_report": patient_report}
           if patient_report is not None else {}),
        "dice": dice,
        "confusion_matrix": mat,
        "confusion_str": format_confusion(mat),
        "global_accuracy": report["global_accuracy"],
        "class_metrics": report["class_metrics"],
        "mean_metrics": report["mean_metrics"],
    }


def main(argv: Optional[Sequence[str]] = None) -> dict:
    return test(parse_args(argv))


if __name__ == "__main__":
    main()
