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

from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.train.checkpoint import CheckpointManager
from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer
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
    import json

    from stf_unet_tpu.core import config as config_lib
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    ckpt = CheckpointManager(args.model_dir, args.model,
                             "_pk" if args.use_pk_maps else "")
    kind = "best" if ckpt.exists("best") else "latest"
    if not ckpt.exists(kind):
        raise FileNotFoundError(
            f"{args.model}_best_model not found in {args.model_dir}")

    # Recover the training config from the checkpoint sidecar so
    # architecture-affecting values (width, classes, crop, mask encoding)
    # default to what the checkpoint was trained with; explicit flags win.
    saved = None
    meta_cfg = ckpt.read_meta(kind).get("config")
    if meta_cfg:
        try:
            saved = config_lib.config_from_dict(config_lib.TrainConfig,
                                                json.loads(meta_cfg))
        except Exception as e:  # malformed sidecar: fall back to defaults
            print(f"note: unreadable checkpoint config ({e})")
    if saved is not None:
        # Sequence selection and the PK channels are flag-driven (they pick
        # the checkpoint FILE suffix, so they cannot default from the
        # sidecar) — but a mismatch silently evaluates on the wrong inputs;
        # warn loudly.
        for flag, ours, theirs in (
                ("--use-subtraction", args.use_subtraction,
                 saved.data.use_subtraction),
                ("--use-pk-maps", args.use_pk_maps, saved.data.use_pk_maps)):
            if bool(ours) != bool(theirs):
                print(f"WARNING: checkpoint was trained with "
                      f"{flag}={bool(theirs)} but this run uses "
                      f"{flag}={bool(ours)} — inference will see different "
                      f"input sequences/channels than training did")
    num_classes = args.num_classes if args.num_classes is not None else (
        saved.model.total_classes if saved else 2)
    base_c = args.base_c if args.base_c is not None else (
        saved.model.base_c if saved else ModelConfig.base_c)
    crop_size = args.crop_size if args.crop_size is not None else (
        saved.data.crop_size if saved else DataConfig.crop_size)
    mask_format = args.mask_format if args.mask_format is not None else (
        saved.data.mask_format if saved else "binary")

    data_cfg = DataConfig(data_path=args.root,
                          use_subtraction=args.use_subtraction,
                          use_pk_maps=args.use_pk_maps,
                          crop_size=crop_size,
                          mask_format=mask_format,
                          **({"base_size": saved.data.base_size,
                              "mean": saved.data.mean,
                              "std": saved.data.std} if saved else {}))
    seq_types = data_cfg.resolved_sequence_types
    model_cfg = ModelConfig(model=args.model,
                            num_classes=num_classes - 1,
                            base_c=base_c,
                            time_steps=len(seq_types),
                            use_pk_maps=args.use_pk_maps)
    model = create_model(model_cfg)

    # Template state for checkpoint restore (params-only use).
    import jax
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    t_total = len(seq_types) + (3 if args.use_pk_maps else 0)
    sample = jnp.zeros((1, t_total, data_cfg.crop_size, data_cfg.crop_size, 1))
    state = create_train_state(jax.random.key(0), model_cfg, optim, sample)

    state, _ = ckpt.restore(kind, state)
    print(f"model_path: {ckpt._path(kind)}")

    test_index = DatasetIndex(args.root, "test", seq_types,
                              use_pk_maps=args.use_pk_maps)

    print("Running inference on test set...")
    metrics = evaluate(
        state, model,
        eval_batches_from_index(test_index, data_cfg,
                                use_pk_maps=args.use_pk_maps),
        num_classes, collect_outputs=True, data_cfg=data_cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    for idx, (logits, (image, _)) in enumerate(zip(
            metrics["outputs"], metrics["batches"])):
        pred = predict_mask(logits[0], args.pred_mode)
        save_overlay(pred, image[0, 0, :, :, 0], args.output_dir, idx,
                     prefix=args.model)

    print("Test Set Metrics:")
    print(metrics["confusion_str"])
    print(f"Dice: {metrics['dice']:.4f}")
    print(f"mIoU: {metrics['mean_metrics']['miou']:.4f}")
    return metrics


def main(argv: Optional[Sequence[str]] = None) -> dict:
    return test(parse_args(argv))


if __name__ == "__main__":
    main()
