"""Fused inference + PK pipeline (BASELINE.md config 4, SURVEY §7 item 8):
for each test sample run segmentation inference AND per-voxel extended-Tofts
fitting on the same temporal stack, then render a combined overlay
(tumor contour + Ktrans heat overlay).

Usage: python -m stf_unet_tpu.cli.pipeline --root <BreaDM>
       [--model stflstm] [--model-dir ./save_weights]
       [--output-dir ./output/pipeline] [--solver lm]

The model forward and the Tofts fit are dispatched back-to-back on the
chip per sample (one jitted forward + one jitted LM solve); decode and
rendering stay on host threads.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Sequence

import numpy as np

from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig, PKConfig
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.data.loader import load_sample_raw
from stf_unet_tpu.data.transforms import eval_preprocess
from stf_unet_tpu.metrics.meters import AverageMeter
from stf_unet_tpu.models.registry import create_model, preprocess_input
from stf_unet_tpu.pk.aif import make_aif
from stf_unet_tpu.pk.fit import fit_adam, fit_lm, preprocess_images
from stf_unet_tpu.pk.tofts import ToftsQuadrature
from stf_unet_tpu.train.checkpoint import CheckpointManager
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer
from stf_unet_tpu.viz.overlay import render_pk_overlay  # noqa: F401 (used in loop)


def run_pipeline(args: argparse.Namespace) -> dict:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    data_cfg = DataConfig(data_path=args.root,
                          use_subtraction=args.use_subtraction)
    seqs = data_cfg.resolved_sequence_types
    model_cfg = ModelConfig(model=args.model, num_classes=1,
                            time_steps=len(seqs), base_c=args.base_c)
    model = create_model(model_cfg)

    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    sample = jnp.zeros((1, len(seqs), data_cfg.crop_size, data_cfg.crop_size, 1))
    state = create_train_state(jax.random.key(0), model_cfg, optim, sample)
    ckpt = CheckpointManager(args.model_dir, args.model)
    kind = "best" if ckpt.exists("best") else "latest"
    if ckpt.exists(kind):
        from stf_unet_tpu.cli.common import restore_inference_state
        state, _ = restore_inference_state(ckpt, kind)
        print(f"loaded {ckpt._path(kind)}")
    else:
        print("warning: no checkpoint found; running with random weights")
    variables = state.variables()

    pk_cfg = PKConfig(solver=args.solver,
                      time_points=tuple(float(i) for i in range(len(seqs))))
    aif = make_aif(pk_cfg.aif_method, pk_cfg.aif_dose)
    quad = ToftsQuadrature.build(pk_cfg.time_points, aif, pk_cfg.dt)
    solver = fit_lm if pk_cfg.solver == "lm" else fit_adam

    index = DatasetIndex(args.root, args.split, seqs)
    pack = None
    if getattr(args, "data_pack", ""):
        from stf_unet_tpu.data.pack import open_split_pack
        pack = open_split_pack(args.data_pack, args.split)
        pack.validate(index, mask_format="binary", use_pk_maps=False)
        print(f"dataset pack [{args.split}]: {len(pack)} samples "
              "(decode-free)")
    os.makedirs(args.output_dir, exist_ok=True)

    fwd_cache = {}
    timer = AverageMeter()
    n_done = 0
    for i, rec in enumerate(index.records):
        if pack is not None:
            frames, mask, _, _ = pack.sample(i, use_pk_maps=False)
        else:
            frames, mask, _ = load_sample_raw(rec)
        # transfer-lean: ship the PIL-parity-resized uint8 frames and
        # normalize inside the jitted forward (train/loop r3 eval path)
        image, _ = eval_preprocess(frames, mask, data_cfg, raw=True)

        t0 = time.perf_counter()
        x = jnp.asarray(image)[None]
        shape = tuple(x.shape)
        if shape not in fwd_cache:
            from stf_unet_tpu.data.transforms import normalize
            mean, std = data_cfg.mean, data_cfg.std
            fwd_cache[shape] = jax.jit(
                lambda v, xx: model.apply(
                    v, preprocess_input(normalize(xx, mean, std), model),
                    train=False)["out"])
        logits = np.asarray(fwd_cache[shape](variables, x))[0]
        pred = np.argmax(logits, axis=-1).astype(np.uint8)

        # PK fit on the raw (un-augmented) temporal stack
        if args.enhanced:
            from stf_unet_tpu.pk.enhanced import (enhanced_preprocess,
                                                  postprocess_param_maps)
            imgs, tissue = enhanced_preprocess(frames)
        else:
            imgs, tissue = preprocess_images(frames, pk_cfg)
        pixels = np.asarray(imgs).transpose(1, 2, 0).reshape(-1, frames.shape[0])
        flat = np.asarray(tissue).reshape(-1)
        fitted = solver(pixels[flat], quad, pk_cfg)
        param_maps = np.zeros((3, flat.shape[0]), np.float32)
        param_maps[:, flat] = fitted.T
        param_maps = param_maps.reshape((3,) + frames.shape[1:])
        if args.enhanced:
            param_maps = postprocess_param_maps(
                param_maps, np.asarray(tissue, bool))
        ktrans = param_maps[0]
        timer.update(time.perf_counter() - t0)

        # Combined render: Ktrans heat (red) + predicted tumor contour (green)
        base = frames[0]
        pred_full = np.asarray(Image.fromarray(pred * 255).resize(
            (base.shape[1], base.shape[0]), Image.NEAREST))
        over = render_pk_overlay(base, ktrans, pred_full)
        Image.fromarray(over).save(
            os.path.join(args.output_dir,
                         f"{rec.patient_id}_{i:03d}_pipeline.png"))
        n_done += 1
    print(f"processed {n_done} samples, "
          f"avg fused inference+fit: {timer.avg:.3f}s/sample")
    return {"samples": n_done, "avg_seconds": timer.avg}


def main(argv: Optional[Sequence[str]] = None) -> dict:
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", type=str, required=True)
    ap.add_argument("--model", type=str, default="stflstm",
                    choices=["stflstm", "unet"])
    ap.add_argument("--model-dir", type=str, default="./save_weights")
    ap.add_argument("--output-dir", type=str, default="./output/pipeline")
    ap.add_argument("--split", type=str, default="test")
    ap.add_argument("--solver", type=str, default="lm",
                    choices=["lm", "adam"])
    ap.add_argument("--base-c", type=int, default=64)
    ap.add_argument("--use-subtraction", action="store_true")
    ap.add_argument("--enhanced", action="store_true",
                    help="Otsu/bilateral PK preprocessing + param-map "
                         "postprocessing (ref:test_pk_fitting.py fork)")
    ap.add_argument("--data-pack", type=str, default="",
                    help="dataset pack root (stf-pack): decode-free "
                         "sample reads")
    return run_pipeline(ap.parse_args(argv))


if __name__ == "__main__":
    main()
