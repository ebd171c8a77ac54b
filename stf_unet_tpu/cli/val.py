"""Standalone validation CLI with YAML config override + device timing
(the capability behind the reference's legacy val.py — SURVEY §3.5: config
file with write-back of defaults ref:val.py:47-70, per-batch device timing
meter ref:val.py:136-156, thresholded IoU/Dice averages, prediction dumps).

Usage: python -m stf_unet_tpu.cli.val --model-path <ckpt dir> --root <BreaDM>
       [--config ./config.yml] [--name validation]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Sequence

import numpy as np
import yaml

from stf_unet_tpu.core.config import DataConfig, ModelConfig
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.metrics.binary import iou_score
from stf_unet_tpu.metrics.confusion import confusion_report, format_confusion
from stf_unet_tpu.metrics.meters import AverageMeter
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.checkpoint import CheckpointManager
from stf_unet_tpu.train.loop import eval_batches_from_index

DEFAULT_CONFIG = {
    "arch": "stflstm",
    "num_classes": 1,
    "input_channels": 1,
    "time_steps": 8,
    "base_c": 64,
    "crop_size": 224,
    "batch_size": 1,
    "use_subtraction": False,
    "use_pk_maps": False,
}


def load_or_create_config(path: str) -> dict:
    """Read config YAML; create it with defaults when missing
    (ref:val.py:47-70 write-back behavior)."""
    config = dict(DEFAULT_CONFIG)
    try:
        with open(path) as f:
            config.update(yaml.safe_load(f) or {})
    except FileNotFoundError:
        print("Config file not found, using default configuration.")
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(config, f)
    return config


def main(argv: Optional[Sequence[str]] = None) -> dict:
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="STF-UNet TPU validation")
    ap.add_argument("--model-path", type=str, default="./save_weights")
    ap.add_argument("--root", type=str, default="./BreaDM")
    ap.add_argument("--config", type=str, default="./config.yml")
    ap.add_argument("--name", type=str, default="validation")
    ap.add_argument("--split", type=str, default="val",
                    choices=["train", "val", "test"])
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="shard each batch over N devices "
                         "(0 = all visible; identical metrics)")
    ap.add_argument("--data-pack", type=str, default="",
                    help="dataset pack root (stf-pack): serve pre-decoded "
                         "samples by memmap instead of decoding images")
    args = ap.parse_args(argv)

    config = load_or_create_config(args.config)

    import jax
    import jax.numpy as jnp

    data_cfg = DataConfig(data_path=args.root,
                          crop_size=int(config["crop_size"]),
                          use_subtraction=bool(config["use_subtraction"]),
                          use_pk_maps=bool(config["use_pk_maps"]))
    seqs = data_cfg.resolved_sequence_types
    model_cfg = ModelConfig(model=str(config["arch"]),
                            num_classes=int(config["num_classes"]),
                            time_steps=len(seqs),
                            base_c=int(config["base_c"]),
                            use_pk_maps=bool(config["use_pk_maps"]))
    model = create_model(model_cfg)

    ckpt = CheckpointManager(args.model_path, model_cfg.model,
                             "_pk" if data_cfg.use_pk_maps else "")
    kind = "best" if ckpt.exists("best") else "latest"
    print(f"Loading model from {ckpt._path(kind)}")
    from stf_unet_tpu.cli.common import restore_inference_state
    state, _ = restore_inference_state(ckpt, kind)
    variables = state.variables()

    mesh = None
    if args.data_parallel != 1:
        from stf_unet_tpu.core import mesh as mesh_lib
        mesh = mesh_lib.create_mesh(args.data_parallel)
        variables = mesh_lib.replicate(mesh, variables)
        if int(config["batch_size"]) % mesh.size != 0:
            print(f"warning: config batch_size {config['batch_size']} is "
                  f"not a multiple of {mesh.size} — batches run replicated "
                  "(no sharding speedup); pick a divisible batch size")
        else:
            print(f"batches sharded over {mesh.size} devices")

    index = DatasetIndex(args.root, args.split, seqs,
                         use_pk_maps=data_cfg.use_pk_maps)
    pack = None
    if args.data_pack:
        from stf_unet_tpu.data.pack import open_split_pack
        pack = open_split_pack(args.data_pack, args.split)
        pack.validate(index, mask_format=data_cfg.mask_format,
                      use_pk_maps=data_cfg.use_pk_maps)
        print(f"dataset pack [{args.split}]: {len(pack)} samples "
              "(decode-free)")

    iou_avg = AverageMeter()
    dice_avg = AverageMeter()
    devt = AverageMeter()  # per-batch device time (ref:val.py:151-156 'gput')

    from stf_unet_tpu.metrics.confusion import confusion_init, confusion_update
    from stf_unet_tpu.models.registry import preprocess_input
    conf = confusion_init(model_cfg.total_classes)

    fwd_cache = {}
    os.makedirs(os.path.join("outputs", args.name, "0"), exist_ok=True)

    print("Starting validation...")
    for i, (image, target) in enumerate(eval_batches_from_index(
            index, data_cfg, use_pk_maps=data_cfg.use_pk_maps,
            batch_size=int(config["batch_size"]), pack=pack)):
        image_j = jnp.asarray(image)
        if mesh is not None:
            from stf_unet_tpu.core import mesh as mesh_lib
            image_j = (mesh_lib.shard_batch(mesh, image_j)
                       if image_j.shape[0] % mesh.size == 0
                       else mesh_lib.replicate(mesh, image_j))
        shape = tuple(image_j.shape)
        if shape not in fwd_cache:
            from stf_unet_tpu.data.transforms import normalize
            mean, std = data_cfg.mean, data_cfg.std

            def _fwd(v, x):
                # Transfer-lean eval batches arrive as raw uint8; normalize
                # on device (same expression as the eval step / host path).
                if x.dtype == jnp.uint8:
                    x = normalize(x, mean, std)
                return model.apply(v, preprocess_input(x, model),
                                   train=False)["out"]

            fwd_cache[shape] = jax.jit(_fwd)
            fwd_cache[shape](variables, image_j).block_until_ready()  # compile
        fwd = fwd_cache[shape]
        t0 = time.perf_counter()
        logits = fwd(variables, image_j)
        logits.block_until_ready()
        devt.update(time.perf_counter() - t0)

        logits_np = np.asarray(logits)
        pred = np.argmax(logits_np, axis=-1)
        iou, dice = iou_score(logits_np[..., 1] - logits_np[..., 0],
                              (np.asarray(target) == 1))
        iou_avg.update(iou, image.shape[0])
        dice_avg.update(dice, image.shape[0])
        conf = confusion_update(conf, jnp.asarray(target), jnp.asarray(pred))

        from PIL import Image
        for b in range(pred.shape[0]):
            Image.fromarray((pred[b] * 255).astype(np.uint8)).save(
                os.path.join("outputs", args.name, "0",
                             f"{i * int(config['batch_size']) + b:04d}.jpg"))

    mat = np.asarray(conf)
    report = confusion_report(mat)
    print("=" * 50)
    print("Validation Results:")
    print(f"IoU: {iou_avg.avg:.4f}")
    print(f"Dice: {dice_avg.avg:.4f}")
    print(f"Accuracy: {report['global_accuracy']:.4f}")
    print(f"Average device time: {devt.avg:.4f}s")
    print(format_confusion(mat))
    print("=" * 50)
    return {"iou": iou_avg.avg, "dice": dice_avg.avg,
            "device_time": devt.avg, "report": report}


if __name__ == "__main__":
    main()
