"""Migrate a reference PyTorch checkpoint (.pth) into this framework's
Orbax format (SURVEY §5: one-way PyTorch->JAX importer).

Usage: python -m stf_unet_tpu.cli.migrate <ckpt.pth> --model unet
       --save-dir ./save_weights [--kind best] [--num-classes 2]
       [--base-c 64] [--time-steps 8] [--use-pk-maps]

Only model weights migrate (optimizer state is architecture-specific and
restarts fresh); epoch/best-dice metadata carries over when present in the
torch pickle (ref:train.py:304-311 layout).
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from stf_unet_tpu.core.config import ModelConfig, OptimConfig
from stf_unet_tpu.train.checkpoint import CheckpointManager
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import (TrainState, create_train_state,
                                      make_optimizer)
from stf_unet_tpu.utils.torch_import import (import_stflstm_state_dict,
                                             import_unet_state_dict,
                                             load_torch_checkpoint)


def migrate(path: str, model: str, save_dir: str, kind: str = "best",
            num_classes: int = 2, base_c: int = 64, time_steps: int = 8,
            use_pk_maps: bool = False) -> str:
    state_dict = load_torch_checkpoint(path)
    if model == "unet":
        params, batch_stats = import_unet_state_dict(state_dict)
    elif model == "stflstm":
        params, batch_stats = import_stflstm_state_dict(state_dict)
    else:
        raise ValueError(f"Unknown model type: {model}")

    model_cfg = ModelConfig(model=model, num_classes=num_classes - 1,
                            base_c=base_c, time_steps=time_steps,
                            use_pk_maps=use_pk_maps)
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    t_total = time_steps + (3 if use_pk_maps else 0)
    sample = jnp.zeros((1, t_total, 64, 64, 1), jnp.float32)
    template = create_train_state(jax.random.key(0), model_cfg, optim, sample)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=optim.init(params), step=template.step)

    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0

    ckpt = CheckpointManager(save_dir, model, "_pk" if use_pk_maps else "")
    out = ckpt.save(kind, state, epoch=epoch, best_dice=0.0,
                    config_json=f'{{"migrated_from": "{path}"}}')
    print(f"migrated {path} -> {out}")
    return out


def export_to_torch(output: str, model: str, save_dir: str,
                    kind: str = "best", use_pk_maps: bool = False) -> str:
    """Reverse migration: Orbax checkpoint -> reference-compatible .pth
    (utils/torch_export.py). The written pickle is
    {"model": state_dict, "epoch": N} — exactly what the reference's
    loaders read (ref:test.py:142-146, ref:utils.py:27-50). EMA weights
    are exported when the checkpoint carries them (they are what this
    framework serves)."""
    from stf_unet_tpu.cli.common import restore_inference_state
    from stf_unet_tpu.utils.torch_export import (export_stflstm_state_dict,
                                                 export_unet_state_dict,
                                                 to_torch)

    ckpt = CheckpointManager(save_dir, model, "_pk" if use_pk_maps else "")
    if not ckpt.exists(kind):
        raise FileNotFoundError(f"{model}_{kind}_model not found in "
                                f"{save_dir}")
    state, meta = restore_inference_state(ckpt, kind)
    export = (export_unet_state_dict if model == "unet"
              else export_stflstm_state_dict)
    sd = to_torch(export(state.params, state.batch_stats))

    import torch
    payload = {"model": sd, "epoch": int(meta.get("epoch", 0))}
    if "best_dice" in meta:
        payload["best_dice"] = float(meta["best_dice"])
    torch.save(payload, output)
    print(f"exported {ckpt._path(kind)} -> {output} "
          f"({len(sd)} tensors, reference torch layout)")
    return output


def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint",
                    help="source .pth (forward) or OUTPUT .pth (--reverse)")
    ap.add_argument("--model", required=True, choices=["unet", "stflstm"])
    ap.add_argument("--save-dir", default="./save_weights")
    ap.add_argument("--kind", default="best")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--base-c", type=int, default=64)
    ap.add_argument("--time-steps", type=int, default=8)
    ap.add_argument("--use-pk-maps", action="store_true")
    ap.add_argument("--reverse", action="store_true",
                    help="export the Orbax checkpoint in --save-dir to a "
                         "reference-compatible torch .pth at CHECKPOINT")
    a = ap.parse_args(argv)
    if a.reverse:
        export_to_torch(a.checkpoint, a.model, a.save_dir, a.kind,
                        a.use_pk_maps)
        return
    migrate(a.checkpoint, a.model, a.save_dir, a.kind, a.num_classes,
            a.base_c, a.time_steps, a.use_pk_maps)


if __name__ == "__main__":
    main()
