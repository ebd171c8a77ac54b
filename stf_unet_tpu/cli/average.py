"""Checkpoint averaging (SWA-style): leafwise-average N saved checkpoints
into one inference checkpoint.

The reference's per-epoch save mode (`--save-best false`, ref:train.py:
317-328 `{model}_epoch{N}.pth`) produces exactly the trajectory snapshots
stochastic weight averaging consumes; averaging the tail epochs is a
classic cheap accuracy bump the reference leaves on the table.

Usage: python -m stf_unet_tpu.cli.average --model unet
           --save-dir ./save_weights --kinds epoch7,epoch8,epoch9
           [--out-dir ./save_weights/averaged] [--use-pk-maps]

The average is written as the OUT-DIR's `best` checkpoint, so every
inference CLI (stf-test / stf-serve / stf-quantize / stf-export) picks it
up by just pointing --model-dir at it. Params AND BatchNorm statistics are
leafwise-averaged; averaged running-variances are an approximation (SWA
literature recomputes BN stats with a data pass) — run stf-test once to
confirm the averaged model before deploying, exactly as you would after
any training change. When checkpoints carry EMA weights, the EMA tree is
what gets averaged (it is what this framework serves).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def average_checkpoints(model: str, save_dir: str, kinds: Sequence[str],
                        out_dir: str, *, use_pk_maps: bool = False) -> str:
    from stf_unet_tpu.cli.common import restore_inference_state
    from stf_unet_tpu.train.checkpoint import CheckpointManager
    from stf_unet_tpu.train.state import TrainState

    if len(kinds) < 1:
        raise ValueError("need at least one checkpoint kind to average")
    tag = "_pk" if use_pk_maps else ""
    ckpt = CheckpointManager(save_dir, model, tag)

    acc = None
    metas = []
    for kind in kinds:
        if not ckpt.exists(kind):
            raise FileNotFoundError(
                f"{model}_{kind}_model{tag} not found in {save_dir}")
        state, meta = restore_inference_state(ckpt, kind)
        metas.append(meta)
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        tree = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), tree)
        acc = tree if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, tree)
        print(f"  + {kind} (epoch {meta.get('epoch', '?')})")

    n = float(len(kinds))
    avg = jax.tree_util.tree_map(lambda x: x / n, acc)
    out_state = TrainState(params=avg["params"],
                           batch_stats=avg["batch_stats"],
                           opt_state=None,
                           step=jnp.asarray(0, jnp.int32))

    out = CheckpointManager(out_dir, model, tag)
    epoch = max(int(m.get("epoch", 0)) for m in metas)
    config_json = next((m["config"] for m in metas if m.get("config")),
                       json.dumps({"averaged_from": list(kinds)}))
    path = out.save("best", out_state, epoch=epoch,
                    best_dice=max(float(m.get("best_dice", 0.0))
                                  for m in metas),
                    config_json=config_json)
    print(f"averaged {len(kinds)} checkpoints -> {path}")
    return path


def main(argv: Optional[Sequence[str]] = None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, choices=["unet", "stflstm"])
    ap.add_argument("--save-dir", default="./save_weights")
    ap.add_argument("--kinds", required=True,
                    help="comma-separated checkpoint kinds, e.g. "
                         "'epoch7,epoch8,epoch9' or 'latest,best'")
    ap.add_argument("--out-dir", default=None,
                    help="default: <save-dir>/averaged")
    ap.add_argument("--use-pk-maps", action="store_true")
    a = ap.parse_args(argv)
    import os
    out_dir = a.out_dir or os.path.join(a.save_dir, "averaged")
    kinds = [k.strip() for k in a.kinds.split(",") if k.strip()]
    return average_checkpoints(a.model, a.save_dir, kinds, out_dir,
                               use_pk_maps=a.use_pk_maps)


if __name__ == "__main__":
    main()
