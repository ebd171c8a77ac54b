"""Orbax checkpointing with the reference's latest/best policy
(ref:train.py:304-329, resume ref:249-256).

Layout: `<save_dir>/<model>_latest_model<_pk>/` and `..._best_model<_pk>/`,
each an Orbax PyTree checkpoint of {params, batch_stats, opt_state, step}
plus a JSON sidecar {epoch, best_dice, config, prng_seed} for step-exact
deterministic resume (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import orbax.checkpoint as ocp

from stf_unet_tpu.train.state import TrainState

META_NAME = "meta.json"


class CheckpointManager:
    def __init__(self, save_dir: str, model_name: str, tag_suffix: str = ""):
        self.save_dir = os.path.abspath(save_dir)
        self.model_name = model_name.lower()
        self.tag_suffix = tag_suffix
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, kind: str) -> str:
        # kind in {"latest", "best"} or "epoch{N}" (ref naming, train.py:317-328)
        return os.path.join(self.save_dir,
                            f"{self.model_name}_{kind}_model{self.tag_suffix}")

    def save(self, kind: str, state: TrainState, *, epoch: int,
             best_dice: float, config_json: str = "", seed: int = 0) -> str:
        path = self._path(kind)
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        tree = jax.device_get(tree)
        self._ckptr.save(path, tree, force=True)
        with open(os.path.join(path, META_NAME), "w") as f:
            json.dump({"epoch": epoch, "best_dice": best_dice,
                       "config": config_json, "seed": seed}, f)
        return path

    def restore(self, kind_or_path: str, template: TrainState
                ) -> tuple[TrainState, Dict[str, Any]]:
        path = kind_or_path
        if not os.path.isabs(path) and not os.path.exists(path):
            path = self._path(kind_or_path)
        tree_template = {
            "params": template.params,
            "batch_stats": template.batch_stats,
            "opt_state": template.opt_state,
            "step": template.step,
        }
        restored = self._ckptr.restore(path, item=tree_template)
        meta = {}
        meta_path = os.path.join(path, META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        state = TrainState(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"],
                           step=restored["step"])
        return state, meta

    def exists(self, kind: str) -> bool:
        return os.path.exists(self._path(kind))
