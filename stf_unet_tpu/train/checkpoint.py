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
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from stf_unet_tpu.train.state import TrainState

META_NAME = "meta.json"


@jax.jit
def _snapshot(tree):
    """On-device copy of every leaf as ONE compiled program.

    jnp.copy must run under jit: eagerly it dispatches per leaf, and on a
    remote-tunneled device a few hundred leaf dispatches cost seconds. A
    bare jitted identity would not do — jax short-circuits outputs that are
    inputs — but jnp.copy inside jit lowers to real copy ops, so the
    outputs are fresh buffers that later donations of the source state
    cannot free."""
    return jax.tree_util.tree_map(jnp.copy, tree)


class CheckpointManager:
    def __init__(self, save_dir: str, model_name: str, tag_suffix: str = ""):
        self.save_dir = os.path.abspath(save_dir)
        self.model_name = model_name.lower()
        self.tag_suffix = tag_suffix
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        # Single worker => saves execute in submission order (a "best" save
        # queued after a "latest" save can never be overtaken).
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt-save")
        self._pending: List[Future] = []

    def _path(self, kind: str) -> str:
        # kind in {"latest", "best"} or "epoch{N}" (ref naming, train.py:317-328)
        return os.path.join(self.save_dir,
                            f"{self.model_name}_{kind}_model{self.tag_suffix}")

    def save(self, kind: str, state: TrainState, *, epoch: int,
             best_dice: float, config_json: str = "", seed: int = 0) -> str:
        path = self._path(kind)
        self.wait()  # never interleave with queued async saves
        self._write(path, self._tree(state), epoch, best_dice, config_json,
                    seed)
        return path

    def save_async(self, kind: str, state: TrainState, *, epoch: int,
                   best_dice: float, config_json: str = "",
                   seed: int = 0) -> str:
        """Queue a save and return immediately.

        The train loop donates `state` into the next step, which would free
        the buffers under a background `device_get`; an on-device snapshot
        (one jitted copy program, enqueued before any later donation on the
        same stream) pins the values, and the worker thread then does the
        expensive device->host fetch + Orbax write while the next epoch
        computes. The fetch is the dominant cost (e.g. ~330 MB of flagship
        state over a slow host link), so overlapping it is worth one
        transient state copy in HBM. Call `wait()` before restoring or
        exiting."""
        path = self._path(kind)
        snap = _snapshot(self._tree(state))
        self._pending.append(self._pool.submit(
            self._write, path, snap, epoch, best_dice, config_json, seed))
        return path

    def wait(self) -> None:
        """Drain queued async saves, re-raising the first failure."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    @staticmethod
    def _tree(state: TrainState) -> Dict[str, Any]:
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }

    def _write(self, path: str, tree: Dict[str, Any], epoch: int,
               best_dice: float, config_json: str, seed: int) -> None:
        tree = jax.device_get(tree)
        self._ckptr.save(path, tree, force=True)
        with open(os.path.join(path, META_NAME), "w") as f:
            json.dump({"epoch": epoch, "best_dice": best_dice,
                       "config": config_json, "seed": seed}, f)

    def restore(self, kind_or_path: str, template: TrainState
                ) -> tuple[TrainState, Dict[str, Any]]:
        self.wait()
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
