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
from typing import Any, Dict, List, Optional

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
    # Backpressure cap: each queued save pins a full on-device state
    # snapshot in HBM, so if fetch+write run slower than epochs the
    # snapshots would otherwise accumulate without bound. save_async blocks
    # on the oldest save once this many are outstanding (2 = the normal
    # latest+best pair from one epoch).
    MAX_PENDING = 2

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
             best_dice: float, config_json: str = "", seed: int = 0,
             step_in_epoch: Optional[int] = None) -> str:
        path = self._path(kind)
        self.wait()  # never interleave with queued async saves
        self._write(path, self._tree(state), epoch, best_dice, config_json,
                    seed, step_in_epoch)
        return path

    def save_async(self, kind: str, state: TrainState, *, epoch: int,
                   best_dice: float, config_json: str = "",
                   seed: int = 0,
                   step_in_epoch: Optional[int] = None) -> str:
        """Queue a save and return immediately.

        The train loop donates `state` into the next step, which would free
        the buffers under a background `device_get`; an on-device snapshot
        (one jitted copy program, enqueued before any later donation on the
        same stream) pins the values, and the worker thread then does the
        expensive device->host fetch + Orbax write while the next epoch
        computes. The fetch is the dominant cost (e.g. ~330 MB of flagship
        state over a slow host link), so overlapping it is worth one
        transient state copy in HBM. Call `wait()` before restoring or
        exiting.

        Fails fast: a write error from an earlier queued save (disk full,
        bad save_dir) re-raises HERE rather than epochs later at the final
        wait()/restore — otherwise training would continue with nothing
        persisted. Also applies backpressure: blocks on the oldest pending
        save once MAX_PENDING are outstanding, bounding the number of HBM
        snapshots pinned by the queue.

        Multi-process failure semantics: orbax save/restore barrier across
        ALL processes, so if one process dies on a host-local write error,
        its peers surface the failure via the coordination-service barrier
        timeout (orbax's multihost coordination_timeout) rather than
        instantly — the standard multi-controller JAX failure mode. Fast
        local failure remains preferable to training on with nothing
        persisted."""
        self._reap(block_until=self.MAX_PENDING - 1)
        path = self._path(kind)
        snap = _snapshot(self._tree(state))
        self._pending.append(self._pool.submit(
            self._write, path, snap, epoch, best_dice, config_json, seed,
            step_in_epoch))
        return path

    def _reap(self, block_until: Optional[int] = None) -> None:
        """Consume finished futures (and, if block_until is given, block on
        the oldest until at most that many remain). EVERY consumed future's
        exception is observed; the first one re-raises after all targeted
        futures are consumed, so no failure is silently abandoned."""
        errors: List[BaseException] = []
        remaining: List[Future] = []
        for i, fut in enumerate(self._pending):
            n_left = len(self._pending) - i
            must_block = (block_until is not None
                          and len(remaining) + n_left > block_until)
            if fut.done() or must_block:
                try:
                    fut.result()
                except BaseException as e:  # noqa: BLE001 - re-raised below
                    errors.append(e)
            else:
                remaining.append(fut)
        self._pending = remaining
        if errors:
            raise errors[0]

    def wait(self) -> None:
        """Drain ALL queued async saves; observes every failure and
        re-raises the first."""
        self._reap(block_until=0)

    @staticmethod
    def _tree(state: TrainState) -> Dict[str, Any]:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            tree["ema_params"] = state.ema_params
        return tree

    def _write(self, path: str, tree: Dict[str, Any], epoch: int,
               best_dice: float, config_json: str, seed: int,
               step_in_epoch: Optional[int] = None) -> None:
        tree = jax.device_get(tree)
        # Multi-process: EVERY process must call save with the same tree —
        # orbax's Checkpointer.save runs cross-process barriers internally
        # (a main-only save deadlocks), and its type handlers write each
        # array once (primary host) — but the JSON sidecar is ours to gate.
        self._ckptr.save(path, tree, force=True)
        if jax.process_index() == 0:
            meta = {"epoch": epoch, "best_dice": best_dice,
                    "config": config_json, "seed": seed}
            if step_in_epoch is not None:
                # Mid-epoch preemption save: resume re-enters THIS epoch
                # at this step (train/preempt.py).
                meta["step_in_epoch"] = int(step_in_epoch)
            with open(os.path.join(path, META_NAME), "w") as f:
                json.dump(meta, f)

    def restore(self, kind_or_path: str, template: TrainState
                ) -> tuple[TrainState, Dict[str, Any]]:
        self.wait()
        path = kind_or_path
        if not os.path.isabs(path) and not os.path.exists(path):
            path = self._path(kind_or_path)
        tree_template = self._tree(template)
        restored = self._ckptr.restore(path, item=tree_template)
        meta = self.read_meta(path)
        state = TrainState(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"],
                           step=restored["step"],
                           ema_params=restored.get("ema_params"))
        return state, meta

    def restore_variables(self, kind_or_path: str
                          ) -> tuple[Dict[str, Any], bool, Dict[str, Any]]:
        """Template-free INFERENCE restore: read the on-disk tree as
        stored (orbax restores without an item template), so no
        optimizer-structure (--grad-accum) or EMA-layout assumptions can
        mismatch. Returns ({"params", "batch_stats"}, used_ema, meta)
        with the EMA weights selected as the live params when the
        checkpoint carries them — EMA training selects them for serving.
        Training resume keeps using restore() (it needs opt_state and the
        raw/EMA split, and its template is built from the run config)."""
        self.wait()
        path = kind_or_path
        if not os.path.isabs(path) and not os.path.exists(path):
            path = self._path(kind_or_path)
        restored = self._ckptr.restore(path)
        meta = self.read_meta(path)
        used_ema = "ema_params" in restored
        params = restored["ema_params"] if used_ema else restored["params"]
        return ({"params": params,
                 "batch_stats": restored["batch_stats"]}, used_ema, meta)

    def exists(self, kind: str) -> bool:
        return os.path.exists(self._path(kind))

    def read_meta(self, kind_or_path: str) -> Dict[str, Any]:
        """The JSON sidecar {epoch, best_dice, config, seed} without
        restoring the tree — lets CLIs recover the training config (model
        width, crop size, ...) from a checkpoint before building the
        restore template."""
        path = kind_or_path
        if not os.path.isabs(path) and not os.path.exists(path):
            path = self._path(kind_or_path)
        meta_path = os.path.join(path, META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                return json.load(f)
        return {}
