"""Training entry point (ref:train.py:124-401).

Usage: python -m stf_unet_tpu.cli.train --data-path <BreaDM root> [flags]

Reproduces the reference driver: dataset build -> model/optimizer/schedule ->
optional resume -> epoch loop (train, eval, results file, latest/best
checkpoints, early stop) -> best-model test-set inference with comparison
renders -> final test metrics. TPU-native internals throughout: device-side
augmentation, jitted train step over a data mesh, Orbax checkpoints.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.core import config as config_lib
from stf_unet_tpu.core import mesh as mesh_lib
from stf_unet_tpu.core.config import TrainConfig
from stf_unet_tpu.core.dtypes import make_policy
from stf_unet_tpu.core.prng import STREAM_INIT, root_key, stream
from stf_unet_tpu.data.index import DatasetIndex
from stf_unet_tpu.data.loader import HostLoader
from stf_unet_tpu.data.transforms import TrainAugment
from stf_unet_tpu.metrics.binary import compute_metrics
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.checkpoint import CheckpointManager
from stf_unet_tpu.train.early_stop import EarlyStopping
from stf_unet_tpu.train.loop import (eval_batches_from_index, evaluate,
                                     make_train_step, train_one_epoch)
from stf_unet_tpu.train.preempt import PreemptionGuard
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer
from stf_unet_tpu.viz.comparison import save_comparison


def _open_pack(cfg: TrainConfig, mode: str, required: bool = False):
    """Open the split's dataset pack under --data-pack, or None.

    The training split must exist when --data-pack is given (that's the
    split the flag is for); a missing val/test pack falls back to the
    decode path with a note — packing only the training split is a valid
    workflow (pack contents are identity-validated against the live index
    either way, so a stale pack still fails loudly)."""
    if not cfg.data.pack_dir:
        return None
    from stf_unet_tpu.data.pack import open_split_pack
    try:
        pack = open_split_pack(cfg.data.pack_dir, mode)
    except FileNotFoundError:
        if required:
            raise
        print(f"note: no '{mode}' pack under {cfg.data.pack_dir}; "
              "decoding that split from the image tree")
        return None
    print(f"dataset pack [{mode}]: {len(pack)} samples, "
          f"canvas {pack.canvas} (decode-free)")
    return pack


def main(cfg: TrainConfig) -> dict:
    host_index, num_hosts = 0, 1
    if cfg.multihost:
        from stf_unet_tpu.core.distributed import host_info, initialize
        initialize()  # raises on failure — no silent single-host fallback
        host_index, num_hosts = host_info()
        print(f"multi-host: process {host_index}/{num_hosts}")
    is_main = host_index == 0
    print(f"JAX {jax.__version__} | devices: {jax.devices()}")

    num_classes = cfg.model.total_classes  # +1 background (ref:train.py:144)
    tag_suffix = cfg.tag_suffix

    results_file: Optional[str] = None
    jsonl = None
    if not cfg.silent and is_main:  # one writer per pod
        os.makedirs(cfg.output_dir, exist_ok=True)
        stamp = datetime.datetime.now().strftime("%m%d-%H%M")
        results_file = os.path.join(
            cfg.output_dir,
            f"{cfg.model.model}_results_{stamp}{tag_suffix}.txt")
        if cfg.jsonl_metrics:
            from stf_unet_tpu.utils.profiling import JsonlLogger
            jsonl = JsonlLogger(os.path.join(
                cfg.output_dir,
                f"{cfg.model.model}_metrics_{stamp}{tag_suffix}.jsonl"))

    if cfg.nan_check:
        jax.config.update("jax_debug_nans", True)
        print("NaN sanitizer enabled (jax_debug_nans)")

    from stf_unet_tpu.core.cache import enable_compilation_cache
    cache_dir = enable_compilation_cache(
        None if cfg.compile_cache_dir == "auto" else cfg.compile_cache_dir)
    if cache_dir:
        print(f"persistent compilation cache: {cache_dir}")

    if cfg.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
        print(f"matmul precision: {cfg.matmul_precision}")
    if cfg.aux:
        print("note: --aux accepted for reference parity; these models "
              "define no auxiliary head (ref models never return one either)")

    if cfg.generate_pk_maps and is_main:
        print("Generating PK parameter maps...")
        from stf_unet_tpu.pk.maps import generate_pk_maps_for_dataset
        generate_pk_maps_for_dataset(cfg.data.data_path)
        print("PK parameter maps generation completed")

    early_stopper = EarlyStopping(patience=cfg.early_stop_patience, verbose=True)

    seq_types = cfg.data.resolved_sequence_types
    print(f"Using sequence types: {list(seq_types)}")

    train_index = DatasetIndex(cfg.data.data_path, "train", seq_types,
                               use_pk_maps=cfg.data.use_pk_maps)
    val_index = DatasetIndex(cfg.data.data_path, "val", seq_types,
                             use_pk_maps=cfg.data.use_pk_maps)
    if len(train_index) == 0 and not cfg.test_only:
        # Every patient was warn-and-skipped (missing sequences/masks, or
        # --use-pk-maps with no pk_maps dirs — note PK generation reads
        # SUB1..8 subtraction sequences only, ref:pk_fitting.py:625-662).
        # Running 0-step epochs and reporting success would hide it.
        raise SystemExit(
            "error: the training index is empty after warn-and-skip — "
            "check the warnings above (dataset layout / --use-pk-maps "
            "without generated pk_maps).")

    mesh = None
    n_dev = len(jax.devices())
    if cfg.spatial_parallel > 1:
        if num_hosts > 1:
            raise SystemExit("error: --spatial-parallel is single-process "
                             "only (use --data-parallel across hosts)")
        from stf_unet_tpu.parallel import create_2d_mesh
        n_space = cfg.spatial_parallel
        n_data = (cfg.data_parallel if cfg.data_parallel > 1
                  else max(n_dev // n_space, 1))
        mesh = create_2d_mesh(n_data, n_space)
        print(f"2-D mesh: {n_data} data x {n_space} spatial shards "
              "(image rows shard over 'space'; GSPMD conv halo exchanges)")
    elif cfg.data_parallel != 1 and n_dev > 1:
        mesh = mesh_lib.create_mesh(cfg.data_parallel)
        print(f"Data-parallel mesh over {mesh.devices.size} devices")

    batch_size = cfg.batch_size  # GLOBAL batch
    if batch_size == 0:  # --batch-size auto
        if cfg.spatial_parallel > 1:
            # The probe measures the single-device step; H-sharding divides
            # activation temps by n_space, which the linear-in-batch model
            # cannot see — it would reject or undersize by ~n_space.
            raise SystemExit("error: --batch-size auto does not model "
                             "--spatial-parallel; set --batch-size "
                             "explicitly")
        from stf_unet_tpu.train.autobatch import pick_batch_size
        t_total_probe = len(seq_types) + (cfg.model.pk_channels
                                          if cfg.data.use_pk_maps else 0)
        # Probe at the loader's REAL fixed canvas (max native slice size
        # rounded up), not base_size — the fused step casts the whole
        # canvas to the compute dtype, so probing smaller would pick an
        # OOMing batch on native-resolution datasets.
        probe_canvas = HostLoader(train_index, 1, shuffle=False,
                                  prefetch=0).canvas
        batch_size = pick_batch_size(
            cfg, t_total_probe,
            n_shards=(mesh.shape[mesh_lib.DATA_AXIS] if mesh is not None
                      else 1),
            budget_bytes=int(cfg.auto_batch_budget_gb * 2**30) or None,
            canvas=probe_canvas)
    if mesh is not None:
        batch_size = mesh_lib.pad_batch_to_multiple(
            batch_size, mesh.shape[mesh_lib.DATA_AXIS])
    # Each host loads its slice of the global batch; shard_batch assembles
    # the global array from the per-process slices.
    local_batch = max(1, batch_size // num_hosts)

    train_pack = _open_pack(cfg, "train", required=True)
    loader = HostLoader(train_index, local_batch, shuffle=True, seed=cfg.seed,
                        use_pk_maps=cfg.data.use_pk_maps,
                        drop_last=mesh is not None,
                        prefetch=cfg.data.prefetch,
                        host_index=host_index, num_hosts=num_hosts,
                        mask_format=cfg.data.mask_format,
                        cache_ram=cfg.data.cache_ram,
                        pack=train_pack)
    augment = TrainAugment(cfg.data)

    policy = make_policy(cfg.amp)
    if cfg.amp:
        print("bf16 compute policy enabled (TPU-native AMP)")

    model_cfg = dataclasses.replace(cfg.model, time_steps=len(seq_types))
    model = create_model(model_cfg, dtype=policy.compute_dtype
                         if cfg.amp else None)

    # With grad accumulation the schedule advances once per optimizer
    # APPLY (every k-th step), so size it in apply units.
    k = max(int(cfg.grad_accum), 1)
    num_step = max(-(-len(loader) // k), 1)
    schedule = warmup_poly_schedule(
        cfg.optim.lr, num_step, cfg.epochs, warmup=cfg.optim.warmup,
        warmup_epochs=cfg.optim.warmup_epochs,
        warmup_factor=cfg.optim.warmup_factor, power=cfg.optim.poly_power)
    optim = make_optimizer(cfg.optim, schedule, grad_accum=k)
    if k > 1:
        print(f"gradient accumulation x{k}: effective batch "
              f"{batch_size * k}")

    key = root_key(cfg.seed)
    t_total = len(seq_types) + (cfg.model.pk_channels if cfg.data.use_pk_maps else 0)
    sample = jnp.zeros((batch_size, t_total, cfg.data.crop_size,
                        cfg.data.crop_size, 1), jnp.float32)
    use_ema = cfg.optim.ema_decay > 0.0
    state = create_train_state(stream(key, STREAM_INIT), model_cfg, optim,
                               sample, ema=use_ema)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))
    print(f"Model {cfg.model.model}: {n_params / 1e6:.1f}M params")
    if use_ema:
        print(f"EMA weights: decay {cfg.optim.ema_decay}"
              f"{' (warmup ramp)' if cfg.optim.ema_warmup else ''} "
              "(val/test evaluate the EMA copy)")

    ckpt = CheckpointManager(cfg.save_dir, cfg.model.model, tag_suffix)
    start_epoch = cfg.start_epoch
    best_dice = 0.0
    resume_step = None  # set on a mid-epoch (preemption) resume
    if cfg.resume:
        # --grad-accum changes the opt_state STRUCTURE (optax.MultiSteps
        # wrapper); a mismatched resume would die inside orbax with a
        # tree-structure error — fail with the actual cause instead.
        import json as _json
        meta_cfg = ckpt.read_meta(cfg.resume).get("config")
        saved_accum = (int(_json.loads(meta_cfg).get("grad_accum", k) or k)
                       if meta_cfg else k)
        if saved_accum != k:
            raise ValueError(
                f"checkpoint was trained with --grad-accum {saved_accum} "
                f"but this run uses --grad-accum {k}; resume with the same "
                f"value (the optimizer state structure differs)")
        # Same failure mode for EMA: its on/off state adds/removes the
        # ema_params subtree.
        if meta_cfg:
            saved_ema = float(_json.loads(meta_cfg).get("optim", {})
                              .get("ema_decay", 0.0) or 0.0) > 0.0
            if saved_ema != use_ema:
                raise ValueError(
                    "checkpoint was trained with --optim-ema-decay "
                    f"{'on' if saved_ema else 'off'} but this run has it "
                    f"{'on' if use_ema else 'off'}; resume with a matching "
                    "setting (the state structure differs)")
        state, meta = ckpt.restore(cfg.resume, state)
        resume_step = meta.get("step_in_epoch")
        if resume_step is not None:
            # Step-exact mid-epoch resume after a preemption save
            # (train/preempt.py): re-enter the SAME epoch at the
            # interrupted step.
            start_epoch = int(meta.get("epoch", 0))
            resume_step = int(resume_step)
        else:
            start_epoch = int(meta.get("epoch", -1)) + 1
        # Carry the best score forward so a worse post-resume epoch cannot
        # clobber the best checkpoint; prefer the best checkpoint's own meta.
        best_dice = float(meta.get("best_dice", 0.0) or 0.0)
        if ckpt.exists("best"):
            import json as _json
            best_meta = os.path.join(ckpt._path("best"), "meta.json")
            if os.path.exists(best_meta):
                with open(best_meta) as f:
                    best_dice = max(best_dice,
                                    float(_json.load(f).get("best_dice", 0.0)))
        print(f"Resumed from {cfg.resume} at epoch {start_epoch}"
              + (f" step {resume_step}" if resume_step else "")
              + f" (best dice so far {best_dice:.4f})")

    if mesh is not None:
        state = mesh_lib.replicate(mesh, state)

    # Fused step: device augmentation compiles into the same program as the
    # model update — one dispatch per step. The schedule arg is display-
    # only (the optimizer owns its own); under accumulation state.step
    # counts microbatches, so display in apply units.
    display_schedule = (schedule if k == 1
                        else (lambda s: schedule(s // k)))
    loss_weight = None
    if cfg.loss_class_weights:
        try:
            loss_weight = [float(v)
                           for v in cfg.loss_class_weights.split(",")]
        except ValueError:
            raise SystemExit(
                f"--loss-class-weights must be comma-separated floats "
                f"(e.g. 1.0,4.0), got {cfg.loss_class_weights!r}")
        if len(loss_weight) != num_classes:
            raise SystemExit(
                f"--loss-class-weights needs {num_classes} values "
                f"(total classes incl. background), got {len(loss_weight)}")
        print(f"class-weighted CE: {loss_weight}")
    # Rotation-probability split: opt-in (--data-rotation-split true) and
    # single-device only (the bucket combine would cross shards under a
    # mesh) — see DataConfig.rotation_split for why it defaults off.
    rotation_split = (cfg.data.rotation_split and mesh is None
                      and augment.can_rotation_split)
    if rotation_split:
        print("rotation-split augmentation: unrotated samples take the "
              "separable resample path")
    train_step = make_train_step(model, optim, display_schedule, num_classes,
                                 augment=augment,
                                 ema_decay=cfg.optim.ema_decay,
                                 ema_every_k=k,
                                 ema_warmup=cfg.optim.ema_warmup,
                                 loss_weight=loss_weight,
                                 rotation_split=rotation_split)
    cfg_json = config_lib.config_to_json(cfg)
    start_time = time.time()
    # SIGTERM/first-SIGINT (or --stop-after-steps) stop the run at the
    # next step boundary with a step-exact resumable checkpoint
    # (train/preempt.py); multi-host stops are collectively agreed.
    guard = PreemptionGuard(num_hosts, cfg.stop_after_steps)
    preempted = False

    val_pack = _open_pack(cfg, "val")
    if val_pack is not None:  # fail on a stale pack NOW, not at epoch end
        val_pack.validate(val_index, mask_format=cfg.data.mask_format,
                          use_pk_maps=cfg.data.use_pk_maps)
    # Same for the test-phase pack: a mismatch must abort at startup, not
    # after every training epoch has already run.
    test_pack = _open_pack(cfg, "test")
    if test_pack is not None:
        test_pack.validate(
            DatasetIndex(cfg.data.data_path, "test", seq_types,
                         use_pk_maps=cfg.data.use_pk_maps),
            mask_format=cfg.data.mask_format,
            use_pk_maps=cfg.data.use_pk_maps)

    def _val_batches():
        return eval_batches_from_index(val_index, cfg.data,
                                       use_pk_maps=cfg.data.use_pk_maps,
                                       batch_size=cfg.eval_batch_size,
                                       host_index=host_index,
                                       num_hosts=num_hosts,
                                       pack=val_pack)

    if cfg.data.cache_ram:
        # The val set re-decodes every epoch otherwise; with --data-cache-ram
        # the replayed batches are byte-identical (deterministic resize).
        from stf_unet_tpu.train.loop import CachedEvalBatches
        val_batches = CachedEvalBatches(_val_batches)
    else:
        val_batches = None
    try:
        for epoch in range(start_epoch, cfg.epochs):
            if cfg.test_only:
                break
            start_step = (resume_step or 0) if epoch == start_epoch else 0
            if cfg.profile_dir and epoch == start_epoch:
                from stf_unet_tpu.utils.profiling import trace
                with trace(cfg.profile_dir):
                    state, mean_loss, lr, steps_done = train_one_epoch(
                        state, train_step, loader, None, key, epoch,
                        mesh=mesh, print_freq=cfg.print_freq,
                        device_prefetch=cfg.data.device_prefetch,
                        start_step=start_step,
                        should_stop=guard.should_stop,
                        rotation_split_augment=(augment if rotation_split
                                                else None))
            else:
                state, mean_loss, lr, steps_done = train_one_epoch(
                    state, train_step, loader, None, key, epoch, mesh=mesh,
                    print_freq=cfg.print_freq,
                    device_prefetch=cfg.data.device_prefetch,
                    start_step=start_step,
                    should_stop=guard.should_stop,
                    rotation_split_augment=(augment if rotation_split
                                            else None))

            if guard.triggered:
                # Coordinated stop mid-epoch (every host broke at the same
                # step): skip eval, persist a step-exact "latest" and exit.
                partial = steps_done < len(loader)
                ckpt.save("latest", state, epoch=epoch, best_dice=best_dice,
                          config_json=cfg_json, seed=cfg.seed,
                          step_in_epoch=steps_done if partial else None)
                preempted = True
                resume_kind = "latest"
                break

            # Multi-host: each process evaluates its shard of the val set and
            # the final accumulators all-reduce (the reference's
            # reduce_from_all_processes) — N hosts make the val epoch ~N× faster
            # with identical global metrics. The post-training test-set pass
            # below stays unsharded so the main process renders every sample.
            metrics = evaluate(
                state.with_ema_weights(), model,
                val_batches if val_batches is not None else _val_batches(),
                num_classes, data_cfg=cfg.data,
                reduce_across_processes=num_hosts > 1,
                # Single-process only: multi-host val is already sharded at
                # the HOST level above, and sharding those per-host batches
                # over the global mesh would make the cross-process
                # all-reduce double-count.
                mesh=mesh if (cfg.eval_batch_size > 1 and num_hosts == 1)
                else None)
            dice = metrics["dice"]
            print(metrics["confusion_str"])
            print(f"Dice coefficient: {dice:.4f}")
            print(f"Global accuracy: {metrics['global_accuracy']:.4f}")
            print(f"Mean IoU: {metrics['mean_metrics']['miou']:.4f}")
            print(f"Mean precision: {metrics['mean_metrics']['mprecision']:.4f}")
            print(f"Mean recall: {metrics['mean_metrics']['mrecall']:.4f}")

            if jsonl is not None:
                jsonl.log({"epoch": epoch, "train_loss": mean_loss, "lr": lr,
                           "dice": dice,
                           "global_acc": metrics["global_accuracy"],
                           **metrics["mean_metrics"]})
            if results_file:
                # Per-epoch results block (ref:train.py:288-301 format).
                with open(results_file, "a") as f:
                    f.write(f"[epoch: {epoch}]\n"
                            f"train_loss: {mean_loss:.4f}\n"
                            f"lr: {lr:.6f}\n"
                            f"dice: {dice:.4f}\n"
                            f"global_acc: {metrics['global_accuracy']:.4f}\n"
                            f"mean_iou: {metrics['mean_metrics']['miou']:.4f}\n"
                            f"mean_precision: {metrics['mean_metrics']['mprecision']:.4f}\n"
                            f"mean_recall: {metrics['mean_metrics']['mrecall']:.4f}\n"
                            f"{metrics['confusion_str']}\n\n")

            # Saves are queued to a background worker (device->host fetch +
            # Orbax write overlap the next epoch's compute); ckpt.restore/wait
            # below drain the queue before the state is read back. EVERY
            # process calls save (orbax's save runs cross-process barriers and
            # writes each array exactly once, from the primary host — a
            # main-only save would deadlock a multi-host run).
            if cfg.save_best:
                ckpt.save_async("latest", state, epoch=epoch,
                                best_dice=best_dice, config_json=cfg_json,
                                seed=cfg.seed)
                if best_dice < dice:
                    ckpt.save_async("best", state, epoch=epoch,
                                    best_dice=dice, config_json=cfg_json,
                                    seed=cfg.seed)
                    if is_main:
                        print(f"New best model saved at epoch {epoch}, "
                              f"Dice = {dice:.4f}")
                    best_dice = dice
            else:
                ckpt.save_async(f"epoch{epoch}", state, epoch=epoch,
                                best_dice=best_dice, config_json=cfg_json,
                                seed=cfg.seed)

            if early_stopper.step(dice):
                print(f"Early stopping at epoch {epoch + 1}")
                break

            # A signal that landed during eval/saves stops here: this
            # epoch's "latest" save is already queued with complete-epoch
            # meta, so resume starts at the next epoch. Polled by every
            # host at the same point (agreement, like the in-loop check).
            if guard.should_stop(increment=False):
                preempted = True
                # With --save-best false this epoch's save went to
                # epoch{N}, not "latest" — point resume at what exists.
                resume_kind = "latest" if cfg.save_best else f"epoch{epoch}"
                break
    finally:
        guard.uninstall()

    if preempted:
        ckpt.wait()  # flush the step-exact / end-of-epoch save
        if num_hosts > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("preempt_ckpt_drain")
        if is_main:
            print(f"Preemption/stop honored: resumable checkpoint saved "
                  f"({ckpt._path(resume_kind)}); continue with "
                  f"--resume {resume_kind}")
        return {"preempted": True, "best_dice": best_dice}

    ckpt.wait()  # drain queued saves before reading checkpoints back
    if num_hosts > 1:
        # Barrier: no process may fall through to the best-checkpoint
        # exists/restore below while another's background writes are still
        # in flight (async saves widen that race from milliseconds to
        # whole epochs).
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt_drain")
    total_time = time.time() - start_time
    print(f"Training time {datetime.timedelta(seconds=int(total_time))}")

    # ---- best-model test-set inference + evaluation (ref:train.py:341-400) --
    print("Start evaluating best model on test set...")
    best_kind = "best" if ckpt.exists("best") else "latest"
    if ckpt.exists(best_kind):
        state, _ = ckpt.restore(best_kind, state)

    test_index = DatasetIndex(cfg.data.data_path, "test", seq_types,
                              use_pk_maps=cfg.data.use_pk_maps)

    test_save_dir = os.path.join(cfg.output_dir, f"test_results{tag_suffix}")
    os.makedirs(test_save_dir, exist_ok=True)

    print("Running inference on test set...")
    test_metrics = evaluate(
        state.with_ema_weights(), model,
        eval_batches_from_index(test_index, cfg.data,
                                use_pk_maps=cfg.data.use_pk_maps,
                                pack=test_pack),
        num_classes, collect_outputs=True, data_cfg=cfg.data)

    for idx, (logits, (image, target)) in enumerate(zip(
            test_metrics["outputs"] if is_main else [],
            test_metrics["batches"] if is_main else [])):
        # Unified argmax prediction (SURVEY §3.3: the reference splits
        # between sigmoid-threshold and argmax; we standardize on argmax
        # of the softmax, foreground = class 1).
        pred = np.argmax(logits[0], axis=-1).astype(np.float32)
        raw = image[0, 0, :, :, 0]
        tgt = np.where(target[0] == 255, 0, target[0]).astype(np.float32)
        dice_val, iou_val = compute_metrics(pred, tgt)
        save_comparison(pred, tgt, raw, test_save_dir,
                        base_name=cfg.model.model, idx=idx,
                        dice_score=dice_val, iou_score=iou_val)

    print("Test Set Metrics:")
    print(test_metrics["confusion_str"])
    print(f"Dice: {test_metrics['dice']:.4f}")
    print(f"mIoU: {test_metrics['mean_metrics']['miou']:.4f}")
    return {"best_dice": best_dice, "test": test_metrics}


def run(argv: Optional[Sequence[str]] = None) -> dict:
    return main(config_lib.parse_config(argv))


if __name__ == "__main__":
    run()
