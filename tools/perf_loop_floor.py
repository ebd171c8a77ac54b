"""Attribute the real-trainer loop tail: pack read vs H2D vs dispatch vs step.

The r4 composed run logged ~5.2 s/it WALL at B16 flagship on this 1-core
host while the device step is ~36 ms — this tool breaks that gap into its
host-side components on the real chip so the next optimization targets the
right one. Components measured independently, then the production loop
(train_one_epoch with its prefetch threads) across TWO epochs: the first
pays the axon tunnel's one-time executable upload + first-execution cost
(measured here at 100-500 s — THIS, amortized over a 4-step epoch, is the
5.2 s/it figure, not a per-step host tail), the second is the steady state.

Sync convention: a scalar is materialized to synchronize —
jax.block_until_ready over the tunneled axon platform returns BEFORE
device execution finishes (measured: 0.1 ms return vs 1.7 s actual; see
utils/benchkit._sync, same convention).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_loop_floor.py \
        [--batch-size 16] [--iters 8] [--model stflstm]
Prints a JSON summary line at the end; writes nothing outside /tmp.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--model", default="stflstm")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--time-steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.loader import HostLoader
    from stf_unet_tpu.data.pack import open_split_pack, write_pack
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import (_batch_to_device, make_train_step,
                                         train_one_epoch)
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # Same dataset scale as the composed run: 8 patients x 8 slices @ 256^2.
    tree = "/tmp/loopfloor/tree"
    if not os.path.exists(tree):
        make_synthetic_breadm(tree, splits=("training",),
                              patients_per_split=8, slices_per_patient=8,
                              size=args.size, time_steps=args.time_steps)
    data_cfg = DataConfig(base_size=args.size, crop_size=224)
    index = DatasetIndex(tree, "train", data_cfg.resolved_sequence_types)
    pack_root = "/tmp/loopfloor/pack"
    if not os.path.exists(os.path.join(pack_root, "train")):
        write_pack(index, os.path.join(pack_root, "train"))
    pack = open_split_pack(pack_root, "train")

    loader = HostLoader(index, args.batch_size, shuffle=True, pack=pack)
    augment = TrainAugment(data_cfg)
    policy = make_policy(True)
    cfg = ModelConfig(model=args.model, num_classes=1,
                      time_steps=args.time_steps)
    model = create_model(cfg, dtype=policy.compute_dtype)
    sched = warmup_poly_schedule(1e-3, 100, 1000)
    optim = make_optimizer(OptimConfig(), sched)
    sample = jnp.zeros((args.batch_size, args.time_steps, 224, 224, 1),
                       jnp.float32)
    state = create_train_state(jax.random.key(0), cfg, optim, sample)
    step_fn = make_train_step(model, optim, sched, cfg.total_classes,
                              augment=augment)
    root_key = jax.random.key(42)

    # --- component 1: pack read + host collate (loader only) ---
    batches = []
    t0 = time.perf_counter()
    for i, b in enumerate(loader.epoch(0)):
        batches.append(b)
        if i + 1 >= args.iters:
            break
    t_loader = (time.perf_counter() - t0) / len(batches)
    b0 = batches[0]
    nbytes = (b0.frames.nbytes + b0.masks.nbytes + b0.sizes.nbytes
              + (b0.pk.nbytes if b0.pk is not None else 0))
    print(f"loader-only: {t_loader*1e3:.1f} ms/batch "
          f"({nbytes/1e6:.2f} MB/batch: frames {b0.frames.nbytes/1e6:.2f} "
          f"dtype {b0.frames.dtype} shape {b0.frames.shape})")

    def sync(x):  # benchkit._sync convention: block_until_ready lies on axon
        float(jnp.sum(x))

    # --- component 2: H2D transfer, synchronous ---
    for _ in range(2):  # warm the transfer path
        parts = _batch_to_device(batches[0], None)
        sync(parts[0])
    t0 = time.perf_counter()
    for b in batches:
        parts = _batch_to_device(b, None)
        sync(parts[0])
        sync(parts[1])
    t_h2d = (time.perf_counter() - t0) / len(batches)
    print(f"H2D sync: {t_h2d*1e3:.1f} ms/batch "
          f"({nbytes/1e6/t_h2d:.1f} MB/s effective)")

    # --- component 3: fused step, device-resident inputs ---
    frames, masks, sizes, pk = _batch_to_device(batches[0], None)
    print("compiling fused step (client compile + one-time executable "
          "upload + first execution)...", flush=True)
    t0 = time.perf_counter()
    state, loss, lr = step_fn(state, root_key, 0, 0, frames, masks, sizes, pk)
    first_val = float(loss)
    t_first = time.perf_counter() - t0
    print(f"compile + first synced step: {t_first:.1f} s (loss {first_val:.4f})")
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, loss, lr = step_fn(state, root_key, 0, i + 1, frames, masks,
                                  sizes, pk)
    sync(loss)
    t_step = (time.perf_counter() - t0) / args.iters
    print(f"fused step (device-resident, back-to-back, scalar-synced): "
          f"{t_step*1e3:.1f} ms")

    # --- component 4: full production loop (prefetch threads on) ---
    # Two epochs: per-step wall includes everything cli/train pays — pack
    # read, collate, H2D prefetch thread, dispatch, delayed scalar fetch.
    # Epoch 1 can still carry tunnel warmup tails; epoch 2 is steady state.
    t0 = time.perf_counter()
    state, mloss, mlr, steps = train_one_epoch(
        state, step_fn, loader, None, root_key, 1)
    t_loop1 = (time.perf_counter() - t0) / max(steps, 1)
    t0 = time.perf_counter()
    state, mloss, mlr, steps = train_one_epoch(
        state, step_fn, loader, None, root_key, 2)
    t_loop = (time.perf_counter() - t0) / max(steps, 1)
    print(f"production loop: epoch1 {t_loop1*1e3:.1f} ms/step, "
          f"steady-state {t_loop*1e3:.1f} ms/step over {steps} steps")

    print(json.dumps({
        "metric": "loop_floor_ms_per_step", "value": round(t_loop * 1e3, 1),
        "components_ms": {
            "loader": round(t_loader * 1e3, 1),
            "h2d_sync": round(t_h2d * 1e3, 1),
            "device_step": round(t_step * 1e3, 1),
            "first_epoch_per_step": round(t_loop1 * 1e3, 1),
        },
        "compile_first_step_s": round(t_first, 1),
        "batch_mb": round(nbytes / 1e6, 2),
        "h2d_mb_per_s": round(nbytes / 1e6 / t_h2d, 1),
    }))


if __name__ == "__main__":
    main()
