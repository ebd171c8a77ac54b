"""Capture a device trace of N train steps and print the top ops by total
device time — the xplane-guided workflow that found the r2 CE-gather fix.

Usage: python tools/trace_top_ops.py [--model unet|stflstm] [--amp true]
       [--batch 16] [--size 224] [--steps 5] [--top 25] [--fused]

--fused traces the PRODUCTION fused augment+train program (raw uint8
frames, in-jit key derivation — the exact single program cli/train
dispatches per step, same construction as benchkit.measure_fused_train),
so the attribution covers the augmentation gathers alongside the model.

Parses the jax.profiler xplane.pb with the TSL profiler protos (no
tensorboard UI needed) and aggregates per-op self time on the device
plane, normalized per step.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_xplane(path: str, steps: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"\n=== plane: {plane.name} (per step, over {steps} steps) ===")
        for line in plane.lines:
            # Only the op-level line carries the schedule; module/step lines
            # are enclosing regions that would double-count, and -start
            # events of async copies overlap real compute.
            if line.events and ("XLA Ops" in line.name or line.name == ""):
                pass
            else:
                continue
            totals: dict[str, float] = defaultdict(float)
            counts: dict[str, int] = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
            if not totals:
                continue
            print(f"--- line: {line.name or '(unnamed)'} ---")
            ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
            total_ms = sum(totals.values())
            print(f"{'op':64s} {'ms/step':>9s} {'calls':>6s} {'%':>6s}")
            for name, ms in ranked:
                print(f"{name[:64]:64s} {ms / steps:9.3f} "
                      f"{counts[name] // steps:6d} {100 * ms / total_ms:5.1f}%")
            print(f"{'TOTAL (sum of op self times)':64s} "
                  f"{total_ms / steps:9.3f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet", choices=["unet", "stflstm"])
    ap.add_argument("--amp", default="true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--fused", action="store_true",
                    help="trace the production fused augment+train program")
    ap.add_argument("--trace-dir", default=None,
                    help="parse an existing trace dir instead of capturing")
    args = ap.parse_args()
    amp = args.amp.lower() in ("1", "true", "yes")

    if args.trace_dir is None:
        import jax
        import jax.numpy as jnp

        from stf_unet_tpu.core.config import (DataConfig, ModelConfig,
                                              OptimConfig)
        from stf_unet_tpu.core.dtypes import make_policy
        from stf_unet_tpu.models.registry import create_model
        from stf_unet_tpu.train.loop import make_train_step
        from stf_unet_tpu.train.schedule import warmup_poly_schedule
        from stf_unet_tpu.train.state import create_train_state, make_optimizer

        rng = np.random.default_rng(0)
        t_steps = 8
        x = jnp.asarray(rng.normal(size=(args.batch, t_steps, args.size,
                                         args.size, 1)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, (args.batch, args.size, args.size)),
                        jnp.int32)
        policy = make_policy(amp)
        cfg = ModelConfig(model=args.model, num_classes=1, time_steps=t_steps)
        model = create_model(cfg, dtype=policy.compute_dtype if amp else None)
        sched = warmup_poly_schedule(1e-3, 100, 100)
        optim = make_optimizer(OptimConfig(), sched)
        state = create_train_state(jax.random.key(0), cfg, optim, x)
        # One shared capture block for both modes (the scalar-sync
        # convention must stay identical — float(loss) materialization,
        # not block_until_ready, on the tunneled platform): each branch
        # contributes only a run_step(i) closure.
        if args.fused:
            from stf_unet_tpu.data.transforms import TrainAugment
            src = 256
            frames = jnp.asarray(
                rng.integers(0, 255, (args.batch, t_steps, src, src)),
                jnp.uint8)
            masks = jnp.asarray(
                rng.integers(0, 2, (args.batch, src, src)), jnp.uint8)
            sizes = jnp.asarray(np.full((args.batch, 2), src), jnp.int32)
            aug = TrainAugment(DataConfig(base_size=src,
                                          crop_size=args.size))
            fstep = make_train_step(model, optim, sched, 2, augment=aug)
            root = jax.random.key(0)

            def run_step(i, box={"s": state}):
                box["s"], loss, _ = fstep(box["s"], root, 1, i, frames,
                                          masks, sizes, None)
                return loss
        else:
            step = make_train_step(model, optim, sched, 2)

            def run_step(i, box={"s": state}):
                box["s"], loss, _ = step(box["s"], x, y)
                return loss

        loss = run_step(0)
        print(f"compiled{' (fused)' if args.fused else ''}; loss",
              float(loss))
        trace_dir = tempfile.mkdtemp(prefix="trace_")
        with jax.profiler.trace(trace_dir):
            for i in range(args.steps):
                loss = run_step(i + 1)
            float(loss)
        args.trace_dir = trace_dir

    pbs = glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    print("trace:", pbs[0])
    parse_xplane(pbs[0], args.steps, args.top)


if __name__ == "__main__":
    main()
