"""Flagship STF-LSTM-UNet train-step perf sweep on the real chip.

Usage: python tools/perf_stflstm.py [--batch 16] [--size 224] [--iters 10]

Sweeps {f32, bf16} x {scan, pallas LSTM} x {remat on/off} and prints
ms/step + slices/sec for each. Loss value is materialized per-iteration
bound (float()) because block_until_ready is unreliable on the tunneled
axon platform.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--time-steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, args.time_steps, args.size,
                                     args.size, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (args.batch, args.size, args.size)),
                    jnp.int32)
    sched = warmup_poly_schedule(1e-3, 100, 100)

    results = {}
    for amp in (False, True):
        for lstm_backend in ("scan", "auto"):
            for remat in (False, True):
                tag = (f"{'bf16' if amp else 'f32'}"
                       f"/{lstm_backend}/{'remat' if remat else 'noremat'}")
                try:
                    policy = make_policy(amp)
                    cfg = ModelConfig(model="stflstm", num_classes=1,
                                      time_steps=args.time_steps,
                                      lstm_backend=lstm_backend, remat=remat)
                    model = create_model(
                        cfg, dtype=policy.compute_dtype if amp else None)
                    optim = make_optimizer(OptimConfig(), sched)
                    state = create_train_state(jax.random.key(0), cfg, optim, x)
                    step = make_train_step(model, optim, sched, 2)
                    t0 = time.perf_counter()
                    state, loss, _ = step(state, x, y)
                    lv = float(loss)
                    compile_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        state, loss, _ = step(state, x, y)
                    lv = float(loss)
                    dt = (time.perf_counter() - t0) / args.iters
                    results[tag] = dt
                    print(f"{tag:28s} {dt * 1000:8.1f} ms/step "
                          f"{args.batch / dt:8.1f} slices/s "
                          f"(compile {compile_s:.0f}s, loss {lv:.4f})")
                    # free HBM between configs
                    del state, step, model, optim
                except Exception as e:
                    print(f"{tag:28s} FAILED: {type(e).__name__}: {e}")

    if results:
        best = min(results, key=results.get)
        print(f"\nbest: {best} at {results[best] * 1000:.1f} ms/step "
              f"({args.batch / results[best]:.1f} slices/s)")


if __name__ == "__main__":
    main()
