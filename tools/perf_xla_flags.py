"""Sweep per-jit XLA compiler options over the bench train step.

Looks for free step-time wins in the compiler's own knobs (scoped VMEM
limit, optimization effort, latency-hiding scheduler) before any further
kernel work. Usage:

  python tools/perf_xla_flags.py [--model unet|stflstm] [--amp true]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.core.config import ModelConfig, OptimConfig
from stf_unet_tpu.core.dtypes import make_policy
from stf_unet_tpu.models.registry import create_model
from stf_unet_tpu.train.loop import make_train_step
from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.state import create_train_state, make_optimizer

CONFIGS = [
    ("baseline", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("opt_effort", {"exec_time_optimization_effort": 1.0}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet", choices=["unet", "stflstm"])
    ap.add_argument("--amp", default="true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    amp = args.amp.lower() in ("1", "true", "yes")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, 8, 224, 224, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (args.batch, 224, 224)), jnp.int32)
    policy = make_policy(amp)
    # num_classes=1 -> 2-channel head: the SAME model bench.py and the
    # production CLI build (total_classes = num_classes + 1)
    cfg = ModelConfig(model=args.model, num_classes=1, time_steps=8)
    model = create_model(cfg, dtype=policy.compute_dtype if amp else None)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    state0 = create_train_state(jax.random.key(0), cfg, optim, x)
    step_fn = make_train_step(model, optim, sched, 2)

    print(f"model={args.model} amp={amp} batch={args.batch}")
    results = []
    for name, opts in CONFIGS:
        try:
            jitted = jax.jit(step_fn, compiler_options=opts or None)
            t0 = time.perf_counter()
            compiled = jitted.lower(state0, x, y).compile()
            compile_s = time.perf_counter() - t0
            state, loss, _ = compiled(state0, x, y)
            float(loss)  # block_until_ready is unreliable over the axon
            # tunnel (see bench.py); materialize to force completion
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, loss, _ = compiled(state, x, y)
            float(loss)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results.append((name, ms, compile_s, float(loss)))
            print(f"{name:16s} {ms:8.2f} ms/step  "
                  f"{args.batch / ms * 1e3:7.1f} slices/s  "
                  f"(compile {compile_s:.0f}s, loss {float(loss):.4f})")
        except Exception as e:  # noqa: BLE001 - report unknown-flag combos
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
    if not results:
        sys.exit("every config failed to compile/run")
    best = min(results, key=lambda r: r[1])
    base = next((r for r in results if r[0] == "baseline"), None)
    if base is None:
        print(f"\nbest: {best[0]} at {best[1]:.2f} ms (baseline FAILED; "
              "no ratio)")
    else:
        print(f"\nbest: {best[0]} at {best[1]:.2f} ms "
              f"({base[1] / best[1]:.3f}x vs baseline)")


if __name__ == "__main__":
    main()
