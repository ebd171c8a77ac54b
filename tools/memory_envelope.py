"""Memory envelope (VERDICT r2 next-step 8): how large a (batch, crop) fits
one v5e chip per model, with and without remat — measured from the XLA
compiler's own memory analysis rather than trial-OOM runs.

For each (model, remat) the bf16 train step is AOT-compiled at a probe
batch and `compiled.memory_analysis()` read: temp bytes (activations +
workspace) scale ~linearly in batch while argument/output bytes (params,
opt state) are constant, so two probe points give bytes/sample and the
largest batch under the HBM budget. The table lands in PERFORMANCE.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/memory_envelope.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BYTES = 16 * 1024 ** 3  # v5e: 16 GiB/chip
CROP = 224
T = 8


def analyze(model_name: str, remat: bool, batch: int):
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    cfg = ModelConfig(model=model_name, num_classes=1, time_steps=T,
                      remat=remat)
    policy = make_policy(True)
    model = create_model(cfg, dtype=policy.compute_dtype)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    x = jnp.zeros((batch, T, CROP, CROP, 1), jnp.float32)
    y = jnp.zeros((batch, CROP, CROP), jnp.int32)
    state = create_train_state(jax.random.key(0), cfg, optim, x)
    step = make_train_step(model, optim, sched, cfg.total_classes)
    compiled = step.lower(state, x, y).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("backend reports no memory analysis")
    return {
        "temp": int(ma.temp_size_in_bytes),
        "args": int(ma.argument_size_in_bytes),
        "out": int(ma.output_size_in_bytes),
        "alias": int(ma.alias_size_in_bytes),
    }


def main():
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    probes = (8, 16)
    gib = 1024 ** 3
    print(f"{'model':10s} {'remat':5s} {'state GiB':>9s} {'temp/sample MiB':>16s}"
          f" {'max batch @224²':>16s}")
    for model_name in ("unet", "stflstm"):
        for remat in (False, True):
            rows = {b: analyze(model_name, remat, b) for b in probes}
            b0, b1 = probes
            per_sample = (rows[b1]["temp"] - rows[b0]["temp"]) / (b1 - b0)
            fixed_temp = rows[b0]["temp"] - per_sample * b0
            # state (params + opt moments + BN stats) lives in HBM alongside
            # temps; donation aliases it rather than doubling it.
            state_bytes = rows[b0]["args"] - b0 * (T * CROP * CROP * 4
                                                   + CROP * CROP * 4)
            max_batch = int((HBM_BYTES - state_bytes - fixed_temp)
                            // per_sample)
            print(f"{model_name:10s} {str(remat):5s} "
                  f"{state_bytes / gib:9.2f} "
                  f"{per_sample / 1024 ** 2:16.1f} "
                  f"{max_batch:16d}")
            for b in probes:
                r = rows[b]
                print(f"    batch {b}: temp {r['temp']/gib:.2f} GiB, "
                      f"args {r['args']/gib:.2f} GiB, "
                      f"out {r['out']/gib:.2f} GiB, "
                      f"alias {r['alias']/gib:.2f} GiB")


if __name__ == "__main__":
    main()
