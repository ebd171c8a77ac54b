"""Fused last-step LSTM training kernel vs XLA scan, per flagship scale,
on the real chip. Also re-times the full flagship train step with the new
'auto' backend routing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lstm_kernel.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, iters=20, warmup=2):
    import jax
    import jax.numpy as jnp

    def fetch(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    fetch(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--amp", type=str, default="true")
    args = ap.parse_args()
    amp = args.amp.lower() in ("1", "true", "yes")

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.ops.lstm import pixel_lstm

    dt = jnp.bfloat16 if amp else jnp.float32
    print(f"device: {jax.devices()[0].platform} amp={amp}")
    rng = np.random.default_rng(0)
    b, t = args.batch, 8
    q = args.size // 4

    for c, hh in zip((64, 128, 256, 512), (q, q // 2, q // 4, q // 8)):
        feat = jnp.asarray(rng.normal(size=(b, t, hh, hh, c)), dt)
        k = 1 / np.sqrt(c)
        w_ih = jnp.asarray(rng.uniform(-k, k, (c, 4 * c)), dt)
        w_hh = jnp.asarray(rng.uniform(-k, k, (c, 4 * c)), dt)
        bias = jnp.asarray(rng.uniform(-k, k, (4 * c,)), dt)

        for backend in ("scan", "pallas_last", "pallas_fused"):
            if backend == "pallas_fused":
                from stf_unet_tpu.ops.pallas.lstm_train_kernel import (
                    lstm_fused_supported)
                if not lstm_fused_supported(t, b * hh * hh, c,
                                            feat.dtype.itemsize):
                    print(f"  C={c:4d} {backend:14s} (unsupported, skip)")
                    continue

            fwd = jax.jit(lambda f: pixel_lstm(f, w_ih, w_hh, bias,
                                               backend=backend))

            def loss(f):
                return jnp.sum(pixel_lstm(f, w_ih, w_hh, bias,
                                          backend=backend)
                               .astype(jnp.float32) ** 2)

            try:
                ms_f = _time(fwd, (feat,))
            except Exception as e:
                print(f"  C={c:4d} {backend:14s} fwd FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            if backend == "pallas_last":
                print(f"  C={c:4d} {backend:14s} fwd {ms_f:7.2f} ms "
                      f"(no bwd)")
                continue
            try:
                bwd = jax.jit(jax.grad(loss))
                ms_b = _time(bwd, (feat,))
                print(f"  C={c:4d} {backend:14s} fwd {ms_f:7.2f} ms   "
                      f"fwd+bwd {ms_b:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  C={c:4d} {backend:14s} bwd FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")

    # numeric spot-check on chip: fused grads vs scan grads
    c, hh = 64, 16
    feat = jnp.asarray(rng.normal(size=(2, t, hh, hh, c)), jnp.float32)
    k = 1 / np.sqrt(c)
    w_ih = jnp.asarray(rng.uniform(-k, k, (c, 4 * c)), jnp.float32)
    w_hh = jnp.asarray(rng.uniform(-k, k, (c, 4 * c)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-k, k, (4 * c,)), jnp.float32)

    def g(backend):
        return jax.grad(lambda f: jnp.sum(pixel_lstm(
            f, w_ih, w_hh, bias, backend=backend) ** 2))(feat)

    d = float(jnp.max(jnp.abs(g("pallas_fused") - g("scan"))))
    print(f"on-chip grad max|diff| fused vs scan: {d:.2e}")
    assert d < 1e-3, "gradient mismatch on chip"

    # full flagship step with auto routing
    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    x = jnp.asarray(rng.normal(size=(b, t, args.size, args.size, 1)),
                    jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (b, args.size, args.size)), jnp.int32)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    for backend in ("scan", "auto"):
        cfg = ModelConfig(model="stflstm", num_classes=1, time_steps=t,
                          lstm_backend=backend)
        policy = make_policy(amp)
        model = create_model(cfg, dtype=policy.compute_dtype if amp else None)
        optim = make_optimizer(OptimConfig(), sched)
        state = create_train_state(jax.random.key(0), cfg, optim, x)
        step = make_train_step(model, optim, sched, 2)
        t0 = time.perf_counter()
        state, loss, _ = step(state, x, y)
        lv = float(loss)
        compile_s = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss, _ = step(state, x, y)
        lv = float(loss)
        dtm = (time.perf_counter() - t0) / iters
        print(f"FULL step lstm_backend={backend:5s}: {dtm * 1000:7.1f} ms "
              f"({b / dtm:6.1f} slices/s, compile {compile_s:.0f}s, "
              f"loss {lv:.4f})", flush=True)
        del state, step, model, optim


if __name__ == "__main__":
    main()
