"""Targeted experiments for the remaining flagship step time: the Cin=1
stem conv, the loss head (resize + CE + dice), and the full step with the
measured LSTM routing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_misc.py
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"device: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    n, s = 128, 224
    dt = jnp.bfloat16

    # --- stem variants: 7x7 s2 Cin=1 -> 64 ---------------------------------
    x = jnp.asarray(rng.normal(size=(n, s, s, 1)), dt)
    w = jnp.asarray(rng.normal(size=(7, 7, 1, 64)) * 0.1, dt)

    def conv_stem(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def im2col_stem(x, w):
        # pad then extract 49 shifted strided views -> one [.., 49] @ [49, 64]
        xp = jnp.pad(x[..., 0], ((0, 0), (3, 4), (3, 4)))
        cols = [xp[:, dy:dy + s:2, dx:dx + s:2]
                for dy in range(7) for dx in range(7)]
        patches = jnp.stack(cols, axis=-1)  # [N, 112, 112, 49]
        return jnp.dot(patches, w.reshape(49, 64),
                       preferred_element_type=dt)

    for name, fn in (("stem conv_general", conv_stem),
                     ("stem im2col+matmul", im2col_stem)):
        fwd = jax.jit(fn)
        bwd = jax.jit(jax.grad(
            lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        ms_f = _time(fwd, (x, w))
        ms_b = _time(bwd, (x, w))
        print(f"{name:24s} fwd {ms_f:6.2f} ms   fwd+bwd {ms_b:6.2f} ms",
              flush=True)

    # --- loss head: logits resize 112->224 + CE + dice ----------------------
    from stf_unet_tpu.losses.criterion import criterion
    from stf_unet_tpu.ops.resize import resize_bilinear_align_corners

    b = 16
    logits_half = jnp.asarray(rng.normal(size=(b, s // 2, s // 2, 2)),
                              jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (b, s, s)), jnp.int32)

    def loss_resize(logits):
        out = resize_bilinear_align_corners(logits, s, s)
        return criterion({"out": out}, y, num_classes=2)

    def loss_only(logits_full):
        return criterion({"out": logits_full}, y, num_classes=2)

    g1 = jax.jit(jax.grad(loss_resize))
    ms = _time(g1, (logits_half,))
    print(f"{'resize112->224 + CE+dice bwd':24s} {ms:6.2f} ms")
    logits_full = jnp.asarray(rng.normal(size=(b, s, s, 2)), jnp.float32)
    g2 = jax.jit(jax.grad(loss_only))
    ms = _time(g2, (logits_full,))
    print(f"{'CE+dice bwd @224 only':24s} {ms:6.2f} ms")

    # --- full step with the new measured routing ----------------------------
    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    xx = jnp.asarray(rng.normal(size=(b, 8, s, s, 1)), jnp.float32)
    yy = jnp.asarray(rng.integers(0, 2, (b, s, s)), jnp.int32)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    cfg = ModelConfig(model="stflstm", num_classes=1, time_steps=8,
                      lstm_backend="auto")
    policy = make_policy(True)
    model = create_model(cfg, dtype=policy.compute_dtype)
    optim = make_optimizer(OptimConfig(), sched)
    state = create_train_state(jax.random.key(0), cfg, optim, xx)
    step = make_train_step(model, optim, sched, 2)
    state, loss, _ = step(state, xx, yy)
    float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, xx, yy)
    float(loss)
    dtm = (time.perf_counter() - t0) / iters
    print(f"FULL step auto(thresholded): {dtm * 1000:7.1f} ms "
          f"({b / dtm:6.1f} slices/s, loss {float(loss):.4f})")


if __name__ == "__main__":
    main()
