"""Per-component timing of the flagship STF-LSTM-UNet train step on the
real chip (VERDICT r1 next-step 1: profile before attacking the conv
bottleneck).

Times, per component: forward / forward+backward of the encoder stem, each
ResNet stage, the per-scale pixel LSTMs, the decoder stack, and the full
fused step; reports ms and achieved TFLOP/s (XLA cost-analysis FLOPs /
measured time).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_components.py
       [--batch 16] [--size 224] [--amp true]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, iters=20, warmup=2):
    """Amortized wall ms per call: enqueue `iters` async dispatches, fetch
    ONCE, subtract the measured host<->chip fetch RTT. Per-iteration fetches
    would be swamped by the axon tunnel's ~30 ms round trip (and
    block_until_ready is a no-op there)."""
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
    fetch(out)  # already computed -> pure round-trip cost
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 1e-9) / iters * 1000.0


def _flops(fn, args):
    import jax
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--time-steps", type=int, default=8)
    ap.add_argument("--amp", type=str, default="true")
    args = ap.parse_args()
    amp = args.amp.lower() in ("1", "true", "yes")

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.models.blocks import (ConvTranspose, DecoderBlock,
                                            ResidualConvBlock)
    from stf_unet_tpu.models.resnet import BasicBlock, ResNet34Encoder
    from stf_unet_tpu.models.stf_lstm_unet import PixelLSTM
    from stf_unet_tpu.ops.conv import max_pool_torch

    dtype = jnp.bfloat16 if amp else None
    print(f"device: {jax.devices()[0].platform}  amp={amp}")
    b, t, s = args.batch, args.time_steps, args.size
    n = b * t
    rng = np.random.default_rng(0)
    rows = []

    def bench(name, module, x_shape, train=True, method=None, extra=None):
        x = jnp.asarray(rng.normal(size=x_shape), jnp.float32)
        xs = (x,) if extra is None else (x, jnp.asarray(
            rng.normal(size=extra), jnp.float32))
        variables = module.init(jax.random.key(0), *xs, train=False)

        def fwd(v, *xx):
            out = module.apply(v, *xx, train=train,
                               mutable=["batch_stats"] if train else False)
            return out[0] if train else out

        def fwd_bwd(v, *xx):
            def loss(v):
                out = module.apply(v, *xx, train=train,
                                   mutable=["batch_stats"] if train else False)
                o = out[0] if train else out
                leaves = jax.tree_util.tree_leaves(o)
                return jnp.sum(leaves[0].astype(jnp.float32) ** 2)
            return jax.grad(loss)(v)

        jf = jax.jit(fwd)
        jb = jax.jit(fwd_bwd)
        ms_f = _time(jf, (variables,) + xs)
        ms_b = _time(jb, (variables,) + xs)
        fl_f = _flops(fwd, (variables,) + xs)
        fl_b = _flops(fwd_bwd, (variables,) + xs)
        rows.append((name, ms_f, fl_f / ms_f / 1e9 if ms_f else 0,
                     ms_b, fl_b / ms_b / 1e9 if ms_b else 0))
        print(f"{name:34s} fwd {ms_f:8.2f} ms ({rows[-1][2]:6.1f} TF/s)   "
              f"fwd+bwd {ms_b:8.2f} ms ({rows[-1][4]:6.1f} TF/s)", flush=True)

    # Encoder pieces at the folded B*T batch
    class Stem(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, x, *, train: bool):
            from stf_unet_tpu.models.blocks import TorchBatchNorm
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = TorchBatchNorm(dtype=self.dtype, name="bn1")(
                x, use_running_average=not train)
            x = nn.relu(x)
            return max_pool_torch(x, kernel=3, stride=2, padding=1)

    class Stage(nn.Module):
        blocks: int
        width: int
        first_stride: int
        dtype: object = None

        @nn.compact
        def __call__(self, x, *, train: bool):
            for i in range(self.blocks):
                x = BasicBlock(self.width,
                               stride=self.first_stride if i == 0 else 1,
                               dtype=self.dtype, name=f"b{i}")(x, train=train)
            return x

    bench("stem 7x7 s2 + pool  (Cin=1)", Stem(dtype=dtype), (n, s, s, 1))
    q = s // 4
    bench("layer1 3xBasic 64ch @56^2", Stage(3, 64, 1, dtype), (n, q, q, 64))
    bench("layer2 4xBasic 128ch @28^2", Stage(4, 128, 2, dtype), (n, q, q, 64))
    bench("layer3 6xBasic 256ch @14^2", Stage(6, 256, 2, dtype),
          (n, q // 2, q // 2, 128))
    bench("layer4 3xBasic 512ch @7^2", Stage(3, 512, 2, dtype),
          (n, q // 4, q // 4, 256))
    bench("encoder full", ResNet34Encoder(dtype=dtype), (n, s, s, 1))

    # LSTMs per scale ([B, T, h, w, c])
    for i, (c, hh) in enumerate(zip((64, 128, 256, 512),
                                    (q, q // 2, q // 4, q // 8))):
        bench(f"lstm{i+1} {c}ch @{hh}^2",
              PixelLSTM(c, "auto"), (b, t, hh, hh, c))

    # Decoder pieces
    bench("decoder4 512->256 @7->14", DecoderBlock(256, dtype=dtype),
          (b, q // 8, q // 8, 512), extra=(b, q // 4, q // 4, 256))
    bench("decoder3 256->128 @14->28", DecoderBlock(128, dtype=dtype),
          (b, q // 4, q // 4, 256), extra=(b, q // 2, q // 2, 128))
    bench("decoder2 128->64 @28->56", DecoderBlock(64, dtype=dtype),
          (b, q // 2, q // 2, 128), extra=(b, q, q, 64))

    class Head(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, x, *, train: bool):
            from stf_unet_tpu.ops.resize import resize_bilinear_align_corners
            d1 = ConvTranspose(32, kernel=3, stride=2, padding=1,
                               output_padding=1, dtype=self.dtype,
                               name="upconv1")(x)
            d1 = ResidualConvBlock(32, dtype=self.dtype, name="final_res")(
                d1, train=train)
            out = nn.Conv(2, (1, 1), dtype=self.dtype, name="final")(d1)
            return resize_bilinear_align_corners(out, s, s)

    bench("head up+res32+1x1+resize", Head(dtype=dtype), (b, q, q, 64))

    # Full train step for scale
    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    from stf_unet_tpu.core.dtypes import make_policy
    mc = ModelConfig(model="stflstm", num_classes=1, time_steps=t)
    policy = make_policy(amp)
    model = create_model(mc, dtype=policy.compute_dtype if amp else None)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    x = jnp.asarray(rng.normal(size=(b, t, s, s, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (b, s, s)), jnp.int32)
    state = create_train_state(jax.random.key(0), mc, optim, x)
    step = make_train_step(model, optim, sched, 2)

    def full(state, x, y):
        s2, loss, lr = step(state, x, y)
        return loss

    # donation forbids reuse; re-make state per call is too slow — time with
    # a non-donated variant
    def full_nodonate(state, x, y):
        from stf_unet_tpu.losses.criterion import criterion
        from stf_unet_tpu.models.registry import preprocess_input

        def loss_fn(params, bstats):
            out, mut = model.apply(
                {"params": params, "batch_stats": bstats},
                preprocess_input(x, model), train=True,
                mutable=["batch_stats"])
            return criterion(out, y, num_classes=2), mut

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats)
        updates, _ = optim.update(grads, state.opt_state, state.params)
        # touch EVERY update leaf or XLA dead-code-eliminates the gradient
        # chains that do not reach the returned scalar
        probe = sum(u.ravel()[0].astype(jnp.float32)
                    for u in jax.tree_util.tree_leaves(updates))
        return loss + probe

    jfull = jax.jit(full_nodonate)
    ms = _time(jfull, (state, x, y), iters=5)
    fl = _flops(full_nodonate, (state, x, y))
    print(f"{'FULL train step':34s} {'':28s}fwd+bwd {ms:8.2f} ms "
          f"({fl / ms / 1e9:6.1f} TF/s)  [{b * 1000.0 / ms:.0f} slices/s]")


if __name__ == "__main__":
    main()
