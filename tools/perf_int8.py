"""Measure int8 vs bf16 serving forwards on the real chip.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int8.py \
      [--model stflstm|unet] [--batch 16] [--size 224] [--iters 30]

Times the exact serving program (normalize -> forward -> argmax, the
engine's fwd) at bf16 and at int8 (random-init weights, synthetic
calibration on the timing input — timing is weight-value-independent) and
prints ms/batch + slices/s for both. The int8 path is only worth shipping
if this shows a real win: v5e MXU peak is 2x bf16 at int8, but the
non-conv remainder (LSTM, upsamples, BN) stays bf16, so the end-to-end
ratio lands wherever conv time dominates.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="stflstm",
                    choices=["unet", "stflstm"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--time-steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.cache import enable_compilation_cache
    from stf_unet_tpu.core.config import DataConfig, ModelConfig
    from stf_unet_tpu.data.transforms import normalize
    from stf_unet_tpu.models.registry import create_model, preprocess_input
    from stf_unet_tpu.ops import quant

    enable_compilation_cache()
    print("devices:", jax.devices())
    data_cfg = DataConfig()
    cfg = ModelConfig(model=args.model, num_classes=1,
                      time_steps=args.time_steps)
    model = create_model(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(rng.integers(
        0, 256, (args.batch, args.time_steps, args.size, args.size, 1),
        dtype=np.uint8))
    xin = preprocess_input(
        normalize(x_u8, data_cfg.mean, data_cfg.std), model)
    variables = jax.jit(
        lambda k: model.init(k, xin, train=False))(jax.random.key(0))

    def serving_fwd(m):
        @jax.jit
        def fwd(v, x_u8):
            x = normalize(x_u8, data_cfg.mean, data_cfg.std)
            logits = m.apply(v, preprocess_input(x, m), train=False)["out"]
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return fwd

    def bench(label, fwd, v):
        t0 = time.perf_counter()
        out = fwd(v, x_u8)
        float(out.sum())
        compile_s = time.perf_counter() - t0
        # chain a data dep so iterations can't overlap-fold
        for _ in range(3):
            float(fwd(v, x_u8).sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(v, x_u8)
        float(out.sum())
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:8s} {dt * 1e3:8.2f} ms/batch  "
              f"{args.batch / dt:8.1f} slices/s  (compile {compile_s:.0f}s)")
        return dt

    t_bf16 = bench("bf16", serving_fwd(model), variables)

    scales = quant.calibrate(model, variables, [xin])
    qvars = quant.quantize_variables(variables, scales)
    qmodel = quant.QuantizedModel(model)
    t_int8 = bench("int8", serving_fwd(qmodel), qvars)
    print(f"int8 speedup: {t_bf16 / t_int8:.2f}x "
          f"({len(scales)} convs quantized)")


if __name__ == "__main__":
    main()
