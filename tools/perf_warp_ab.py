"""A/B the warp gather mode (STF_UNET_WARP_GATHER) on the PRODUCTION
programs: augment alone, fused augment+train (UNet), fused augment+train
(flagship). The microbench twin (perf_warp_gather.py) ranks isolated
formulations; this tool decides the shipping default, because gather
lowering inside the big fused program can differ from isolation
(the rotation-split lesson, PERFORMANCE.md r4 §3).

  python tools/perf_warp_ab.py [--modes point,patch] [--iters 20]
                               [--skip-fused] [--skip-flagship]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="point,patch")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--skip-flagship", action="store_true")
    args = ap.parse_args()

    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.utils.benchkit import measure_fused_train

    B, T, SRC, CROP = 16, 8, 256, 224
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, T, SRC, SRC)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (B, SRC, SRC)), jnp.uint8)
    sizes = jnp.asarray(np.full((B, 2), SRC), jnp.int32)

    def sync(x):
        float(jnp.sum(x[0]))

    for mode in args.modes.split(","):
        os.environ["STF_UNET_WARP_GATHER"] = mode
        aug = TrainAugment(DataConfig(base_size=SRC, crop_size=CROP))
        out = aug(jax.random.key(0), frames, masks, sizes)
        sync(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = aug(jax.random.key(i), frames, masks, sizes)
        sync(out)
        aug_ms = (time.perf_counter() - t0) / args.iters * 1e3
        row = f"{mode:10s} augment {aug_ms:7.2f} ms"
        if not args.skip_fused:
            f = measure_fused_train(iters=args.iters)
            row += f" | fused unet {f['ms_per_step']:7.2f} ms"
        if not args.skip_flagship:
            f = measure_fused_train(iters=args.iters, model_name="stflstm")
            row += f" | fused stflstm {f['ms_per_step']:7.2f} ms"
        print(row, flush=True)


if __name__ == "__main__":
    main()
