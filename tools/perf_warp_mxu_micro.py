"""Micro-attribution for the Pallas MXU warp (ops/pallas/warp_kernel.py):
time the kernel ALONE vs the XLA point-gather warp ALONE on the
production shape, plus ablations (no-nearest, channel count, tile shape
via env) — decides whether the full-augment tie (26.5 vs 26.8 ms,
PERFORMANCE.md r5) is the kernel's own cost or the program around it.

  python tools/perf_warp_mxu_micro.py [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.data import transforms as T
    from stf_unet_tpu.ops.pallas.warp_kernel import warp_bilinear_nearest_mxu

    B, C, H, W, HO, WO = 16, 9, 256, 256, 224, 224
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.integers(0, 256, (B, C, H, W)), jnp.float32)
    valid_h = jnp.full((B,), H, jnp.int32)
    valid_w = jnp.full((B,), W, jnp.int32)
    # affine-family grids: rotation 20 deg, mild scale
    gy_l, gx_l = [], []
    gyy, gxx = jnp.meshgrid(jnp.arange(HO, dtype=jnp.float32),
                            jnp.arange(WO, dtype=jnp.float32), indexing="ij")
    for i in range(B):
        ang = np.radians(rng.uniform(-25, 25))
        s = rng.uniform(0.8, 1.6)
        cy, cx = H / 2, W / 2
        gy = (np.cos(ang) * (gyy - cy) + np.sin(ang) * (gxx - cx)) * s + cy
        gx = (-np.sin(ang) * (gyy - cy) + np.cos(ang) * (gxx - cx)) * s + cx
        gy_l.append(gy)
        gx_l.append(gx)
    gy = jnp.stack(gy_l)
    gx = jnp.stack(gx_l)

    def sync(x):
        float(jnp.sum(x[0]))

    def timeit(f, *a):
        out = f(*a)
        sync(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        sync(out[0] if isinstance(out, tuple) else out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # 1. Pallas kernel alone (wrapper includes its reshape/transpose glue)
    mxu = jax.jit(lambda s, y, x: warp_bilinear_nearest_mxu(
        s, y, x, valid_h, valid_w, max_inv_scale=2.0, sin_bound=0.5))
    print(f"pallas mxu warp       {timeit(mxu, stacked, gy, gx):7.2f} ms",
          flush=True)

    # 2. XLA point-gather warp alone (the production default)
    def xla_warp(s, y, x):
        def one(st, yy, xx):
            return T._warp_bilinear_and_nearest(
                st[:-1], st[-1], yy, xx,
                jnp.float32(H), jnp.float32(W))
        return jax.vmap(one)(s, y, x)
    print(f"xla point warp        {timeit(jax.jit(xla_warp), stacked, gy, gx):7.2f} ms",
          flush=True)

    # 3. kernel minus the transpose glue: time pallas_call on pre-tiled
    #    inputs by reusing the wrapper twice with identity-ish grids is
    #    not separable; instead time the glue alone (transposes + ys map)
    def glue(s, y, x):
        # mirrors the production wrapper's pre-kernel glue EXACTLY,
        # including the lane-major (…, 1, P) grid layout — a (…, P, 1)
        # mimic would time the trailing-unit-dim relayouts the r5
        # analysis showed are pathological, not the real glue
        from stf_unet_tpu.ops.pallas.warp_kernel import TILE_H, TILE_W, band_rows
        bsz = s.shape[0]
        ni, nj = HO // TILE_H, WO // TILE_W
        band = band_rows(TILE_H, TILE_W, 2.0, 0.5, H)
        gy_t = y.reshape(bsz, ni, TILE_H, nj, TILE_W).transpose(0, 1, 3, 2, 4)
        ys = (jnp.clip(jnp.floor(gy_t.min(axis=(3, 4))).astype(jnp.int32),
                       0, H - band) & ~7)
        return (gy_t.reshape(bsz, ni * nj, 1, TILE_H * TILE_W),
                ys, s.astype(jnp.bfloat16))

    jglue = jax.jit(glue)
    print(f"wrapper glue alone    {timeit(jglue, stacked, gy, gx):7.2f} ms",
          flush=True)

    # 4/5/6: the FULL TrainAugment in both modes IN THIS SESSION, plus the
    # per-sample draw+grid program alone — locates whatever eats the
    # kernel's isolated win inside the full program.
    from stf_unet_tpu.core.config import DataConfig
    frames = jnp.asarray(rng.integers(0, 255, (B, 8, H, W)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (B, H, W)), jnp.uint8)
    sizes = jnp.asarray(np.full((B, 2), H), jnp.int32)
    for mode in ("point", "mxu"):
        with T.force_warp_mode(mode):
            aug = T.TrainAugment(DataConfig(base_size=H, crop_size=HO))
            ms = timeit(lambda k=jax.random.key(0):
                        aug(k, frames, masks, sizes))
        print(f"full augment {mode:6s}   {ms:7.2f} ms", flush=True)

    aug = T.TrainAugment(DataConfig(base_size=H, crop_size=HO))
    gyy2, gxx2 = jnp.meshgrid(jnp.arange(HO, dtype=jnp.float32),
                              jnp.arange(HO, dtype=jnp.float32),
                              indexing="ij")

    @jax.jit
    def draws_only(key):
        keys = jax.random.split(key, B)

        def one(k, size_i):
            params = T._sample_params(
                k, aug.min_size, aug.max_size, 0.5, 0.5, 0.5, 30.0,
                HO, size_i[0].astype(jnp.float32),
                size_i[1].astype(jnp.float32))
            return T._build_affine(*params)(gyy2, gxx2)
        return jax.vmap(one)(keys, sizes)
    print(f"draws+grids alone     {timeit(draws_only, jax.random.key(0)):7.2f} ms",
          flush=True)

    # 7. composed mimic: draws -> concat/cast -> kernel -> normalize, one
    # jit — if this matches (3)+(6) the TrainAugment path has overhead; if
    # it matches (5) the composition itself costs (XLA around the custom
    # call) and the next step is an xplane trace.
    @jax.jit
    def composed(key):
        gys, gxs = draws_only.__wrapped__(key)
        st = jnp.concatenate([frames, masks[:, None]], axis=1)
        bil, near = warp_bilinear_nearest_mxu(
            st, gys, gxs, sizes[:, 0], sizes[:, 1],
            max_inv_scale=2.0, sin_bound=0.5,
            alpha=1.0 / (255.0 * 0.127), beta=-0.709 / 0.127)
        return bil[:, :8][..., None], near.astype(jnp.int32)
    print(f"composed mimic        {timeit(composed, jax.random.key(0)):7.2f} ms",
          flush=True)

    if os.environ.get("STF_WARP_TRACE"):
        import glob
        import tempfile
        trace_dir = tempfile.mkdtemp(prefix="warptrace_")
        with T.force_warp_mode("mxu"):
            aug2 = T.TrainAugment(DataConfig(base_size=H, crop_size=HO))
            out = aug2(jax.random.key(0), frames, masks, sizes)
            sync(out[0])
            with jax.profiler.trace(trace_dir):
                for i in range(5):
                    out = aug2(jax.random.key(i), frames, masks, sizes)
                sync(out[0])
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from trace_top_ops import parse_xplane
        pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
        parse_xplane(pbs[0], 5, 25)


if __name__ == "__main__":
    main()
