"""Micro-bench for VERDICT r2 next-step 2 (shear-decomposed warp): is a
PER-ROW fractional shift (the shear primitive) cheaper than the per-pixel
tap gathers of the fused affine warp?

A rotation decomposes into 3 shears (Paeth); each shear shifts every row
(or column) by a scalar that varies only across rows — ~H indices per
image instead of H*W. Whether that wins depends entirely on how XLA/Mosaic
lower a dynamic per-row shift, so measure the candidate formulations:

  A  vmapped lax.dynamic_slice over rows      (dynamic-start slice per row)
  B  lax.gather of [1, W]-slices              (H slice-indices per image)
  C  flat per-pixel 2-tap gather              (the current warp's cost model,
                                               same traffic for comparison)
  D  jnp.take_along_axis with broadcast idx   (per-pixel, XLA-optimized)

Workload mirrors the augment program's hot shape: B=16 samples x 9
channels (8 frames + mask) x 224 rows, W=224 -> padded W+64, bf16 taps,
per-(sample,row) integer shift + fractional lerp weight.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_row_shift.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B, C, H, W = 16, 9, 224, 224
    PAD = 64  # max |shift| for ±30° rotation shears at 224 px
    Wp = W + PAD
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (B, C, H, Wp)), jnp.bfloat16)
    # per-(sample, row) shifts: linear in r like a real shear
    shifts_f = np.asarray(
        rng.uniform(0, PAD - 1, (B, 1)) * np.linspace(0, 1, H)[None, :],
        np.float32)
    k = jnp.asarray(np.floor(shifts_f), jnp.int32)       # [B, H]
    frac = jnp.asarray(shifts_f - np.floor(shifts_f), jnp.bfloat16)

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}

    # --- A: vmapped dynamic_slice per row --------------------------------
    @jax.jit
    def shear_dynslice(img, k, frac):
        def per_row(row, kk):          # row [Wp], kk scalar
            return lax.dynamic_slice(row, (kk,), (W + 1,))
        def per_image(im, kk):         # im [C, H, Wp], kk [H]
            # vmap rows; channels ride along via a second vmap
            return jax.vmap(lambda rows, s: jax.vmap(
                lambda r: per_row(r, s))(rows), in_axes=(1, 0), out_axes=1)(
                    im, kk)
        sl = jax.vmap(per_image)(img, k)          # [B, C, H, W+1]
        f = frac[:, None, :, None]
        return sl[..., :W] * (1 - f) + sl[..., 1:] * f

    results["A_vmap_dynamic_slice"] = timeit(shear_dynslice, img, k, frac)

    # --- B: gather of [1, W+1] slices ------------------------------------
    @jax.jit
    def shear_slice_gather(img, k, frac):
        # operand [B, C, H, Wp]; per (b, h) a start index into Wp.
        # Collapse (B, H) into gather batching via explicit index tuples.
        def per_bc(im_bc, kk):         # [H, Wp], [H]
            idx = kk[:, None]          # [H, 1] start per row
            g = lax.gather(
                im_bc, jnp.concatenate(
                    [jnp.arange(H, dtype=jnp.int32)[:, None], idx], axis=1),
                lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0, 1)),
                slice_sizes=(1, W + 1))
            return g                   # [H, W+1]
        g = jax.vmap(jax.vmap(per_bc, in_axes=(0, None)))(
            img, k)                    # [B, C, H, W+1]
        f = frac[:, None, :, None]
        return g[..., :W] * (1 - f) + g[..., 1:] * f

    results["B_slice_gather"] = timeit(shear_slice_gather, img, k, frac)

    # --- C: per-pixel flat 2-tap gather (current warp cost model) --------
    @jax.jit
    def shear_point_gather(img, k, frac):
        col = jnp.arange(W, dtype=jnp.int32)
        idx = k[:, None, :, None] + col[None, None, None, :]   # [B,1,H,W]
        flat = img.reshape(B, C, H * Wp)
        base = (jnp.arange(H, dtype=jnp.int32)[:, None] * Wp)[None, None]
        i0 = (idx + base).reshape(B, 1, H * W)
        t0 = jnp.take_along_axis(flat, jnp.broadcast_to(i0, (B, C, H * W)),
                                 axis=2).reshape(B, C, H, W)
        t1 = jnp.take_along_axis(flat, jnp.broadcast_to(i0 + 1,
                                                        (B, C, H * W)),
                                 axis=2).reshape(B, C, H, W)
        f = frac[:, None, :, None]
        return t0 * (1 - f) + t1 * f

    results["C_point_gather_2tap"] = timeit(shear_point_gather, img, k, frac)

    # --- D: roll-based two-candidate select ------------------------------
    # Per-row shift == elementwise select between... not expressible with a
    # global roll; instead use take_along_axis on the LAST axis with a
    # per-row index row (XLA sees a 1-D minor-axis gather per row).
    @jax.jit
    def shear_tal_lastaxis(img, k, frac):
        col = jnp.arange(W, dtype=jnp.int32)
        idx = k[:, None, :, None] + col[None, None, None, :]   # [B,1,H,W]
        idxb = jnp.broadcast_to(idx, (B, C, H, W))
        t0 = jnp.take_along_axis(img, idxb, axis=3)
        t1 = jnp.take_along_axis(img, idxb + 1, axis=3)
        f = frac[:, None, :, None]
        return t0 * (1 - f) + t1 * f

    results["D_take_along_last_axis"] = timeit(shear_tal_lastaxis, img, k,
                                               frac)

    # --- E: exact-bilinear width-2 slice pairs ---------------------------
    # The 4 bilinear taps pair into 2 flat-adjacent (i, i+1) reads: two
    # gathers of [C, 2] slices reproduce the IDENTICAL tap values with half
    # the gather indices. Measures whether per-index cost amortizes over
    # slice width (it does not — see results).
    HS, WS, HO, WO = 256, 256, 224, 224
    src = jnp.asarray(rng.integers(0, 255, (B, C, HS, WS)), jnp.bfloat16)
    gy = jnp.asarray(rng.uniform(0, HS - 1, (B, HO, WO)), jnp.float32)
    gx = jnp.asarray(rng.uniform(0, WS - 1, (B, HO, WO)), jnp.float32)

    @jax.jit
    def warp_slice_pairs(img, gy, gx):
        def one(im, yy, xx):
            flat = jnp.concatenate(
                [im.reshape(C, HS * WS), jnp.zeros((C, 1), im.dtype)], 1)
            y0 = jnp.floor(yy)
            x0 = jnp.floor(xx)
            wy = (yy - y0).astype(im.dtype).reshape(-1)[:, None]
            wx = (xx - x0).astype(im.dtype).reshape(-1)[:, None]
            yc0 = jnp.clip(y0, 0, HS - 1).astype(jnp.int32)
            yc1 = jnp.clip(y0 + 1, 0, HS - 1).astype(jnp.int32)
            xc = jnp.clip(x0, 0, WS - 1).astype(jnp.int32)

            def sg(idx):
                return lax.gather(
                    flat, idx.reshape(-1)[:, None],
                    lax.GatherDimensionNumbers(
                        offset_dims=(1, 2), collapsed_slice_dims=(),
                        start_index_map=(1,)),
                    slice_sizes=(C, 2))
            g0 = sg(yc0 * WS + xc)
            g1 = sg(yc1 * WS + xc)
            r0 = g0[..., 0] * (1 - wx) + g0[..., 1] * wx
            r1 = g1[..., 0] * (1 - wx) + g1[..., 1] * wx
            return (r0 * (1 - wy) + r1 * wy).T.reshape(C, HO, WO)
        return jax.vmap(one)(img, gy, gx)

    results["E_bilinear_slice_pairs"] = timeit(warp_slice_pairs, src, gy, gx)

    print(f"\nper-row shift [B{B} C{C} {H}x{W}] bf16 — ms per call")
    for name, ms in results.items():
        print(f"  {name:28s} {ms:8.2f} ms")
    tap_gather_ref = 17.0  # the 4-gather floor of the current warp (r2)
    print(f"  (current fused-warp gather floor ≈ {tap_gather_ref} ms for "
          f"4 taps; a shear pipeline needs ~3 shears x the best per-row "
          f"number above + 2 separable resize passes + 2 transposes)")


if __name__ == "__main__":
    main()
