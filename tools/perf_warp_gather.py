"""Benchmark formulations of the augmentation warp's bilinear gather.

The fused device augmentation samples [B,T,256,256] frames at 224² warped
coordinates (4 taps/pixel). XLA TPU point-gathers are slow; this harness
compares:
  2d      img[..., yc, xc]   (the pre-r2 formulation; 3252 ms measured —
          excluded by default, include with --with-2d)
  flat    img.reshape(T,-1)[..., yc*W+xc]  (single minor-axis gather;
          what data/transforms.py now does)
  take    jnp.take(flat, idx, axis=-1)
  matmul  exact row-banded two-stage contraction (per output row y:
          D_y = img @ Bx_y^T, out = sum_h A * D) — MXU formulation
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

B, T, H, W, CROP = 16, 8, 256, 256, 224


def make_coords(key):
    """Per-sample affine coords like the real warp (rotation+scale+crop)."""
    ang = jax.random.uniform(key, (B,), minval=-0.5, maxval=0.5)
    scale = jax.random.uniform(key, (B,), minval=0.8, maxval=1.2)
    cy = cx = H / 2.0
    y, x = jnp.meshgrid(jnp.arange(CROP, dtype=jnp.float32),
                        jnp.arange(CROP, dtype=jnp.float32), indexing="ij")
    cos = jnp.cos(ang)[:, None, None] * scale[:, None, None]
    sin = jnp.sin(ang)[:, None, None] * scale[:, None, None]
    gy = cos * (y - cy) + sin * (x - cx) + cy
    gx = -sin * (y - cy) + cos * (x - cx) + cx
    return gy, gx  # [B, CROP, CROP]


def bilinear_2d(img, gy, gx):
    y0 = jnp.floor(gy); x0 = jnp.floor(gx)
    wy = (gy - y0)[None]; wx = (gx - x0)[None]

    def tap(yy, xx):
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        return img[:, yc, xc]

    return (tap(y0, x0) * (1 - wy) * (1 - wx) + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx) + tap(y0 + 1, x0 + 1) * wy * wx)


def bilinear_flat(img, gy, gx):
    y0 = jnp.floor(gy); x0 = jnp.floor(gx)
    wy = (gy - y0)[None]; wx = (gx - x0)[None]
    flat = img.reshape(T, H * W)

    def tap(yy, xx):
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        return flat[:, yc * W + xc]

    return (tap(y0, x0) * (1 - wy) * (1 - wx) + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx) + tap(y0 + 1, x0 + 1) * wy * wx)


def bilinear_flat_bf16(img, gy, gx):
    """The production formulation (transforms._warp_bilinear_and_nearest):
    gather bf16 taps (half the gathered bytes; raw 0..255 values are
    bf16-exact), convert to f32 after — measured 1.76x over f32 taps."""
    return bilinear_flat(img.astype(jnp.bfloat16), gy, gx).astype(
        jnp.float32)


def bilinear_flat_u8(img, gy, gx):
    """uint8 taps: 4x fewer gathered bytes than f32 (2x under the shipped
    bf16). If the bf16 win (1.76x) was bandwidth, this buys more; if the
    ~7 ns/index floor is per-index, it measures flat — either way the
    next chip session gets the answer in one command. Raw-scale values
    are 0..255 integers, so the post-gather f32 promotion is exact."""
    return bilinear_flat(img.astype(jnp.uint8), gy, gx)


def bilinear_take(img, gy, gx):
    y0 = jnp.floor(gy); x0 = jnp.floor(gx)
    wy = (gy - y0)[None]; wx = (gx - x0)[None]
    flat = img.reshape(T, H * W)

    def tap(yy, xx):
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        return jnp.take(flat, (yc * W + xc).reshape(-1), axis=-1
                        ).reshape(T, CROP, CROP)

    return (tap(y0, x0) * (1 - wy) * (1 - wx) + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx) + tap(y0 + 1, x0 + 1) * wy * wx)


def bilinear_matmul(img, gy, gx):
    """Exact banded-matmul formulation.

    out[t,y,x] = sum_h tri(h-gy[y,x]) * sum_w tri(w-gx[y,x]) * img[t,h,w]
    computed per output row y:   Dx[t,h,x] = sum_w Bx[x,w] img[t,h,w]
                                 out[t,y,x] = sum_h A[x,h] Dx[t,h,x]
    """
    hh = jnp.arange(H, dtype=jnp.float32)

    def row(carry, inputs):
        gy_r, gx_r = inputs          # [CROP]
        bx = jnp.maximum(0.0, 1.0 - jnp.abs(hh[None, :] - gx_r[:, None]))
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(hh[None, :] - gy_r[:, None]))
        d = jnp.einsum("xw,thw->thx", bx, img)       # [T,H,CROP]
        out_r = jnp.einsum("xh,thx->tx", ay, d)      # [T,CROP]
        return carry, out_r

    _, rows = jax.lax.scan(row, None, (gy, gx))
    return rows.transpose(1, 0, 2)   # [T,CROP,CROP]


def bilinear_patch(img, gy, gx):
    """ONE lax.gather of [2,2] patches (all 4 taps per index): per-index
    overhead paid once instead of 4x. Starts clamp to H-2/W-2; the only
    points whose taps shift under that clamp have tap weight exactly 0."""
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = (gy - y0)[None]
    wx = (gx - x0)[None]
    ys = jnp.clip(y0, 0, H - 2).astype(jnp.int32)
    xs = jnp.clip(x0, 0, W - 2).astype(jnp.int32)
    starts = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)  # [N,2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(1, 2))
    patch = jax.lax.gather(img, starts, dn, slice_sizes=(T, 2, 2))
    # [N, T, 2, 2] -> [T, CROP, CROP, 2, 2]
    patch = patch.transpose(1, 0, 2, 3).reshape(T, CROP, CROP, 2, 2)
    v00 = patch[..., 0, 0]
    v01 = patch[..., 0, 1]
    v10 = patch[..., 1, 0]
    v11 = patch[..., 1, 1]
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def _lerp_from_window(patch_hw2x2t, wy, wx):
    """patch [CROP, CROP, 2, 2, T] -> lerp [T, CROP, CROP]."""
    v = jnp.moveaxis(patch_hw2x2t, -1, 0)  # [T, CROP, CROP, 2, 2]
    return (v[..., 0, 0] * (1 - wy) * (1 - wx)
            + v[..., 0, 1] * (1 - wy) * wx
            + v[..., 1, 0] * wy * (1 - wx)
            + v[..., 1, 1] * wy * wx)


def bilinear_patch_cm(img, gy, gx):
    """Channel-minor window gather — transforms.py's `patch` mode: operand
    [H, W*T], ONE index per output pixel, slice_sizes=(2, 2*T) = two
    CONTIGUOUS 2T-element runs (unlike bilinear_patch's (T,2,2), whose
    minor-axis slice of 2 scalarized catastrophically)."""
    src = jnp.moveaxis(img, 0, -1).reshape(H, W * T)
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = gy - y0
    wx = gx - x0
    ys = jnp.clip(y0, 0, H - 2).astype(jnp.int32)
    xs = jnp.clip(x0, 0, W - 2).astype(jnp.int32)
    starts = jnp.stack([ys.reshape(-1), (xs * T).reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    patch = jax.lax.gather(src, starts, dn, slice_sizes=(2, 2 * T))
    patch = patch.reshape(CROP, CROP, 2, 2, T)
    return _lerp_from_window(patch, wy[None], wx[None])


def bilinear_patch_hwc(img, gy, gx):
    """Window gather on [H, W, T] with slice_sizes=(2, 2, T): the minor
    axis is fully covered by the slice (constant offset 0), probing
    whether full-minor slices escape the small-minor-slice scalarization
    that killed bilinear_patch."""
    src = jnp.moveaxis(img, 0, -1)  # [H, W, T]
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = gy - y0
    wx = gx - x0
    ys = jnp.clip(y0, 0, H - 2).astype(jnp.int32)
    xs = jnp.clip(x0, 0, W - 2).astype(jnp.int32)
    starts = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.lax.gather(src, starts, dn, slice_sizes=(2, 2, T))
    patch = patch.reshape(CROP, CROP, 2, 2, T)
    return _lerp_from_window(patch, wy[None], wx[None])


def bilinear_rowpair(img, gy, gx):
    """TWO gathers (one per tap row) of (x0, x0+1) pairs on the flattened
    [T, H*W] layout, slice_sizes=(T, 2): halves the index count vs the
    production 4-point formulation with a minimal (2-element) minor
    slice — isolates whether per-index cost or minor-slice width rules."""
    flat = img.reshape(T, H * W)
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = (gy - y0)[None]
    wx = (gx - x0)[None]
    xs = jnp.clip(x0, 0, W - 2).astype(jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(1,))

    def row(yy):
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        starts = (yc * W + xs).reshape(-1, 1)
        pair = jax.lax.gather(flat, starts, dn, slice_sizes=(T, 2))
        return pair.reshape(CROP, CROP, T, 2)

    p0 = row(y0)
    p1 = row(y0 + 1)
    v00 = jnp.moveaxis(p0[..., 0], -1, 0)
    v01 = jnp.moveaxis(p0[..., 1], -1, 0)
    v10 = jnp.moveaxis(p1[..., 0], -1, 0)
    v11 = jnp.moveaxis(p1[..., 1], -1, 0)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--with-2d", action="store_true",
                    help="include the (very slow) 2-axis point-gather row")
    ap.add_argument("--with-patch", action="store_true",
                    help="include the (catastrophic, ~59 s/call) [2,2] "
                         "patch-gather row")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # integer-valued raw-scale pixels (0..255): exactly representable in
    # f32, bf16, AND uint8, so every dtype variant must match the f32
    # reference bit-for-bit and the err check stays meaningful.
    imgs = jnp.asarray(rng.integers(0, 256, size=(B, T, H, W)), jnp.float32)
    gy, gx = jax.jit(make_coords)(jax.random.key(0))
    gy = jnp.clip(gy, 0, H - 2)
    gx = jnp.clip(gx, 0, W - 2)

    fns = {
        **({"2d": bilinear_2d} if args.with_2d else {}),
        "flat": bilinear_flat,
        "flat_bf16": bilinear_flat_bf16,
        "flat_u8": bilinear_flat_u8,
        "take": bilinear_take,
        **({"patch": bilinear_patch} if args.with_patch else {}),
        "patch_cm": bilinear_patch_cm,
        "patch_cm_bf16": lambda i, y, x: bilinear_patch_cm(
            i.astype(jnp.bfloat16), y, x).astype(jnp.float32),
        "patch_hwc": bilinear_patch_hwc,
        "rowpair": bilinear_rowpair,
        "matmul": bilinear_matmul,
    }
    ref = None
    for name, fn in fns.items():
        batched = jax.jit(jax.vmap(fn))
        out = batched(imgs, gy, gx)
        jax.block_until_ready(out)
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
            if err > 1e-4:
                name += f"!(err {err:.2e})"
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = batched(imgs, gy, gx)
        float(out.sum())
        print(f"{name:10s} {(time.perf_counter() - t0) / args.iters * 1e3:9.2f} ms"
              f" for [B{B},T{T}] {H}²->{CROP}² bilinear warp")


if __name__ == "__main__":
    main()
