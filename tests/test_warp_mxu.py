"""Pallas MXU warp kernel (ops/pallas/warp_kernel.py) vs the XLA gather
path — the STF_UNET_WARP_GATHER=mxu contract:

  * TARGETS (nearest-sampled mask) are BIT-IDENTICAL: the kernel's
    nearest weights are {0,1} one-hots, products and single-term sums
    are exact, and the banker's-rounded tap choice matches the gather
    path's select tree.
  * IMAGES match to the kernel's documented precision: the bilinear
    lerp weights ride the MXU as bf16 hi + bf16 residual (~2^-16
    relative weight error ≈ 0.01 of an intensity level), vs the gather
    path's f32 lerp. Tolerances below are ~5x that bound.

Runs in Pallas interpret mode on the CPU test mesh (same kernel code the
TPU executes, minus the Mosaic lowering).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stf_unet_tpu.core.config import DataConfig
from stf_unet_tpu.data import transforms as T
from stf_unet_tpu.ops.pallas.warp_kernel import (band_rows,
                                                 mxu_warp_supported,
                                                 warp_bilinear_nearest_mxu)


def _affine_grids(rng, n, ho, wo, src_h, src_w, max_deg=30.0,
                  min_frac=0.5, max_frac=1.2):
    """Genuine affine-family coords (the kernel's band bound assumes the
    DataConfig slope limits): random resize/flip/rotate/crop per sample,
    built through the SAME composition as training."""
    gys, gxs = [], []
    grid_y, grid_x = jnp.meshgrid(jnp.arange(ho, dtype=jnp.float32),
                                  jnp.arange(wo, dtype=jnp.float32),
                                  indexing="ij")
    for _ in range(n):
        r = rng.uniform(min_frac, max_frac) * min(src_h, src_w)
        scale = r / min(src_h, src_w)
        res_h = round(src_h * scale)
        res_w = round(src_w * scale)
        compose = T._build_affine(
            jnp.float32(scale), jnp.float32(res_h), jnp.float32(res_w),
            jnp.bool_(rng.random() < 0.5), jnp.bool_(rng.random() < 0.5),
            jnp.float32(np.radians(rng.uniform(-max_deg, max_deg))),
            jnp.float32(rng.integers(0, max(int(res_h - ho), 0) + 1)),
            jnp.float32(rng.integers(0, max(int(res_w - wo), 0) + 1)))
        gy, gx = compose(grid_y, grid_x)
        gys.append(gy)
        gxs.append(gx)
    return jnp.stack(gys), jnp.stack(gxs)


def _gather_oracle(stacked, gy, gx, valid_h, valid_w):
    """Per-sample point-gather reference (the production default path)."""
    def one(st, yy, xx, vh, vw):
        return T._warp_bilinear_and_nearest(
            st[:-1].astype(jnp.float32), st[-1].astype(jnp.float32),
            yy, xx, vh.astype(jnp.float32), vw.astype(jnp.float32))
    return jax.vmap(one)(stacked, gy, gx, valid_h, valid_w)


def test_mxu_kernel_matches_gather_oracle():
    rng = np.random.default_rng(3)
    b, c, h, w, ho, wo = 3, 4, 64, 64, 40, 40
    stacked = jnp.asarray(rng.integers(0, 256, (b, c + 1, h, w)),
                          jnp.float32)
    # sample 1: full valid; 2: padded canvas; 3: non-square valid
    valid_h = jnp.asarray([64, 50, 37], jnp.int32)
    valid_w = jnp.asarray([64, 48, 61], jnp.int32)
    gy, gx = _affine_grids(rng, b, ho, wo, h, w)

    bil_ref, near_ref = _gather_oracle(stacked, gy, gx, valid_h, valid_w)
    bil, near = warp_bilinear_nearest_mxu(
        stacked, gy, gx, valid_h, valid_w,
        max_inv_scale=2.0, sin_bound=0.5, interpret=True)

    assert near.shape == (b, ho, wo) and bil.shape == (b, c, ho, wo)
    np.testing.assert_array_equal(np.asarray(near), np.asarray(near_ref))
    np.testing.assert_allclose(np.asarray(bil), np.asarray(bil_ref),
                               atol=0.05)  # 0..255 scale


def test_mxu_kernel_nonaligned_output_and_fill():
    """Ho/Wo not tile multiples (edge-replicated pad, outputs sliced) and
    a nonzero nearest fill."""
    rng = np.random.default_rng(11)
    b, c, h, w, ho, wo = 2, 2, 48, 48, 29, 35
    stacked = jnp.asarray(rng.integers(0, 256, (b, c + 1, h, w)),
                          jnp.float32)
    valid_h = jnp.asarray([48, 20], jnp.int32)
    valid_w = jnp.asarray([31, 48], jnp.int32)
    gy, gx = _affine_grids(rng, b, ho, wo, h, w)

    def one(st, yy, xx, vh, vw):
        return T._warp_bilinear_and_nearest(
            st[:-1].astype(jnp.float32), st[-1].astype(jnp.float32),
            yy, xx, vh.astype(jnp.float32), vw.astype(jnp.float32),
            fill=255)
    bil_ref, near_ref = jax.vmap(one)(stacked, gy, gx, valid_h, valid_w)
    bil, near = warp_bilinear_nearest_mxu(
        stacked, gy, gx, valid_h, valid_w,
        max_inv_scale=2.0, sin_bound=0.5, fill=255.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(near), np.asarray(near_ref))
    np.testing.assert_allclose(np.asarray(bil), np.asarray(bil_ref),
                               atol=0.05)


def test_mxu_augment_matches_point_augment(monkeypatch):
    """Full TrainAugment: the mxu path draws the SAME key stream, so
    every geometric parameter matches the point path bit for bit;
    targets exact, images to the kernel tolerance (z-scored units)."""
    cfg = DataConfig(base_size=48, crop_size=32)
    rng = np.random.default_rng(5)
    b, t, src = 4, 3, 48
    frames = jnp.asarray(rng.integers(0, 256, (b, t, src, src)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (b, src, src)), jnp.uint8)
    sizes = np.full((b, 2), src, np.int32)
    sizes[1] = (40, 48)
    sizes[2] = (37, 31)
    sizes = jnp.asarray(sizes)
    key = jax.random.key(7)

    monkeypatch.setenv("STF_UNET_WARP_GATHER", "point")
    img_pt, tgt_pt = T.TrainAugment(cfg)(key, frames, masks, sizes)
    monkeypatch.setenv("STF_UNET_WARP_GATHER", "mxu")
    aug = T.TrainAugment(cfg)
    assert aug._use_mxu_warp(frames, None)
    img_mx, tgt_mx = aug(key, frames, masks, sizes)

    np.testing.assert_array_equal(np.asarray(tgt_mx), np.asarray(tgt_pt))
    # 0.01 intensity level = 0.01/255/std ≈ 3e-4 z-scored; 5x cushion
    np.testing.assert_allclose(np.asarray(img_mx), np.asarray(img_pt),
                               atol=1.5e-3)


def test_mxu_augment_with_pk_channels(monkeypatch):
    cfg = DataConfig(base_size=48, crop_size=32)
    rng = np.random.default_rng(9)
    b, t, src = 2, 3, 48
    frames = jnp.asarray(rng.integers(0, 256, (b, t, src, src)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (b, src, src)), jnp.uint8)
    pk = jnp.asarray(rng.integers(0, 256, (b, 3, src, src)), jnp.uint8)
    sizes = jnp.asarray(np.full((b, 2), src, np.int32))
    key = jax.random.key(1)

    monkeypatch.setenv("STF_UNET_WARP_GATHER", "point")
    img_pt, tgt_pt = T.TrainAugment(cfg)(key, frames, masks, sizes, pk)
    monkeypatch.setenv("STF_UNET_WARP_GATHER", "mxu")
    img_mx, tgt_mx = T.TrainAugment(cfg)(key, frames, masks, sizes, pk)
    assert img_mx.shape == img_pt.shape == (b, t + 3, 32, 32, 1)
    np.testing.assert_array_equal(np.asarray(tgt_mx), np.asarray(tgt_pt))
    np.testing.assert_allclose(np.asarray(img_mx), np.asarray(img_pt),
                               atol=1.5e-3)


def test_mxu_fallbacks(monkeypatch):
    """Paths the kernel does not cover quietly keep the point gathers."""
    monkeypatch.setenv("STF_UNET_WARP_GATHER", "mxu")
    frames = jnp.zeros((2, 3, 48, 48), jnp.uint8)
    # quirk mode (per-frame re-roll)
    aug = T.TrainAugment(DataConfig(base_size=48, crop_size=32,
                                    shared_frame_augmentation=False))
    assert not aug._use_mxu_warp(frames, None)
    # elastic offsets defeat the affine band bound
    aug = T.TrainAugment(DataConfig(base_size=48, crop_size=32,
                                    elastic_alpha=8.0))
    assert not aug._use_mxu_warp(frames, None)
    # oversized source exceeds the VMEM residency budget
    big = jnp.zeros((1, 40, 1024, 1024), jnp.uint8)
    aug = T.TrainAugment(DataConfig(base_size=1024, crop_size=224))
    assert not aug._use_mxu_warp(big, None)
    # ... and the full call still runs (point path) under mode=mxu
    masks = jnp.zeros((2, 48, 48), jnp.uint8)
    sizes = jnp.asarray(np.full((2, 2), 48, np.int32))
    aug = T.TrainAugment(DataConfig(base_size=48, crop_size=32,
                                    shared_frame_augmentation=False))
    img, tgt = aug(jax.random.key(0), frames, masks, sizes)
    assert img.shape == (2, 3, 32, 32, 1)


def test_band_rows_bounds():
    # default config shape: 2.0 inverse scale, 30 deg, 8x32 tile
    band = band_rows(8, 32, 2.0, 0.5, 256)
    assert band % 8 == 0 and band >= 2 * (7 + 0.5 * 31) + 2
    # capped at the full height for small sources (trivially covering)
    assert band_rows(8, 32, 2.0, 0.5, 32) == 32
    # no-rotation family needs only the row span
    assert band_rows(8, 32, 2.0, 0.0, 256) <= 24
    assert mxu_warp_supported(9, 256, 256, 2.0, 0.5)
    assert not mxu_warp_supported(40, 1024, 1024, 2.0, 0.5)


def test_mxu_warp_sharded_matches_single_device():
    """Under a data mesh the custom_partitioning wrapper runs the kernel
    per shard (no all-gather); results equal the unsharded run bitwise."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(21)
    b, c, h, w, ho, wo = 8, 3, 48, 48, 32, 32
    stacked = jnp.asarray(rng.integers(0, 256, (b, c + 1, h, w)),
                          jnp.float32)
    valid_h = jnp.full((b,), h, jnp.int32)
    valid_w = jnp.full((b,), w, jnp.int32)
    gy, gx = _affine_grids(rng, b, ho, wo, h, w)

    def run(st, yy, xx, vh, vw):
        return warp_bilinear_nearest_mxu(
            st, yy, xx, vh, vw, max_inv_scale=2.0, sin_bound=0.5,
            alpha=1.0 / 255.0, beta=-0.5, interpret=True)

    ref_bil, ref_near = jax.jit(run)(stacked, gy, gx, valid_h, valid_w)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    def shard(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    args = (shard(stacked, P("data")), shard(gy, P("data")),
            shard(gx, P("data")), shard(valid_h, P("data")),
            shard(valid_w, P("data")))
    with mesh:
        bil_s, near_s = jax.jit(run)(*args)
    np.testing.assert_array_equal(np.asarray(near_s), np.asarray(ref_near))
    np.testing.assert_array_equal(np.asarray(bil_s), np.asarray(ref_bil))


def test_mxu_kernel_odd_height_band_coverage():
    """Review-finding regression (r5): with h % 8 != 0 and band < h, the
    8-aligned band start could land below h - band and silently drop the
    bottom rows' taps (max error 250/255 before the fix). band_rows now
    extends the band by the clip-bound misalignment."""
    rng = np.random.default_rng(17)
    b, c, h, w, ho, wo = 2, 2, 60, 60, 32, 32
    stacked = jnp.asarray(rng.integers(0, 256, (b, c + 1, h, w)),
                          jnp.float32)
    valid_h = jnp.full((b,), h, jnp.int32)
    valid_w = jnp.full((b,), w, jnp.int32)
    # coords pinned to the BOTTOM of the source — the exact region the
    # unextended band lost
    gyy, gxx = jnp.meshgrid(jnp.linspace(52.0, 59.5, ho),
                            jnp.linspace(0.0, 59.0, wo), indexing="ij")
    gy = jnp.stack([gyy] * b)
    gx = jnp.stack([gxx] * b)

    bil_ref, near_ref = _gather_oracle(stacked, gy, gx, valid_h, valid_w)
    bil, near = warp_bilinear_nearest_mxu(
        stacked, gy, gx, valid_h, valid_w,
        max_inv_scale=2.0, sin_bound=0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(near), np.asarray(near_ref))
    np.testing.assert_allclose(np.asarray(bil), np.asarray(bil_ref),
                               atol=0.05)
    # Router policy: odd heights stay supported — h=60 extends to a
    # whole-height band, h=100 to a 60-row dynamic band whose
    # non-multiple-of-8 SIZE was chip-verified against Mosaic in r5
    # (only the dynamic START needs the multiple-of-8 proof).
    assert mxu_warp_supported(5, 60, 60, 2.0, 0.5)
    assert mxu_warp_supported(5, 100, 100, 2.0, 0.5)
    assert mxu_warp_supported(5, 64, 64, 2.0, 0.5)


def test_mxu_direct_branch_matches_partitioned():
    """The 8-virtual-device test harness makes the auto routing always
    take the custom_partitioning wrapper; pin the DIRECT single-device
    branch (what a 1-chip TPU run executes) against it explicitly."""
    rng = np.random.default_rng(23)
    b, c, h, w, ho, wo = 2, 3, 48, 48, 32, 32
    stacked = jnp.asarray(rng.integers(0, 256, (b, c + 1, h, w)),
                          jnp.float32)
    valid_h = jnp.full((b,), h, jnp.int32)
    valid_w = jnp.full((b,), w, jnp.int32)
    gy, gx = _affine_grids(rng, b, ho, wo, h, w)

    def run(part):
        return warp_bilinear_nearest_mxu(
            stacked, gy, gx, valid_h, valid_w, max_inv_scale=2.0,
            sin_bound=0.5, alpha=1 / 255.0, beta=-0.5, interpret=True,
            partitioned=part)
    bil_d, near_d = run(False)
    bil_p, near_p = run(True)
    np.testing.assert_array_equal(np.asarray(near_d), np.asarray(near_p))
    np.testing.assert_array_equal(np.asarray(bil_d), np.asarray(bil_p))


def test_mxu_augment_photometric_pk_parity(monkeypatch):
    """The photometric epilogue split (kernel folds only /255; jitter then
    normalize outside; PK channels renormalized separately) vs the point
    path — the most intricate epilogue logic in the mxu branch."""
    cfg = DataConfig(base_size=48, crop_size=32, brightness=0.3,
                     contrast=0.2, gamma_jitter=0.1, noise_std=0.01)
    rng = np.random.default_rng(31)
    b, t, src = 3, 3, 48
    frames = jnp.asarray(rng.integers(0, 256, (b, t, src, src)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (b, src, src)), jnp.uint8)
    pk = jnp.asarray(rng.integers(0, 256, (b, 3, src, src)), jnp.uint8)
    sizes = jnp.asarray(np.full((b, 2), src, np.int32))
    key = jax.random.key(13)

    monkeypatch.setenv("STF_UNET_WARP_GATHER", "point")
    img_pt, tgt_pt = T.TrainAugment(cfg)(key, frames, masks, sizes, pk)
    monkeypatch.setenv("STF_UNET_WARP_GATHER", "mxu")
    aug = T.TrainAugment(cfg)
    assert aug.photometric and aug._use_mxu_warp(frames, pk)
    img_mx, tgt_mx = aug(key, frames, masks, sizes, pk)
    np.testing.assert_array_equal(np.asarray(tgt_mx), np.asarray(tgt_pt))
    np.testing.assert_allclose(np.asarray(img_mx), np.asarray(img_pt),
                               atol=1.5e-3)
