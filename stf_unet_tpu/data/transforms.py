"""Device-side batched preprocessing (TPU-native replacement for
ref:transforms.py + ref:train.py:51-74 presets).

Training augmentation is ONE fused affine warp per sample instead of the
reference's chain of PIL resamplings (RandomResize -> HFlip -> VFlip ->
RandomRotation -> RandomCrop, ref:train.py:56-67): the five geometric steps
compose into a single output-pixel -> source-pixel affine map, evaluated
once with bilinear (image) / nearest (mask) sampling at a FIXED 224x224
output shape — static shapes, one gather per pixel, jit-compiled, batched
over B and shared across the T frames.

Behavioral notes vs the reference:
  * One shared random draw across a sample's T frames — deliberately fixing
    the per-frame re-roll quirk of ref:my_dataset.py:173-179 (SURVEY.md §7).
  * A single resampling replaces three chained PIL resamplings (each of
    which rounds to uint8); the augmentation distribution is the same, the
    per-pixel values differ at the level PIL's own rounding does.
  * Eval-path resize keeps EXACT PIL short-edge parity via
    ops.resize.pil_resize_weights, since eval resampling affects metrics.

Normalization: x/255 -> (x - mean)/std with the BreaDM stats
(ref:train.py:146-148, ref:transforms.py:120-134).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.core.config import DataConfig
from stf_unet_tpu.ops.resize import pil_resize_weights, short_edge_size


def _tap_dtype() -> jnp.dtype:
    """Gather dtype for the fused warp's tap gathers. Raw-scale pixels are
    0..255 integers — exact in f32, bf16, and uint8 alike — so this is a
    pure performance knob with bit-identical output (pinned by
    tests/test_data.py::test_tap_dtype_variants_bit_identical).

    Which dtype gathers fastest is TOOLCHAIN-dependent, not architectural:
    the 2026-06 chip session measured bf16 taps 1.76x over f32 on isolated
    [T]-wide gathers; the 2026-08 session measured the inverse on the same
    microbench (f32 22.9 ms vs bf16 27.3 ms vs uint8 46.9 ms,
    tools/perf_warp_gather.py) — the gather lowering changed under us.
    The PRODUCTION program is indifferent (bf16 28.4 ms vs f32 29.0 ms
    augment, within noise): its single stacked [T+1]-channel gather is
    per-index-bound, so tap width barely matters. Default stays bf16;
    override with STF_UNET_TAP_DTYPE={f32,bf16,u8} and re-measure when
    the toolchain moves."""
    import os
    return {"f32": jnp.float32, "bf16": jnp.bfloat16, "u8": jnp.uint8}[
        os.environ.get("STF_UNET_TAP_DTYPE", "bf16")]


@functools.lru_cache(maxsize=64)
def _banded_resize_taps(in_size: int, out_size: int):
    """PIL's resize matrix (ops/resize.pil_resize_weights) is banded: each
    output row draws from a short contiguous run of input rows. Return
    (idx [out, K], wgt [out, K]) so the resample is a gather + K-tap
    weighted sum instead of a dense [out, in] matmul."""
    wm = pil_resize_weights(in_size, out_size)
    nz = wm != 0.0
    k = max(1, int(nz.sum(axis=1).max()))
    idx = np.zeros((out_size, k), np.intp)
    wgt = np.zeros((out_size, k), np.float64)
    for o in range(out_size):
        cols = np.nonzero(nz[o])[0]
        idx[o, :len(cols)] = cols
        wgt[o, :len(cols)] = wm[o, cols]
    return idx, wgt


def banded_resize_u8(x: np.ndarray, out_h: int, out_w: int,
                     idx_h: np.ndarray, wgt_h: np.ndarray,
                     idx_w: np.ndarray, wgt_w: np.ndarray,
                     force_numpy: bool = False) -> np.ndarray:
    """Apply precomputed banded PIL-parity resize taps to uint8 planes
    [N, H, W] -> [N, out_h, out_w]: f64 vertical then horizontal passes,
    round-half-even, clip. Dispatches to the native C++ kernel
    (native/decoder.cpp stf_banded_resize) when available; the numpy
    fallback accumulates in the same ascending-k order so both paths are
    bit-identical."""
    if not force_numpy:
        from stf_unet_tpu.data import native_loader
        if native_loader.native_available():
            return native_loader.banded_resize(
                x, out_h, out_w, idx_h, wgt_h, idx_w, wgt_w)
    xf = x.astype(np.float64)
    kh = idx_h.shape[1]
    y = np.zeros((x.shape[0], out_h, x.shape[2]), np.float64)
    for k in range(kh):
        y += wgt_h[None, :, k, None] * xf[:, idx_h[:, k], :]
    kw = idx_w.shape[1]
    z = np.zeros((x.shape[0], out_h, out_w), np.float64)
    for k in range(kw):
        z += wgt_w[None, None, :, k] * y[:, :, idx_w[:, k]]
    return np.clip(np.round(z), 0, 255).astype(np.uint8)


def normalize(img: jax.Array, mean: float, std: float) -> jax.Array:
    """uint8/float [0,255] -> normalized float32 (ToTensor + Normalize,
    ref:transforms.py:120-134)."""
    return (img.astype(jnp.float32) / 255.0 - mean) / std


# ---------------------------------------------------------------------------
# Fused affine-warp training augmentation
# ---------------------------------------------------------------------------

def _sample_params(key: jax.Array, cfg_min_size: int, cfg_max_size: int,
                   hflip_prob: float, vflip_prob: float, rotate_prob: float,
                   rotate_deg: float, crop: int, src_h: jax.Array,
                   src_w: jax.Array, force_rot: Optional[bool] = None):
    """Draw one sample's augmentation parameters (all scalars).

    force_rot (static) overrides the Bernoulli rotate decision WITHOUT
    changing any subkey consumption — the rotation-split path
    (rotation_split_apply) decides membership on the host from the SAME
    k[3] draw and then forces the branch it routed each sample to, so the
    per-sample draws stay identical to the single-program path."""
    k = jax.random.split(key, 6)
    # RandomResize: short edge -> r in [min, max] (ref:transforms.py:18-32).
    r = jax.random.randint(k[0], (), cfg_min_size, cfg_max_size + 1)
    short = jnp.minimum(src_h, src_w).astype(jnp.float32)
    scale = r.astype(jnp.float32) / short
    res_h = jnp.round(src_h.astype(jnp.float32) * scale)
    res_w = jnp.round(src_w.astype(jnp.float32) * scale)

    hflip = jax.random.uniform(k[1], ()) < hflip_prob
    vflip = jax.random.uniform(k[2], ()) < vflip_prob
    do_rot = jax.random.uniform(k[3], ()) < rotate_prob
    if force_rot is not None:
        do_rot = jnp.bool_(force_rot)
    angle = jnp.where(
        do_rot,
        jax.random.uniform(k[4], (), minval=-rotate_deg, maxval=rotate_deg),
        0.0,
    ) * (jnp.pi / 180.0)

    # RandomCrop offset in resized space; pad-to-crop when smaller
    # (ref:transforms.py:74-99 pads bottom/right with 0 then crops).
    max_y0 = jnp.maximum(res_h - crop, 0.0)
    max_x0 = jnp.maximum(res_w - crop, 0.0)
    u = jax.random.uniform(k[5], (2,))
    # randint(0, max) inclusive -> floor(u * (max+1)) clipped.
    y0 = jnp.minimum(jnp.floor(u[0] * (max_y0 + 1.0)), max_y0)
    x0 = jnp.minimum(jnp.floor(u[1] * (max_x0 + 1.0)), max_x0)
    return scale, res_h, res_w, hflip, vflip, angle, y0, x0


def _build_affine(scale, res_h, res_w, hflip, vflip, angle, y0, x0):
    """2x3 matrix mapping output pixel-center (y, x) -> source pixel coords.

    Inverse composition of: resize(scale) -> hflip -> vflip -> rotate(angle,
    center of resized image, expand=False) -> crop at (y0, x0).
    Coordinates are pixel centers; resize inverse uses the standard
    src = (p + 0.5)/scale - 0.5 center-aligned map.
    """
    cy = (res_h - 1.0) / 2.0
    cx = (res_w - 1.0) / 2.0
    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)

    # out -> rotated-resized coords: p_r = p + (y0, x0)
    # rotated -> flipped coords: the inverse of PIL rotate(angle)
    # (counterclockwise, about the pixel-center image center) in (row, col)
    # coordinates is [[cos, sin], [-sin, cos]] — verified against
    # Image.rotate to 1 intensity level (tests/test_data.py).
    m00, m01 = cos_a, sin_a
    m10, m11 = -sin_a, cos_a

    # flipped -> resized coords: y' = y (vflip: res_h-1-y), x' similarly.
    sy = jnp.where(vflip, -1.0, 1.0)
    oy = jnp.where(vflip, res_h - 1.0, 0.0)
    sx = jnp.where(hflip, -1.0, 1.0)
    ox = jnp.where(hflip, res_w - 1.0, 0.0)

    # resized -> source: s = (p + 0.5)/scale - 0.5
    inv = 1.0 / scale

    def compose(py, px):
        # crop
        ry = py + y0
        rx = px + x0
        # rotate about center
        fy = m00 * (ry - cy) + m01 * (rx - cx) + cy
        fx = m10 * (ry - cy) + m11 * (rx - cx) + cx
        # unflip
        uy = sy * fy + oy
        ux = sx * fx + ox
        # unresize
        gy = (uy + 0.5) * inv - 0.5
        gx = (ux + 0.5) * inv - 0.5
        return gy, gx

    return compose


def _bilinear_gather(img: jax.Array, gy: jax.Array, gx: jax.Array,
                     valid_h: jax.Array, valid_w: jax.Array) -> jax.Array:
    """Sample img [..., H, W] at float coords (gy, gx) [Ho, Wo]; out-of-range
    of the VALID region (original size before canvas padding) -> 0.

    Taps index the FLATTENED [H*W] minor axis: a 2-axis point gather
    (img[..., yc, xc]) scalarizes on TPU (isolated micro-bench: 3.25 s vs
    22 ms for the same taps at [B16,T8] 256²->224², tools/perf_warp_gather.py);
    the single minor-axis gather vectorizes."""
    h, w = img.shape[-2], img.shape[-1]
    flat = img.reshape(img.shape[:-2] + (h * w,))
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = gy - y0
    wx = gx - x0

    def tap(yy, xx):
        inside = ((yy >= 0) & (yy <= valid_h - 1) &
                  (xx >= 0) & (xx <= valid_w - 1))
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = flat[..., yc * w + xc]
        return vals * inside.astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy.astype(img.dtype)
    wx = wx.astype(img.dtype)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def _nearest_gather(img: jax.Array, gy: jax.Array, gx: jax.Array,
                    valid_h: jax.Array, valid_w: jax.Array,
                    fill: int = 0) -> jax.Array:
    h, w = img.shape[-2], img.shape[-1]
    yy = jnp.round(gy)
    xx = jnp.round(gx)
    inside = (yy >= 0) & (yy <= valid_h - 1) & (xx >= 0) & (xx <= valid_w - 1)
    yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
    # flattened single-axis gather: see _bilinear_gather
    vals = img.reshape(img.shape[:-2] + (h * w,))[..., yc * w + xc]
    return jnp.where(inside, vals, jnp.asarray(fill, dtype=img.dtype))


def _warp_gather_mode() -> str:
    """Gather strategy for the fused warp's 4 bilinear taps.

    The warp program is pinned at XLA's per-INDEX gather cost (~7 ns/index
    regardless of payload width, tools/perf_warp_gather.py), so the lever
    is index COUNT, not bytes:

      point      4 point gathers on the flattened [Cs, H*W] minor axis —
                 one index per tap per output pixel (4N indices).
      patch      ONE gather of the full 2x2 bilinear tap window per output
                 pixel (N indices, 4x fewer): channel-minor [H, W*Cs]
                 layout, slice_sizes=(2, 2*Cs). The four taps become
                 in-register selects over the window — bit-identical to
                 `point` by construction (pre-clamped starts + per-tap
                 row/col re-selection; pinned by
                 tests/test_data.py::test_warp_gather_modes_bit_identical).
      patch_chw  same one-index-per-pixel idea on the untransposed
                 [Cs, H, W] layout, slice_sizes=(Cs, 2, 2) — measures
                 whether the 2-axis slice lowers as badly as the 2-axis
                 POINT gather did (3.25 s; see _bilinear_gather note).
      mxu        sidestep the gather unit entirely: the shared-frame
                 batched path routes through the Pallas one-hot-matmul
                 warp kernel (ops/pallas/warp_kernel.py) — per output
                 tile, a dynamic source row-band hit by sparse bilinear
                 weight matrices on the MXU. Chip A/B (r5 §1): the point
                 gather is at XLA's formulation floor (26.8 ms), so the
                 MXU kernel is the only formulation that moves the warp.
                 Paths the kernel does not cover (per-frame re-roll quirk
                 mode, elastic offsets, rotation-split, oversized
                 sources) fall back to point gathers.

    Override with STF_UNET_WARP_GATHER={point,patch,patch_chw,mxu}; the
    default is `mxu`, the mode measured fastest on the production chip
    (augment 26.5 -> 6.4 ms, fused UNet step 65.3 -> 44.3 ms, fused
    flagship 59.2 -> 37.8 ms, PERFORMANCE.md round 5 §2) — re-measure
    when the toolchain moves. The DEFAULT only engages the kernel on a
    real TPU backend (_use_mxu_warp); an EXPLICIT env request also runs
    on CPU via the interpret mode (that is what the test suite does)."""
    import os
    mode = os.environ.get("STF_UNET_WARP_GATHER", "") or "mxu"
    if mode not in ("point", "patch", "patch_chw", "mxu"):
        raise ValueError(f"STF_UNET_WARP_GATHER={mode!r} not in "
                         "{'point','patch','patch_chw','mxu'}")
    return mode


@contextlib.contextmanager
def force_warp_mode(mode: str):
    """Temporarily pin STF_UNET_WARP_GATHER (restoring the previous value,
    including unset) — the shared helper for tools/dryruns that A/B warp
    modes; the mode is read at TRACE time, so build the TrainAugment /
    jitted program INSIDE the context."""
    import os
    prev = os.environ.get("STF_UNET_WARP_GATHER")
    os.environ["STF_UNET_WARP_GATHER"] = mode
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("STF_UNET_WARP_GATHER", None)
        else:
            os.environ["STF_UNET_WARP_GATHER"] = prev


def _patch_window_taps(stacked: jax.Array, gy: jax.Array, gx: jax.Array,
                       mode: str):
    """Fetch each output pixel's full 2x2 bilinear tap window with ONE
    gather index (vs 4 point-gather indices), then reconstruct the four
    taps as selects over the window.

    Bit-identity with the point taps: starts are pre-clamped to
    [0, size-2] so the window always contains BOTH clipped tap
    coordinates of each axis — clip(yy, 0, h-1) - clip(floor(gy), 0, h-2)
    is provably in {0, 1} for yy in {y0, y0+1} — so selecting the window
    row/col by that offset reproduces flat[clip(yy), clip(xx)] exactly.

    Returns tap(yy, xx) -> (vals f32 [Cs, Ho, Wo] zeroed outside the
    valid region closure, inside bool [Ho, Wo]) plus (y0, x0) floors."""
    cs, h, w = stacked.shape
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    y0c = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    if mode == "patch":
        # channel-minor layout: the 2x2xCs window is two contiguous
        # 2*Cs-element runs -> slice_sizes=(2, 2*Cs), one index per pixel
        src = jnp.moveaxis(stacked, 0, -1).reshape(h, w * cs)
        starts = jnp.stack([y0c.reshape(-1), (x0c * cs).reshape(-1)],
                           axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        patch = jax.lax.gather(src, starts, dn, slice_sizes=(2, 2 * cs),
                               mode=jax.lax.GatherScatterMode.CLIP)
        patch = patch.reshape(gy.shape + (2, 2, cs)).astype(jnp.float32)
    else:  # patch_chw
        starts = jnp.stack([y0c.reshape(-1), x0c.reshape(-1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(1, 2))
        patch = jax.lax.gather(stacked, starts, dn,
                               slice_sizes=(cs, 2, 2),
                               mode=jax.lax.GatherScatterMode.CLIP)
        # [N, Cs, 2, 2] -> [Ho, Wo, 2, 2, Cs]
        patch = jnp.moveaxis(patch.reshape(gy.shape + (cs, 2, 2)),
                             2, -1).astype(jnp.float32)

    def window_tap(yy, xx, valid_h, valid_w):
        inside = ((yy >= 0) & (yy <= valid_h - 1) &
                  (xx >= 0) & (xx <= valid_w - 1))
        ry = jnp.clip(yy, 0, h - 1).astype(jnp.int32) - y0c  # in {0, 1}
        rx = jnp.clip(xx, 0, w - 1).astype(jnp.int32) - x0c
        row = jnp.where((ry == 0)[..., None, None], patch[..., 0, :, :],
                        patch[..., 1, :, :])
        v = jnp.where((rx == 0)[..., None], row[..., 0, :], row[..., 1, :])
        v = jnp.moveaxis(v, -1, 0)  # [Cs, Ho, Wo]
        return v * inside.astype(jnp.float32), inside

    return window_tap, y0, x0


def _warp_bilinear_and_nearest(chans: jax.Array, mask_f: jax.Array,
                               gy: jax.Array, gx: jax.Array,
                               valid_h: jax.Array, valid_w: jax.Array,
                               fill: int = 0):
    """Fused warp: bilinear-sample chans [C, H, W] AND nearest-sample the
    mask [H, W] from ONE set of 4 tap gathers (the mask rides as an extra
    gathered channel). The point-gathers dominate the augment program
    (~7 ns/index regardless of width, tools/perf_warp_gather.py), so a
    separate 1-wide mask gather costs as much as all frame taps together —
    folding it in removes that gather entirely.

    Nearest parity with _nearest_gather: the chosen tap is
    (round(gy), round(gx)) — jnp.round's banker's rounding reproduced via
    `round(g) != floor(g)` tap selection; out-of-valid -> fill.

    Gathered values convert to f32 right after the gather and ALL
    arithmetic runs in f32, so callers may pass chans/mask in any dtype
    that holds 0..255 integers exactly (f32/bf16/uint8) and the result is
    bit-identical; which gathers fastest is toolchain-dependent — see
    _tap_dtype.
    Returns f32 (bilinear chans [C, Ho, Wo], nearest mask [Ho, Wo])."""
    h, w = chans.shape[-2], chans.shape[-1]
    stacked = jnp.concatenate([chans, mask_f[None].astype(chans.dtype)],
                              axis=0)
    mode = _warp_gather_mode()
    if mode in ("patch", "patch_chw") and h >= 2 and w >= 2:
        window_tap, y0, x0 = _patch_window_taps(stacked, gy, gx, mode)
        tap = lambda yy, xx: window_tap(yy, xx, valid_h, valid_w)
        wy = gy - y0
        wx = gx - x0
    else:
        flat = stacked.reshape(stacked.shape[0], h * w)
        y0 = jnp.floor(gy)
        x0 = jnp.floor(gx)
        wy = gy - y0
        wx = gx - x0

        def tap(yy, xx):
            inside = ((yy >= 0) & (yy <= valid_h - 1) &
                      (xx >= 0) & (xx <= valid_w - 1))
            yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            vals = flat[:, yc * w + xc].astype(jnp.float32)
            return vals * inside.astype(jnp.float32), inside

    v00, in00 = tap(y0, x0)
    v01, in01 = tap(y0, x0 + 1)
    v10, in10 = tap(y0 + 1, x0)
    v11, in11 = tap(y0 + 1, x0 + 1)
    wyc = wy[None]
    wxc = wx[None]
    bil = (v00 * (1 - wyc) * (1 - wxc) + v01 * (1 - wyc) * wxc
           + v10 * wyc * (1 - wxc) + v11 * wyc * wxc)[:-1]
    sy = jnp.round(gy) != y0
    sx = jnp.round(gx) != x0
    near = jnp.where(sy, jnp.where(sx, v11[-1], v10[-1]),
                     jnp.where(sx, v01[-1], v00[-1]))
    inside_r = jnp.where(sy, jnp.where(sx, in11, in10),
                         jnp.where(sx, in01, in00))
    near = jnp.where(inside_r, near, jnp.float32(fill))
    return bil, near


def _separable_axis_aligned(chans: jax.Array, mask: jax.Array,
                            gy: jax.Array, gx: jax.Array,
                            valid_h: jax.Array, valid_w: jax.Array):
    """Axis-aligned counterpart of _warp_bilinear_and_nearest: when the
    affine has NO rotation, gy depends only on the output row and gx only
    on the output column, so the bilinear warp factors into a vertical
    2-tap row-slice gather followed by a horizontal 2-tap column-slice
    gather — slice gathers vectorize on TPU where the per-pixel point
    gathers of the general warp are per-index-bound
    (tools/perf_row_shift.py: 3.5 ms/pass vs ~17 ms for the point-gather
    warp at [B16,T8] 256²→224²).

    chans [C, H, W] in any dtype holding 0..255 exactly, mask [H, W];
    gy [Ho], gx [Wo] float source coords. Out-of-valid taps contribute 0,
    exactly like the fused warp: its per-tap validity in_y&in_x equals the
    product of the separable passes' row/column validities. Returns
    (bilinear chans f32 [C, Ho, Wo], nearest mask f32 [Ho, Wo])."""
    h, w = chans.shape[-2], chans.shape[-1]
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = (gy - y0).astype(jnp.float32)
    wx = (gx - x0).astype(jnp.float32)

    def row_tap(yy):
        inside = (yy >= 0) & (yy <= valid_h - 1)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        vals = chans[:, yc, :].astype(jnp.float32)  # [C, Ho, W]
        return vals * inside.astype(jnp.float32)[None, :, None]

    vert = (row_tap(y0) * (1 - wy)[None, :, None]
            + row_tap(y0 + 1) * wy[None, :, None])

    def col_tap(xx):
        inside = (xx >= 0) & (xx <= valid_w - 1)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return vert[:, :, xc] * inside.astype(jnp.float32)[None, None, :]

    bil = (col_tap(x0) * (1 - wx)[None, None, :]
           + col_tap(x0 + 1) * wx[None, None, :])

    # Nearest mask: mask[round(gy), round(gx)], 0 outside the valid region
    # (same banker's rounding as the fused warp's tap selection).
    ry = jnp.round(gy)
    rx = jnp.round(gx)
    in_y = (ry >= 0) & (ry <= valid_h - 1)
    in_x = (rx >= 0) & (rx <= valid_w - 1)
    m_rows = mask[jnp.clip(ry, 0, h - 1).astype(jnp.int32), :]
    m_rows = jnp.where(in_y[:, None], m_rows.astype(jnp.float32), 0.0)
    near = m_rows[:, jnp.clip(rx, 0, w - 1).astype(jnp.int32)]
    near = jnp.where(in_x[None, :], near, 0.0)
    return bil, near


def _elastic_offsets(key: jax.Array, crop: int, alpha: float, grid: int,
                     prob: float) -> Tuple[jax.Array, jax.Array]:
    """Per-sample elastic displacement field (dy, dx) [crop, crop] in
    source-space pixels: a [grid, grid, 2] normal control field scaled by
    alpha, bilinearly upsampled — the control-grid form of Simard elastic
    augmentation (grid spacing plays the role of the Gaussian sigma;
    coarse grid = smooth, large-scale deformation). Zeroed with
    probability 1-prob."""
    k_field, k_apply = jax.random.split(key)
    field = jax.random.normal(k_field, (grid, grid, 2)) * alpha
    on = (jax.random.uniform(k_apply, ()) < prob).astype(jnp.float32)
    field = jax.image.resize(field, (crop, crop, 2), method="linear") * on
    return field[..., 0], field[..., 1]


def _photometric(key: jax.Array, v: jax.Array, cfg: DataConfig) -> jax.Array:
    """Photometric jitter on [0,1] intensities [T, H, W]; one draw per
    sample shared across T (temporal-difference semantics preserved).
    Only the knobs that are enabled contribute ops (config is static)."""
    k = jax.random.split(key, 4)
    if cfg.brightness > 0.0:
        f = jax.random.uniform(k[0], (), minval=1.0 - cfg.brightness,
                               maxval=1.0 + cfg.brightness)
        v = v * f
    if cfg.contrast > 0.0:
        f = jax.random.uniform(k[1], (), minval=1.0 - cfg.contrast,
                               maxval=1.0 + cfg.contrast)
        m = v.mean()
        v = (v - m) * f + m
    if cfg.gamma_jitter > 0.0:
        f = jax.random.uniform(k[2], (), minval=1.0 - cfg.gamma_jitter,
                               maxval=1.0 + cfg.gamma_jitter)
        v = jnp.clip(v, 1e-6, 1.0) ** f
    if cfg.noise_std > 0.0:
        v = v + jax.random.normal(k[3], v.shape) * cfg.noise_std
    return jnp.clip(v, 0.0, 1.0)


class TrainAugment:
    """Batched fused augmentation. Call with a raw uint8 host batch."""

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.min_size = int(0.5 * cfg.base_size)   # ref:train.py:59
        self.max_size = int(1.2 * cfg.base_size)
        self.crop = cfg.crop_size
        # Beyond-reference augmentations (default off). When any is on,
        # the per-sample key splits into geometry/elastic/photometric
        # streams; when all are off the key handling — and hence every
        # drawn augmentation — is bit-identical to earlier releases.
        self.photometric = (cfg.brightness > 0.0 or cfg.contrast > 0.0
                            or cfg.gamma_jitter > 0.0 or cfg.noise_std > 0.0)
        self.elastic = cfg.elastic_alpha > 0.0
        if self.elastic and not cfg.shared_frame_augmentation:
            print("note: elastic deformation requires shared-frame "
                  "augmentation; ignoring --data-elastic-alpha in the "
                  "per-frame re-roll quirk mode")
            self.elastic = False
        self.extended = self.photometric or self.elastic
        self._flags_cache: dict = {}  # bsz -> jitted host rotate-flag fn

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, key: jax.Array, frames: jax.Array, masks: jax.Array,
                 sizes: jax.Array, pk: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """frames [B,T,H,W] uint8, masks [B,H,W] uint8, sizes [B,2],
        pk [B,3,H,W] or None ->
        (images [B, T(+3), crop, crop, 1] float32 normalized,
         targets [B, crop, crop] int32).
        PK maps ride as extra pseudo-time-steps (ref:my_dataset.py:226-227).
        """
        bsz = frames.shape[0]
        keys = jax.random.split(key, bsz)
        crop = self.crop
        grid_y, grid_x = jnp.meshgrid(
            jnp.arange(crop, dtype=jnp.float32),
            jnp.arange(crop, dtype=jnp.float32), indexing="ij")

        if self._use_mxu_warp(frames, pk):
            return self._mxu_batch(keys, frames, masks, sizes, pk,
                                   grid_y, grid_x)

        def one(k, frames_i, mask_i, size_i, pk_i):
            src_h = size_i[0].astype(jnp.float32)
            src_w = size_i[1].astype(jnp.float32)
            if self.extended:  # static: default path keeps k untouched
                k, k_el, k_ph = jax.random.split(k, 3)

            def draw(kk):
                params = _sample_params(
                    kk, self.min_size, self.max_size, self.cfg.hflip_prob,
                    self.cfg.vflip_prob, self.cfg.rotate_prob,
                    self.cfg.rotate_degrees, crop, src_h, src_w)
                return _build_affine(*params)(grid_y, grid_x)

            if self.cfg.shared_frame_augmentation:
                # One draw for the whole sample (documented fix of the
                # reference's per-frame re-roll, ref:my_dataset.py:173-179).
                # Frames, PK maps, and the nearest-sampled mask all share
                # ONE set of tap gathers (_warp_bilinear_and_nearest),
                # gathered at RAW uint8 scale in the measured-fastest tap
                # dtype (_tap_dtype: integers 0..255 are exact in every
                # candidate) and normalized after.
                gy, gx = draw(k)
                if self.elastic:
                    # Source-space displacement shared by the bilinear
                    # frame taps AND the nearest mask tap (same gy/gx), so
                    # labels deform with the image.
                    dy, dx = _elastic_offsets(
                        k_el, crop, self.cfg.elastic_alpha,
                        self.cfg.elastic_grid, self.cfg.elastic_prob)
                    gy = gy + dy
                    gx = gx + dx
                raw = frames_i if pk_i is None else jnp.concatenate(
                    [frames_i, pk_i], axis=0)
                td = _tap_dtype()
                warped_all, near = _warp_bilinear_and_nearest(
                    raw.astype(td), mask_i.astype(td),
                    gy, gx, src_h, src_w)
                warped = warped_all[:frames_i.shape[0]] / 255.0
                if pk_i is not None:
                    pk_w = warped_all[frames_i.shape[0]:] / 255.0
                tgt = near.astype(jnp.int32)
            else:
                # Reference-faithful quirk mode: every frame (and every PK
                # map) re-rolls its own transform; the mask follows frame 0.
                img = frames_i.astype(jnp.float32) / 255.0
                pk_f = (pk_i.astype(jnp.float32) / 255.0
                        if pk_i is not None else None)
                n_draws = img.shape[0] + (pk_f.shape[0] if pk_f is not None else 0)
                keys_f = jax.random.split(k, n_draws)
                gys, gxs = jax.vmap(draw)(keys_f)
                warped = jax.vmap(
                    lambda fr, yy, xx: _bilinear_gather(fr, yy, xx, src_h, src_w)
                )(img, gys[:img.shape[0]], gxs[:img.shape[0]])
                if pk_f is not None:
                    warped_pk = jax.vmap(
                        lambda fr, yy, xx: _bilinear_gather(fr, yy, xx,
                                                            src_h, src_w)
                    )(pk_f, gys[img.shape[0]:], gxs[img.shape[0]:])
                    pk_w = warped_pk
                gy, gx = gys[0], gxs[0]  # mask follows frame 0 (ref:173)
                tgt = _nearest_gather(mask_i.astype(jnp.int32), gy, gx,
                                      src_h, src_w, fill=0)

            if self.photometric:  # frames only; PK maps/mask untouched
                warped = _photometric(k_ph, warped, self.cfg)
            warped = (warped - self.cfg.mean) / self.cfg.std
            if pk_i is not None:
                pk_w = (pk_w - self.cfg.mean) / self.cfg.std
                warped = jnp.concatenate([warped, pk_w], axis=0)
            return warped, tgt

        if pk is None:
            images, targets = jax.vmap(
                lambda k, f, m, s: one(k, f, m, s, None))(
                keys, frames, masks, sizes)
        else:
            images, targets = jax.vmap(one)(keys, frames, masks, sizes, pk)
        return images[..., None], targets

    # ------------------------------------------------------------------
    # MXU warp path (STF_UNET_WARP_GATHER=mxu): the batched Pallas
    # one-hot-matmul kernel replaces the per-sample tap gathers. Same
    # key stream, same draws, same epilogue as the vmap path above;
    # targets are bit-identical, images carry the kernel's documented
    # ~2^-16-relative lerp-weight profile (tests/test_warp_mxu.py).
    # ------------------------------------------------------------------

    def _use_mxu_warp(self, frames: jax.Array,
                      pk: Optional[jax.Array]) -> bool:
        import os
        if _warp_gather_mode() != "mxu":
            return False
        if not self.cfg.shared_frame_augmentation or self.elastic:
            return False  # per-frame re-roll / per-pixel offsets: point path
        if (os.environ.get("STF_UNET_WARP_GATHER", "") != "mxu"
                and jax.default_backend() != "tpu"):
            # mxu is the DEFAULT only where it was measured (a real TPU);
            # on CPU/GPU the interpret-mode kernel would be slower than
            # the gathers, so the default quietly keeps the point path —
            # an explicit env request still forces the kernel (tests).
            return False
        from stf_unet_tpu.ops.pallas.warp_kernel import mxu_warp_supported
        h, w = frames.shape[-2], frames.shape[-1]
        cs = frames.shape[1] + (pk.shape[1] if pk is not None else 0) + 1
        return mxu_warp_supported(cs, h, w, *self._mxu_bounds(h))

    def _mxu_bounds(self, src_h: int) -> Tuple[float, float]:
        """Static slope bounds of the affine family for the band size:
        inverse-scale ≤ canvas/min_resize (ref:train.py:59's 0.5 floor),
        |sin| ≤ sin(max rotation)."""
        import math
        max_inv = src_h / float(self.min_size)
        sin_b = (math.sin(math.radians(min(abs(self.cfg.rotate_degrees),
                                           90.0)))
                 if self.cfg.rotate_prob > 0.0 else 0.0)
        return max_inv, sin_b

    def _mxu_batch(self, keys, frames, masks, sizes, pk, grid_y, grid_x):
        from stf_unet_tpu.ops.pallas.warp_kernel import (
            warp_bilinear_nearest_mxu)
        crop = self.crop

        def grids_one(k, size_i):
            # EXACT key handling of one(): the extended split happens
            # before the draw, so every drawn parameter matches the
            # gather path bit for bit.
            if self.extended:
                k, _k_el, k_ph = jax.random.split(k, 3)
            else:
                k_ph = k  # unused
            src_h = size_i[0].astype(jnp.float32)
            src_w = size_i[1].astype(jnp.float32)
            params = _sample_params(
                k, self.min_size, self.max_size, self.cfg.hflip_prob,
                self.cfg.vflip_prob, self.cfg.rotate_prob,
                self.cfg.rotate_degrees, crop, src_h, src_w)
            gy, gx = _build_affine(*params)(grid_y, grid_x)
            return gy, gx, k_ph

        gys, gxs, kphs = jax.vmap(grids_one)(keys, sizes)
        nch = frames.shape[1]
        raw = frames if pk is None else jnp.concatenate([frames, pk], axis=1)
        stacked = jnp.concatenate([raw, masks[:, None]], axis=1)
        max_inv, sin_b = self._mxu_bounds(frames.shape[-2])
        # Fold the /255 + normalize into the kernel's epilogue (an XLA
        # pass re-reading the warped batch costs real milliseconds);
        # photometric jitter needs raw [0,1] values, so that path folds
        # only the /255 and normalizes after the jitter.
        if self.photometric:
            alpha, beta = 1.0 / 255.0, 0.0
        else:
            alpha = 1.0 / (255.0 * self.cfg.std)
            beta = -self.cfg.mean / self.cfg.std
        bil, near = warp_bilinear_nearest_mxu(
            stacked, gys, gxs, sizes[:, 0], sizes[:, 1],
            max_inv_scale=max_inv, sin_bound=sin_b,
            alpha=alpha, beta=beta,
            interpret=jax.default_backend() != "tpu")
        warped = bil[:, :nch]
        if self.photometric:
            warped = jax.vmap(
                lambda kk, v: _photometric(kk, v, self.cfg))(kphs, warped)
            warped = (warped - self.cfg.mean) / self.cfg.std
        if pk is not None:
            pk_w = bil[:, nch:]
            if self.photometric:  # kernel left PK at [0,1]; mask untouched
                pk_w = (pk_w - self.cfg.mean) / self.cfg.std
            warped = jnp.concatenate([warped, pk_w], axis=1)
        return warped[..., None], near.astype(jnp.int32)

    # ------------------------------------------------------------------
    # Rotation-probability split (p(rotate)=0.5, ref:transforms.py:137-157:
    # HALF of all samples need no per-pixel warp — an axis-aligned
    # resize+flip+crop is a separable 2-pass slice gather). The batch is
    # routed on the HOST into a full-size separable program plus a
    # fixed-bucket warp program for the rotated samples; both fuse into
    # the train step. Membership comes from replaying the SAME threefry
    # k[3] draw on the CPU backend (threefry is backend-deterministic), so
    # the augmentation distribution is unchanged.
    # ------------------------------------------------------------------

    @property
    def can_rotation_split(self) -> bool:
        """Split mode needs the shared-frame draw (the quirk mode re-rolls
        per frame), no elastic field (per-pixel offsets defeat
        separability), and a rotate probability strictly inside (0, 1)."""
        return (self.cfg.shared_frame_augmentation and not self.elastic
                and 0.0 < self.cfg.rotate_prob < 1.0)

    @staticmethod
    def rotation_bucket_sizes(bsz: int) -> Tuple[int, ...]:
        """Static bucket ladder for the warp sub-batch: quartile sizes →
        at most 4 compiled variants of the fused step per batch size."""
        import math
        return tuple(sorted({max(1, math.ceil(bsz * q))
                             for q in (0.25, 0.5, 0.75, 1.0)}))

    def _host_flags_fn(self, bsz: int):
        """One CPU-jitted program per batch size covering the WHOLE
        per-step derivation (augment_key fold-ins + per-sample k[3]
        Bernoulli): eager per-op dispatch on this 1-core host costs
        ~30 ms/step, a single jitted call ~0.1 ms."""
        fn = self._flags_cache.get(bsz)
        if fn is None:
            from stf_unet_tpu.core.prng import augment_key
            extended = self.extended
            p = self.cfg.rotate_prob

            def flags_fn(root, epoch, step):
                keys = jax.random.split(augment_key(root, epoch, step), bsz)

                def flag(k):
                    if extended:
                        k = jax.random.split(k, 3)[0]
                    k6 = jax.random.split(k, 6)
                    # the EXACT k[3] Bernoulli _sample_params draws
                    return jax.random.uniform(k6[3], ()) < p

                return jax.vmap(flag)(keys)

            fn = jax.jit(flags_fn)
            self._flags_cache[bsz] = fn
        return fn

    def rotation_bucket(self, root_cpu: jax.Array, epoch: int, step: int,
                        bsz: int) -> np.ndarray:
        """Host-side routing for one batch: replay the rotate draws for
        augment_key(root, epoch, step) and return the padded int32 index
        bucket of rotated samples (pad value = bsz, dropped by the scatter
        and clamped by the gather). `root_cpu` MUST be committed to a CPU
        device so the replay never enqueues onto (and syncs with) the
        accelerator stream; threefry is backend-deterministic, so the CPU
        flags equal the device program's own k[3] draws bit-for-bit."""
        flags = np.asarray(self._host_flags_fn(bsz)(root_cpu, epoch, step))
        idx = np.nonzero(flags)[0]
        size = bsz
        for s in self.rotation_bucket_sizes(bsz):
            if s >= len(idx):
                size = s
                break
        out = np.full((size,), bsz, np.int32)
        out[:len(idx)] = idx
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def rotation_split_apply(self, key: jax.Array, frames: jax.Array,
                             masks: jax.Array, sizes: jax.Array,
                             rot_idx: jax.Array,
                             pk: Optional[jax.Array] = None
                             ) -> Tuple[jax.Array, jax.Array]:
        """Split-mode augmentation: the separable axis-aligned program runs
        on ALL samples (cheap slice gathers); the per-pixel warp runs only
        on the `rot_idx` bucket and its outputs overwrite the separable
        ones. Bit-parity with __call__: rotated samples take the identical
        warp code path with identical draws; unrotated samples compute the
        same bilinear sum in a different association order (≤1 ulp at
        uint8 scale — tests/test_data.py pins the tolerance)."""
        bsz = frames.shape[0]
        crop = self.crop
        keys = jax.random.split(key, bsz)
        td = _tap_dtype()

        def split_keys(k):
            if self.extended:  # elastic is off in split mode (can_rotation_split)
                k, _k_el, k_ph = jax.random.split(k, 3)
            else:
                k_ph = None
            return k, k_ph

        def draw_params(k, src_h, src_w, force_rot):
            return _sample_params(
                k, self.min_size, self.max_size, self.cfg.hflip_prob,
                self.cfg.vflip_prob, self.cfg.rotate_prob,
                self.cfg.rotate_degrees, crop, src_h, src_w,
                force_rot=force_rot)

        def finish(warped_all, near, n_frames, k_ph, has_pk):
            warped = warped_all[:n_frames] / 255.0
            if self.photometric:
                warped = _photometric(k_ph, warped, self.cfg)
            warped = (warped - self.cfg.mean) / self.cfg.std
            if has_pk:
                pk_w = warped_all[n_frames:] / 255.0
                pk_w = (pk_w - self.cfg.mean) / self.cfg.std
                warped = jnp.concatenate([warped, pk_w], axis=0)
            return warped, near.astype(jnp.int32)

        def sep_one(k, frames_i, mask_i, size_i, pk_i):
            k, k_ph = split_keys(k)
            src_h = size_i[0].astype(jnp.float32)
            src_w = size_i[1].astype(jnp.float32)
            compose = _build_affine(*draw_params(k, src_h, src_w,
                                                 force_rot=False))
            line = jnp.arange(crop, dtype=jnp.float32)
            zero = jnp.zeros((crop,), jnp.float32)
            gy, _ = compose(line, zero)  # row coord: no column dependence
            _, gx = compose(zero, line)  # col coord: no row dependence
            raw = (frames_i if pk_i is None
                   else jnp.concatenate([frames_i, pk_i], axis=0))
            bil, near = _separable_axis_aligned(raw.astype(td), mask_i,
                                                gy, gx, src_h, src_w)
            return finish(bil, near, frames_i.shape[0], k_ph,
                          pk_i is not None)

        grid_y, grid_x = jnp.meshgrid(
            jnp.arange(crop, dtype=jnp.float32),
            jnp.arange(crop, dtype=jnp.float32), indexing="ij")

        def warp_one(k, frames_i, mask_i, size_i, pk_i):
            k, k_ph = split_keys(k)
            src_h = size_i[0].astype(jnp.float32)
            src_w = size_i[1].astype(jnp.float32)
            gy, gx = _build_affine(*draw_params(k, src_h, src_w,
                                                force_rot=True))(
                grid_y, grid_x)
            raw = (frames_i if pk_i is None
                   else jnp.concatenate([frames_i, pk_i], axis=0))
            warped_all, near = _warp_bilinear_and_nearest(
                raw.astype(td), mask_i.astype(td), gy, gx, src_h, src_w)
            return finish(warped_all, near, frames_i.shape[0], k_ph,
                          pk_i is not None)

        # rot_idx pads with bsz: the gathers clamp (recomputing the last
        # sample, discarded) and the tiny flag/pos scatters drop.
        if pk is None:
            sep_im, sep_tg = jax.vmap(
                lambda k, f, m, s: sep_one(k, f, m, s, None))(
                keys, frames, masks, sizes)
            rot_im, rot_tg = jax.vmap(
                lambda k, f, m, s: warp_one(k, f, m, s, None))(
                keys[rot_idx], frames[rot_idx], masks[rot_idx],
                sizes[rot_idx])
        else:
            sep_im, sep_tg = jax.vmap(sep_one)(keys, frames, masks, sizes,
                                               pk)
            rot_im, rot_tg = jax.vmap(warp_one)(
                keys[rot_idx], frames[rot_idx], masks[rot_idx],
                sizes[rot_idx], pk[rot_idx])
        # Combine via [B]-sized flag/pos scatters + a full-tensor GATHER and
        # select — NOT a full-tensor scatter: XLA scatter of [K,C,crop²]
        # rows onto TPU serializes badly (measured +30 ms/step), while the
        # gather+where pair is bandwidth-bound.
        k_bucket = rot_idx.shape[0]
        flag = jnp.zeros((bsz,), jnp.bool_).at[rot_idx].set(
            True, mode="drop")
        pos = jnp.zeros((bsz,), jnp.int32).at[rot_idx].set(
            jnp.arange(k_bucket, dtype=jnp.int32), mode="drop")
        images = jnp.where(flag[:, None, None, None], rot_im[pos], sep_im)
        targets = jnp.where(flag[:, None, None], rot_tg[pos], sep_tg)
        return images[..., None], targets


# ---------------------------------------------------------------------------
# Eval preprocessing — exact PIL parity (affects metrics)
# ---------------------------------------------------------------------------

def eval_preprocess(frames: np.ndarray, mask: np.ndarray, cfg: DataConfig,
                    pk: Optional[np.ndarray] = None, *,
                    raw: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side eval transform for ONE sample: PIL-parity short-edge resize
    to crop_size (ref:train.py:70-74) + normalize.

    frames uint8 [T, H, W] -> ([T(+3), h', w', 1] float32, [h', w'] int32).

    raw=True keeps the SAME resize but skips normalization and returns
    uint8 images + uint8 mask: normalization then runs on device inside
    the jitted eval step (train/loop), so the host->device transfer ships
    4x fewer bytes — the val-epoch bottleneck on slow host links is the
    f32 transfer, not compute (PERFORMANCE.md "eval path"). The device
    computes the identical f32 expression (x/255 - mean)/std, so metrics
    are unchanged (pinned by tests/test_eval_batching.py).
    """
    t, h, w = frames.shape
    out_h, out_w = short_edge_size(h, w, cfg.crop_size)
    idx_h, wgt_h = _banded_resize_taps(h, out_h)
    idx_w, wgt_w = _banded_resize_taps(w, out_w)

    def pil_resize_u8(x):
        # PIL resizes uint8 with rounding; replicate (ref resizes PIL
        # images). The PIL filter has only a handful of taps per output
        # row, so apply it as a banded gather+weighted-sum — the native
        # C++ kernel when available (the banded numpy form still cost
        # ~15 ms/sample of the host-bound val epoch, measured r3), else
        # the numpy fallback below, which uses the IDENTICAL ascending-k
        # f64 accumulation order so the two are bit-identical
        # (tests/test_native_loader.py).
        return banded_resize_u8(x, out_h, out_w, idx_h, wgt_h, idx_w, wgt_w)

    frames_r = pil_resize_u8(frames)

    from stf_unet_tpu.ops.resize import _nearest_indices
    rows = _nearest_indices(h, out_h)
    cols = _nearest_indices(w, out_w)
    mask_r = mask[rows][:, cols]

    pk_r = pil_resize_u8(pk) if pk is not None else None
    if raw:
        imgs = (frames_r if pk_r is None
                else np.concatenate([frames_r, pk_r], axis=0))
        return imgs[..., None], mask_r.astype(np.uint8)

    imgs = (frames_r.astype(np.float32) / 255.0 - cfg.mean) / cfg.std
    if pk_r is not None:
        pk_n = (pk_r.astype(np.float32) / 255.0 - cfg.mean) / cfg.std
        imgs = np.concatenate([imgs, pk_n], axis=0)
    return imgs[..., None], mask_r.astype(np.int32)
