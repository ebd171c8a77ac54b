"""Pallas TPU kernel: fused affine warp as one-hot MXU matmuls.

The training augmentation's bilinear warp (data/transforms.py
`_warp_bilinear_and_nearest`, replacing the reference's PIL chain
ref:transforms.py:8-157) is pinned at XLA's gather cost in every
formulation we measured: 4-tap point gathers 26.8 ms, a one-index 2x2
window gather on [Cs,H,W] ties it, and the channel-minor window gather is
63x WORSE (PERFORMANCE.md r5 §1) — on this toolchain XLA charges per
gathered element through a serial gather unit, so ~24 ms of augmentation
rides the critical path of every fused train step (VERDICT r4 #2).

This kernel sidesteps the gather unit entirely by exploiting the warp's
structure — the source coordinates are affine in the output coordinates,
so a small output tile touches a short contiguous BAND of source rows:

  * grid (B, n_tiles); per tile the whole [Cs, H, W] source stays
    VMEM-resident (bf16: uint8 values are exact) and the tile's band of
    `band` source rows is a dynamic sublane slice at an 8-aligned start
    row precomputed OUTSIDE the kernel (plain XLA min over the tile's
    gy, delivered through SMEM — no vector->scalar extraction in-kernel).
  * The x-interpolation is ONE-HOT MATMULS on the MXU:
    band [band, W] @ WxT [W, P] -> G [band, P], where WxT carries two
    nonzeros per column ((1-fx)·valid at floor(gx), fx·valid at
    floor(gx)+1) — the x-resampled value of every band row at each of
    the tile's P output pixels.
  * The y-contraction is elementwise on the VPU in full f32:
    bil[p] = sum_k WyT[k, p] * G[k, p] with WyT the matching two-nonzero
    band-relative y weights.
  * The nearest-sampled mask rides the same band as one more matmul with
    {0,1} one-hot weights — products and single-term sums are EXACT, so
    targets are bit-identical to the gather path's.
  * The normalize epilogue (x*alpha + beta, i.e. /255 -> -mean -> /std
    folded) runs in-kernel on the contracted [1, P] values.

LAYOUT IS THE POINT: every per-pixel quantity lives on the LANE axis
([1, P] vectors, [*, P] matrices), so kernel outputs are plain
lane-major [B, C, NT, P] blocks. The first version of this kernel
contracted onto the sublane axis and emitted [..., P, 1] blocks; XLA
padded that trailing unit dim to a 128-lane tile and the surrounding
program drowned in relayouts (a 10 ms normalize fusion at 128x tile
waste + 4.4 ms of layout copies for a 7.1 ms kernel — xplane trace,
PERFORMANCE.md r5 §2).

Precision: the band is bf16 (0..255 integers exact); the x weight matrix
is split into bf16 hi + bf16 residual and applied as two MXU passes
accumulated in f32 (~2^-16 relative weight error, ≤ ~0.01 intensity
level), and the y weights apply in full f32 on the VPU. The nearest
weights are {0,1} — exact in one bf16 pass.

Band-height bound (static, from DataConfig limits): |dgy/di| ≤ inv_max,
|dgy/dj| ≤ inv_max·sin(rot_max), inv_max = canvas/min_resize (= 2.0 for
the reference's 0.5·base floor, ref:train.py:59). Valid taps always land
in [ys, ys+band): ys = align8(clip(floor(min tile gy), 0, H-band)) and
every valid tap y is ≥ max(0, floor(min gy)) ≥ ys and ≤
min(valid_h-1, H-1) ≤ ys+band-1 (band_rows budgets the ≤7-row alignment
shift). Out-of-band indicators compare unequal everywhere and the weight
is zero — contributing nothing, exactly like the gather path's zeroed
taps.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile: P = TILE_H*TILE_W pixels per grid step. 8x32 keeps the
# band (and with it the one-hot matmul's wasted FLOPs) small while
# P=256 fills the MXU's N dim.
TILE_H = 8
TILE_W = 32

_VMEM_IMG_BUDGET = 8 * 1024 * 1024  # resident source cap (bf16 bytes)


def band_rows(tile_h: int, tile_w: int, max_inv_scale: float,
              sin_bound: float, h: int) -> int:
    """Static source-band height covering one output tile's bilinear taps:
    ceil(max coordinate spread) + floor/ceil/tap slack + 7 rows of
    sublane-alignment slack (Mosaic requires the dynamic band start to be
    a provable multiple of 8, so the wrapper aligns it DOWN by up to 7),
    rounded to a sublane multiple, capped at the full height (whole-height
    band is trivially covering)."""
    spread = max_inv_scale * ((tile_h - 1) + sin_bound * (tile_w - 1))
    band = int(math.ceil(spread)) + 3 + 7
    band = ((band + 7) // 8) * 8
    band = min(band, h)
    if band < h:
        # The upper clip bound h-band must itself survive the align-down:
        # extend the band by the misalignment so ys = align8(h-band_eff)
        # == h-band_eff still covers rows through h-1 (review finding r5:
        # with h%8 != 0 the plain clip dropped up to 7 bottom rows' taps).
        band = min(band + ((h - band) % 8), h)
    return band


def mxu_warp_supported(cs: int, h: int, w: int,
                       max_inv_scale: float, sin_bound: float) -> bool:
    """The kernel wants the whole [Cs, H, W] bf16 source VMEM-resident and
    a sane band; anything larger falls back to the XLA gather path."""
    if cs * h * w * 2 > _VMEM_IMG_BUDGET:
        return False
    # Odd heights are fine: band_rows extends the band by the clip-bound
    # misalignment (coverage), and Mosaic accepts non-multiple-of-8 band
    # SIZES — only the dynamic START needs the multiple-of-8 proof.
    # Chip-verified (r5): h=100/band=60 compiles and matches the
    # interpret oracle (nearest bit-equal, bilinear ≤0.002/255).
    return band_rows(TILE_H, TILE_W, max_inv_scale, sin_bound, h) <= 256


def _warp_kernel(ys_ref, valid_ref, gy_ref, gx_ref, img_ref,
                 bil_ref, near_ref, *, p: int, band: int, h: int, w: int,
                 cs: int, fill: float, alpha: float, beta: float):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # band start row (SMEM scalar); 8-aligned by the wrapper, asserted to
    # Mosaic so the dynamic sublane slice below lowers
    ys = pl.multiple_of(ys_ref[b, t], 8)
    vh = valid_ref[b, 0]                  # valid region of the canvas
    vw = valid_ref[b, 1]
    gy = gy_ref[0, 0]                     # [1, P] f32 source rows
    gx = gx_ref[0, 0]                     # [1, P] f32 source cols

    k_iota = lax.broadcasted_iota(jnp.int32, (band, p), 0)
    w_iota = lax.broadcasted_iota(jnp.int32, (w, p), 0)
    f32 = jnp.float32

    # Transposed one-hot y weights [band, P], band-relative, validity
    # folded in (inside = in_y & in_x factorizes across the two
    # applications).
    y0f = jnp.floor(gy)
    fy = gy - y0f
    in_y0 = ((y0f >= 0.0) & (y0f <= vh - 1.0)).astype(f32)
    in_y1 = ((y0f + 1.0 >= 0.0) & (y0f + 1.0 <= vh - 1.0)).astype(f32)
    y0c = jnp.clip(y0f, 0.0, h - 1.0).astype(jnp.int32) - ys
    y1c = jnp.clip(y0f + 1.0, 0.0, h - 1.0).astype(jnp.int32) - ys
    wy_t = (((1.0 - fy) * in_y0) * (k_iota == y0c).astype(f32)
            + (fy * in_y1) * (k_iota == y1c).astype(f32))      # [band, P]

    # Transposed one-hot x weights [W, P], bf16 hi/lo split for the MXU.
    x0f = jnp.floor(gx)
    fx = gx - x0f
    in_x0 = ((x0f >= 0.0) & (x0f <= vw - 1.0)).astype(f32)
    in_x1 = ((x0f + 1.0 >= 0.0) & (x0f + 1.0 <= vw - 1.0)).astype(f32)
    x0c = jnp.clip(x0f, 0.0, w - 1.0).astype(jnp.int32)
    x1c = jnp.clip(x0f + 1.0, 0.0, w - 1.0).astype(jnp.int32)
    wx_t = (((1.0 - fx) * in_x0) * (w_iota == x0c).astype(f32)
            + (fx * in_x1) * (w_iota == x1c).astype(f32))      # [W, P]
    wx_hi = wx_t.astype(jnp.bfloat16)
    wx_lo = (wx_t - wx_hi.astype(f32)).astype(jnp.bfloat16)

    # Nearest mask weights: {0,1} one-hots at the banker's-rounded tap —
    # same rounding as the gather path (round(g) picks a bilinear corner).
    ry = jnp.round(gy)
    rx = jnp.round(gx)
    in_ry = ((ry >= 0.0) & (ry <= vh - 1.0)).astype(f32)
    in_rx = ((rx >= 0.0) & (rx <= vw - 1.0)).astype(f32)
    ryc = jnp.clip(ry, 0.0, h - 1.0).astype(jnp.int32) - ys
    rxc = jnp.clip(rx, 0.0, w - 1.0).astype(jnp.int32)
    wyn_t = in_ry * (k_iota == ryc).astype(f32)                # [band, P]
    wxn_t = (in_rx * (w_iota == rxc).astype(f32)).astype(jnp.bfloat16)

    dn = (((1,), (0,)), ((), ()))

    def load_band(c):
        if band == h:  # whole-height band: static slice, ys is 0
            return img_ref[0, c]
        return img_ref[0, c, pl.ds(ys, band), :]

    band_m = load_band(cs - 1)                                 # mask channel
    gn = lax.dot_general(band_m, wxn_t, dn, preferred_element_type=f32)
    near = jnp.sum(wyn_t * gn, axis=0, keepdims=True)          # [1, P]
    if fill != 0.0:
        near = near + (1.0 - in_ry * in_rx) * fill
    near_ref[0, 0] = near

    outs = []
    for c in range(cs - 1):
        band_c = load_band(c)                                  # [band, W]
        g = (lax.dot_general(band_c, wx_hi, dn, preferred_element_type=f32)
             + lax.dot_general(band_c, wx_lo, dn,
                               preferred_element_type=f32))    # [band, P]
        outs.append(jnp.sum(wy_t * g, axis=0, keepdims=True) * alpha + beta)
    bil_ref[0, 0] = jnp.concatenate(outs, axis=0)              # [C, P]


def _pallas_warp(ys, valid, gy_f, gx_f, img, *, band: int, h: int, w: int,
                 cs: int, fill: float, alpha: float, beta: float,
                 interpret: bool):
    """The pallas_call itself, on (possibly per-shard) batched operands.
    Grid/shape derive from the LOCAL operand shapes so the same callable
    serves both the single-device path and each shard of the partitioned
    path."""
    bsz, nt = ys.shape
    p = gy_f.shape[-1]
    kernel = functools.partial(_warp_kernel, p=p, band=band, h=h, w=w,
                               cs=cs, fill=fill, alpha=alpha, beta=beta)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # ys [B, NT]
            pl.BlockSpec(memory_space=pltpu.SMEM),            # valid [B, 2]
            pl.BlockSpec((1, 1, 1, p), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, p), lambda b, t: (b, t, 0, 0)),
            # whole source resident per sample; the block index only moves
            # with b, so Pallas re-DMAs it once per sample, not per tile
            pl.BlockSpec((1, cs, h, w), lambda b, t: (b, 0, 0, 0)),
        ],
        out_specs=[
            # [B, NT, C, P]: the trailing (C, P) block equals the array
            # dims (Mosaic requires the last two block dims divisible by
            # (8, 128) or full), and the kernel's stacked [C, P] result
            # writes in one shot
            pl.BlockSpec((1, 1, cs - 1, p), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, p), lambda b, t: (b, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nt, cs - 1, p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nt, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(ys, valid, gy_f, gx_f, img)


def _batch_axes(spec_entry):
    """PartitionSpec entry -> tuple of mesh axis names (or ())."""
    if spec_entry is None:
        return ()
    if isinstance(spec_entry, (tuple, list)):
        return tuple(spec_entry)
    return (spec_entry,)


@functools.lru_cache(maxsize=8)
def _partitioned_warp(band: int, h: int, w: int, cs: int, fill: float,
                      alpha: float, beta: float, interpret: bool):
    """GSPMD wrapper (the lstm_train_kernel._partitioned_ops precedent):
    a bare pallas_call is opaque to the partitioner, so under a sharded
    mesh the operands would be all-gathered onto every device. The warp
    is embarrassingly batch-parallel — every operand and result carries
    the batch on dim 0 — so each device just runs the kernel on its
    local samples; no collectives at all."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    call = functools.partial(_pallas_warp, band=band, h=h, w=w, cs=cs,
                             fill=fill, alpha=alpha, beta=beta,
                             interpret=interpret)

    @custom_partitioning
    def op(ys, valid, gy_f, gx_f, img):
        return call(ys, valid, gy_f, gx_f, img)

    def _bspec(arg_shapes):
        bax = _batch_axes(arg_shapes[4].sharding.spec[0]
                          if len(arg_shapes[4].sharding.spec) > 0 else None)
        return tuple(bax) if bax else None

    def partition(mesh, arg_shapes, result_shape):
        bs = _bspec(arg_shapes)

        def lower_fn(ys, valid, gy_f, gx_f, img):
            return call(ys, valid, gy_f, gx_f, img)

        arg_sh = (NamedSharding(mesh, P(bs, None)),
                  NamedSharding(mesh, P(bs, None)),
                  NamedSharding(mesh, P(bs, None, None, None)),
                  NamedSharding(mesh, P(bs, None, None, None)),
                  NamedSharding(mesh, P(bs, None, None, None)))
        res_sh = (NamedSharding(mesh, P(bs, None, None, None)),
                  NamedSharding(mesh, P(bs, None, None, None)))
        return mesh, lower_fn, res_sh, arg_sh

    def infer(mesh, arg_shapes, result_shape):
        bs = _bspec(arg_shapes)
        return (NamedSharding(mesh, P(bs, None, None, None)),
                NamedSharding(mesh, P(bs, None, None, None)))

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b t, b v, b t o p, b t o p, b c h w "
                      "-> b t d p, b t o p")
    return op


def warp_bilinear_nearest_mxu(stacked: jax.Array, gy: jax.Array,
                              gx: jax.Array, valid_h: jax.Array,
                              valid_w: jax.Array, *,
                              max_inv_scale: float, sin_bound: float,
                              fill: float = 0.0,
                              alpha: float = 1.0, beta: float = 0.0,
                              interpret: bool = False,
                              partitioned: "bool | None" = None
                              ) -> Tuple[jax.Array, jax.Array]:
    """Batched fused warp: bilinear-sample the first Cs-1 channels of
    `stacked` [B, Cs, H, W] AND nearest-sample the LAST channel (the
    mask) at float source coords gy/gx [B, Ho, Wo]; taps outside the
    per-sample valid region (valid_h/valid_w [B]) contribute zero, the
    nearest sample falls back to `fill` — the batched twin of
    data/transforms._warp_bilinear_and_nearest (same semantics, looser
    float profile on the bilinear channels, EXACT on the mask). The
    bilinear channels get the fused epilogue `v*alpha + beta` (fold the
    /255 + normalize here so no XLA pass re-reads the output).

    max_inv_scale / sin_bound are the STATIC coordinate-slope bounds of
    the affine family that produced gy/gx (canvas/min_resize and
    sin(max rotation)); they size the source band. Returns
    (bil [B, Cs-1, Ho, Wo] f32, near [B, Ho, Wo] f32).
    """
    bsz, cs, h, w = stacked.shape
    ho, wo = gy.shape[-2:]
    pad_i = (-ho) % TILE_H
    pad_j = (-wo) % TILE_W
    if pad_i or pad_j:
        # Edge-replicated pad: the extra pixels recompute real coords, so
        # the band bound still holds; their outputs are sliced away.
        gy = jnp.pad(gy, ((0, 0), (0, pad_i), (0, pad_j)), mode="edge")
        gx = jnp.pad(gx, ((0, 0), (0, pad_i), (0, pad_j)), mode="edge")
    hp, wp = ho + pad_i, wo + pad_j
    ni, nj = hp // TILE_H, wp // TILE_W
    nt = ni * nj
    p = TILE_H * TILE_W
    band = band_rows(TILE_H, TILE_W, max_inv_scale, sin_bound, h)

    gy_t = gy.reshape(bsz, ni, TILE_H, nj, TILE_W).transpose(0, 1, 3, 2, 4)
    gx_t = gx.reshape(bsz, ni, TILE_H, nj, TILE_W).transpose(0, 1, 3, 2, 4)
    # Aligned DOWN to a sublane multiple (band_rows budgets the ≤7-row
    # shift); still ≤ h - band since aligning down only decreases.
    ys = (jnp.clip(jnp.floor(gy_t.min(axis=(3, 4))).astype(jnp.int32),
                   0, h - band) & ~7).reshape(bsz, nt)
    gy_f = gy_t.reshape(bsz, nt, 1, p).astype(jnp.float32)
    gx_f = gx_t.reshape(bsz, nt, 1, p).astype(jnp.float32)
    valid = jnp.stack([valid_h, valid_w], axis=-1).astype(jnp.float32)
    img = stacked.astype(jnp.bfloat16)

    if partitioned is None:  # auto: wrap when a mesh could shard the batch
        partitioned = len(jax.devices()) > 1
    if partitioned:
        inner = _partitioned_warp(band, h, w, cs, float(fill),
                                  float(alpha), float(beta), interpret)
        bil_flat, near_flat = inner(ys, valid, gy_f, gx_f, img)
    else:
        bil_flat, near_flat = _pallas_warp(
            ys, valid, gy_f, gx_f, img, band=band, h=h, w=w, cs=cs,
            fill=float(fill), alpha=float(alpha), beta=float(beta),
            interpret=interpret)

    bil = (bil_flat.reshape(bsz, ni, nj, cs - 1, TILE_H, TILE_W)
           .transpose(0, 3, 1, 4, 2, 5)
           .reshape(bsz, cs - 1, hp, wp)[:, :, :ho, :wo])
    near = (near_flat.reshape(bsz, ni, nj, TILE_H, TILE_W)
            .transpose(0, 1, 3, 2, 4)
            .reshape(bsz, hp, wp)[:, :ho, :wo])
    return bil, near
