"""Pallas TPU kernel: fused LSTM recurrence over the pixel-lane axis.

The pixel-LSTM (ops/lstm.py) is the hottest non-conv op in STF-LSTM-UNet
(ref:src/stf_lstm_unet.py:216-236). The XLA scan formulation writes the
[N, 4C] gate tensor to HBM every step between the recurrent matmul and the
VPU gate math. This kernel keeps the recurrent state (h, c) AND the gate
tensor in VMEM across all T steps: per (row-tile, t) grid step it loads one
[TILE_N, 4C] slice of the precomputed input projection, runs the
[TILE_N, C] x [C, 4C] recurrent matmul on the MXU, applies the gate
nonlinearities on the VPU, and only writes the [TILE_N, C] h/c outputs.

Grid: (row_tiles, T) with T innermost — TPU grid steps execute sequentially
per core, so VMEM scratch carries (h, c) across t; @pl.when(t == 0) resets.

Gate order matches torch nn.LSTM: [i, f, g, o].

The public wrapper `fused_lstm_sequence` carries a custom VJP whose backward
is a plain XLA reverse scan (recomputing gates from the saved h/c
sequences) — training gradients are exact while the forward rides the
fused kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 512


def _lstm_kernel(x_proj_ref, w_hh_ref, b_ref, h_out_ref, c_out_ref,
                 h_scratch, c_scratch):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    cdim = h_scratch.shape[-1]
    gates = x_proj_ref[0] + jnp.dot(
        h_scratch[:], w_hh_ref[:], preferred_element_type=jnp.float32)
    gates = gates + b_ref[0]
    i = jax.nn.sigmoid(gates[:, :cdim])
    f = jax.nn.sigmoid(gates[:, cdim:2 * cdim])
    g = jnp.tanh(gates[:, 2 * cdim:3 * cdim])
    o = jax.nn.sigmoid(gates[:, 3 * cdim:])
    c_new = f * c_scratch[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scratch[:] = h_new
    c_scratch[:] = c_new
    h_out_ref[0] = h_new.astype(h_out_ref.dtype)
    c_out_ref[0] = c_new.astype(c_out_ref.dtype)


def _pick_tile(tile_n: int, n: int, cdim: int) -> int:
    """Bound the VMEM working set: double-buffered x_proj blocks dominate
    (tile * 4C * 4B * 2), plus w_hh (C*4C*4B), h/c outputs and scratch.
    Budget the x_proj block at ~2MB so the whole set stays well under the
    ~16MB/core VMEM ceiling even at C=512."""
    budget_rows = (2 * 1024 * 1024) // (4 * 4 * cdim)
    tile = min(tile_n, n, max(128, budget_rows))
    return max(8, (tile // 8) * 8)


def _forward(x_proj: jax.Array, w_hh: jax.Array, b: jax.Array,
             tile_n: int, interpret: bool) -> Tuple[jax.Array, jax.Array]:
    t_steps, n, four_c = x_proj.shape
    cdim = four_c // 4
    tile = _pick_tile(tile_n, n, cdim)
    grid = (pl.cdiv(n, tile), t_steps)

    h_seq, c_seq = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, four_c), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, four_c), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_c), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, cdim), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cdim), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, n, cdim), x_proj.dtype),
            jax.ShapeDtypeStruct((t_steps, n, cdim), x_proj.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, cdim), jnp.float32),
            pltpu.VMEM((tile, cdim), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, b.reshape(1, four_c))
    return h_seq, c_seq


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_lstm_sequence(x_proj: jax.Array, w_hh: jax.Array, b: jax.Array,
                        tile_n: int = DEFAULT_TILE_N,
                        interpret: bool = False) -> jax.Array:
    """x_proj [T, N, 4C] (= x @ w_ih precomputed), w_hh [C, 4C], b [4C]
    -> h_seq [T, N, C]."""
    h_seq, _ = _forward(x_proj, w_hh, b, tile_n, interpret)
    return h_seq


def _fwd(x_proj, w_hh, b, tile_n, interpret):
    h_seq, c_seq = _forward(x_proj, w_hh, b, tile_n, interpret)
    return h_seq, (x_proj, w_hh, b, h_seq, c_seq)


def _bwd(tile_n, interpret, residuals, dh_seq):
    """Exact reverse-mode LSTM gradients as an XLA reverse scan, recomputing
    gates from the saved (h, c) sequences."""
    x_proj, w_hh, b, h_seq, c_seq = residuals
    t_steps, n, cdim = h_seq.shape
    f32 = jnp.float32

    h_prev_seq = jnp.concatenate(
        [jnp.zeros((1, n, cdim), h_seq.dtype), h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate(
        [jnp.zeros((1, n, cdim), c_seq.dtype), c_seq[:-1]], axis=0)

    def step(carry, xs):
        dh_rec, dc_rec = carry
        xp, h_prev, c_prev, c_t, dh_out = xs
        gates = (xp + jnp.dot(h_prev, w_hh, preferred_element_type=f32)
                 + b).astype(f32)
        i = jax.nn.sigmoid(gates[:, :cdim])
        f = jax.nn.sigmoid(gates[:, cdim:2 * cdim])
        g = jnp.tanh(gates[:, 2 * cdim:3 * cdim])
        o = jax.nn.sigmoid(gates[:, 3 * cdim:])
        tanh_c = jnp.tanh(c_t.astype(f32))

        dh = dh_out.astype(f32) + dh_rec
        do = dh * tanh_c
        dc = dc_rec + dh * o * (1 - tanh_c ** 2)
        di = dc * g
        dg = dc * i
        df = dc * c_prev.astype(f32)
        dc_prev = dc * f

        dgates = jnp.concatenate([
            di * i * (1 - i), df * f * (1 - f),
            dg * (1 - g ** 2), do * o * (1 - o)], axis=-1)
        dh_prev = jnp.dot(dgates, w_hh.T.astype(f32),
                          preferred_element_type=f32)
        return (dh_prev, dc_prev), dgates

    init = (jnp.zeros((n, cdim), f32), jnp.zeros((n, cdim), f32))
    xs = (x_proj[::-1], h_prev_seq[::-1], c_prev_seq[::-1], c_seq[::-1],
          dh_seq[::-1])
    _, dgates_rev = lax.scan(step, init, xs)
    dgates = dgates_rev[::-1]

    dx_proj = dgates.astype(x_proj.dtype)
    dw_hh = jnp.einsum("tnc,tnd->cd", h_prev_seq.astype(f32), dgates,
                       preferred_element_type=f32).astype(w_hh.dtype)
    db = jnp.sum(dgates, axis=(0, 1)).astype(b.dtype)
    return dx_proj, dw_hh, db


fused_lstm_sequence.defvjp(_fwd, _bwd)


def _lstm_last_kernel(x_proj_ref, w_hh_ref, b_ref, h_out_ref,
                      h_scratch, c_scratch):
    t = pl.program_id(1)
    t_total = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    cdim = h_scratch.shape[-1]
    gates = x_proj_ref[0] + jnp.dot(
        h_scratch[:], w_hh_ref[:], preferred_element_type=jnp.float32)
    gates = gates + b_ref[0]
    i = jax.nn.sigmoid(gates[:, :cdim])
    f = jax.nn.sigmoid(gates[:, cdim:2 * cdim])
    g = jnp.tanh(gates[:, 2 * cdim:3 * cdim])
    o = jax.nn.sigmoid(gates[:, 3 * cdim:])
    c_new = f * c_scratch[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scratch[:] = h_new
    c_scratch[:] = c_new

    @pl.when(t == t_total - 1)
    def _():
        h_out_ref[:] = h_new.astype(h_out_ref.dtype)


def fused_lstm_last(x_proj: jax.Array, w_hh: jax.Array, b: jax.Array,
                    tile_n: int = DEFAULT_TILE_N,
                    interpret: bool = False) -> jax.Array:
    """Inference fast path: x_proj [T, N, 4C] -> h_T [N, C] ONLY.

    The recurrence never leaves VMEM; per grid step the only HBM traffic is
    the x_proj block read, plus one [tile, C] write at the final step.
    (No VJP — training routes through scan or fused_lstm_sequence.)
    """
    t_steps, n, four_c = x_proj.shape
    cdim = four_c // 4
    tile = _pick_tile(tile_n, n, cdim)
    grid = (pl.cdiv(n, tile), t_steps)
    return pl.pallas_call(
        _lstm_last_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, four_c), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, four_c), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, four_c), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cdim), lambda nb, t: (nb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cdim), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, cdim), jnp.float32),
            pltpu.VMEM((tile, cdim), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, b.reshape(1, four_c))


def lstm_backend_default(train: bool = True) -> str:
    """TPU: scan for training (XLA's fused scan wins once residuals must be
    saved anyway — measured), last-only Pallas kernel for inference.
    CPU/GPU: scan."""
    if jax.default_backend() != "tpu":
        return "scan"
    return "scan" if train else "pallas_last"
