"""Pallas TPU kernel: fully-fused last-step pixel-LSTM, forward AND backward.

Profiling (tools/profile_components.py, r2) showed the per-scale pixel
LSTMs — not the convs — dominate the flagship train step: ~23 ms of a
~57 ms bf16 step at 3–13 TF/s, because XLA's scan formulation materializes
the [T, N, 4C] input projection plus per-step h/c/gate residuals in HBM.
The model consumes ONLY the last step h_T (ref:src/stf_lstm_unet.py:239-242),
so almost all of that traffic is avoidable:

  * Forward (grid (row_tiles, T)): per (tile, t) load one [tile, C] x-block,
    compute gates = x@W_ih + h@W_hh + b on the MXU with (h, c) carried in
    VMEM scratch, write NOTHING but the final [tile, C] h_T block. No x_proj
    tensor, no h/c sequences.
  * Backward (grid (row_tiles, 2T)): phase 1 (s < T) recomputes the
    recurrence, storing h_t/c_t for the tile in VMEM scratch; phase 2
    (s >= T, t = 2T-1-s) walks t backwards, recomputing gates from the
    scratch states, producing dx blocks and accumulating dW_ih/dW_hh/db
    in-kernel (f32, constant-index output blocks that live in VMEM for the
    whole grid). HBM traffic: x read twice, dx written once, dh_T read —
    ~6x less than the scan's residual traffic at C=64.

Gate order matches torch.nn.LSTM: [i, f, g, o] (import parity).
Backward math mirrors ops/pallas/lstm_kernel._bwd (the XLA oracle used by
tests/test_pallas_lstm.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 13 * 1024 * 1024  # leave headroom under the ~16MB/core VMEM


def _plan(t_steps: int, n: int, cdim: int, itemsize: int):
    """Pick a row tile so the backward working set fits VMEM; None if the
    kernel cannot fit (then callers fall back to the XLA scan)."""
    weights = 2 * cdim * 4 * cdim * itemsize          # W_ih + W_hh blocks
    accums = 2 * cdim * 4 * cdim * 4 + 4 * cdim * 4   # f32 dW blocks + db
    fixed = weights + accums
    tile = 512
    while tile >= 64:
        tile_eff = min(tile, max(64, n))
        hc = 2 * t_steps * tile_eff * cdim * 4                  # h/c scratch
        xbuf = 2 * (2 * tile_eff * cdim * itemsize)             # x + dx, 2-buf
        carry = 2 * tile_eff * cdim * 4 + tile_eff * cdim * itemsize
        gates = 3 * tile_eff * 4 * cdim * 4                     # gate temps
        if fixed + hc + xbuf + carry + gates <= VMEM_BUDGET:
            return tile_eff
        tile //= 2
    return None


def _gate_split(gates, cdim):
    i = jax.nn.sigmoid(gates[:, :cdim])
    f = jax.nn.sigmoid(gates[:, cdim:2 * cdim])
    g = jnp.tanh(gates[:, 2 * cdim:3 * cdim])
    o = jax.nn.sigmoid(gates[:, 3 * cdim:])
    return i, f, g, o


def _make_fwd_kernel(cdim):
    def kernel(x_ref, w_ih_ref, w_hh_ref, b_ref, h_out_ref, h_s, c_s):
        t = pl.program_id(1)
        t_total = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            h_s[:] = jnp.zeros_like(h_s)
            c_s[:] = jnp.zeros_like(c_s)

        f32 = jnp.float32
        gates = (jnp.dot(x_ref[0], w_ih_ref[:], preferred_element_type=f32)
                 + jnp.dot(h_s[:].astype(x_ref.dtype), w_hh_ref[:],
                           preferred_element_type=f32)
                 + b_ref[0].astype(f32))
        i, f, g, o = _gate_split(gates, cdim)
        c_new = f * c_s[:] + i * g
        h_new = o * jnp.tanh(c_new)
        h_s[:] = h_new
        c_s[:] = c_new

        @pl.when(t == t_total - 1)
        def _():
            h_out_ref[:] = h_new.astype(h_out_ref.dtype)

    return kernel


def _require_plan(t_steps, n, cdim, itemsize):
    tile = _plan(t_steps, n, cdim, itemsize)
    if tile is None:
        raise ValueError(
            f"fused LSTM kernel does not fit VMEM for T={t_steps}, N={n}, "
            f"C={cdim}, itemsize={itemsize} — use backend='auto' (routes "
            f"unfittable scales to scan) or 'scan'")
    return tile


def _fwd_call(x, w_ih, w_hh, b, interpret):
    t_steps, n, cdim = x.shape
    tile = _require_plan(t_steps, n, cdim, x.dtype.itemsize)
    grid = (pl.cdiv(n, tile), t_steps)
    return pl.pallas_call(
        _make_fwd_kernel(cdim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cdim), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cdim), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cdim), lambda nb, t: (nb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cdim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, cdim), jnp.float32),
            pltpu.VMEM((tile, cdim), jnp.float32),
        ],
        interpret=interpret,
    )(x, w_ih, w_hh, b.reshape(1, 4 * cdim))


def _make_bwd_kernel(cdim, t_steps, tile, n):
    def kernel(x_ref, w_ih_ref, w_hh_ref, b_ref, dh_ref,
               dx_ref, dwi_ref, dwh_ref, db_ref,
               h_seq, c_seq, dh_s, dc_s):
        nb = pl.program_id(0)
        s = pl.program_id(1)
        f32 = jnp.float32

        @pl.when((nb == 0) & (s == 0))
        def _():
            dwi_ref[:] = jnp.zeros_like(dwi_ref)
            dwh_ref[:] = jnp.zeros_like(dwh_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        row = nb * tile + lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        mask = row < n  # zero padded rows out of the weight-grad reductions

        def load_prev(t):
            idx = jnp.maximum(t - 1, 0)
            h_prev = jnp.where(t > 0, h_seq[pl.ds(idx, 1)][0],
                               jnp.zeros_like(dh_s))
            c_prev = jnp.where(t > 0, c_seq[pl.ds(idx, 1)][0],
                               jnp.zeros_like(dc_s))
            return h_prev, c_prev

        def gates_at(x_blk, h_prev):
            return (jnp.dot(x_blk, w_ih_ref[:], preferred_element_type=f32)
                    + jnp.dot(h_prev.astype(x_blk.dtype), w_hh_ref[:],
                              preferred_element_type=f32)
                    + b_ref[0].astype(f32))

        @pl.when(s < t_steps)
        def _forward_phase():
            t = s
            h_prev, c_prev = load_prev(t)
            i, f, g, o = _gate_split(gates_at(x_ref[0], h_prev), cdim)
            c_new = f * c_prev + i * g
            h_seq[pl.ds(t, 1)] = (o * jnp.tanh(c_new))[None]
            c_seq[pl.ds(t, 1)] = c_new[None]

        @pl.when(s >= t_steps)
        def _backward_phase():
            t = 2 * t_steps - 1 - s

            @pl.when(s == t_steps)
            def _():
                dh_s[:] = jnp.where(mask, dh_ref[:].astype(f32), 0.0)
                dc_s[:] = jnp.zeros_like(dc_s)

            h_prev, c_prev = load_prev(t)
            c_t = c_seq[pl.ds(t, 1)][0]
            i, f, g, o = _gate_split(gates_at(x_ref[0], h_prev), cdim)
            tanh_c = jnp.tanh(c_t)

            dh = dh_s[:]
            do = dh * tanh_c
            dc = dc_s[:] + dh * o * (1.0 - tanh_c ** 2)
            dgates = jnp.concatenate([
                dc * g * i * (1.0 - i),
                dc * c_prev * f * (1.0 - f),
                dc * i * (1.0 - g ** 2),
                do * o * (1.0 - o)], axis=-1)
            dgates = jnp.where(mask, dgates, 0.0)

            # dh_prev = dgates @ W_hh^T ; dx = dgates @ W_ih^T
            dh_s[:] = lax.dot_general(
                dgates, w_hh_ref[:].astype(f32),
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            dc_s[:] = jnp.where(mask, dc * f, 0.0)
            dx_ref[0] = lax.dot_general(
                dgates, w_ih_ref[:].astype(f32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32).astype(dx_ref.dtype)

            x_m = jnp.where(mask, x_ref[0].astype(f32), 0.0)
            h_m = jnp.where(mask, h_prev, 0.0)
            dwi_ref[:] += lax.dot_general(
                x_m, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dwh_ref[:] += lax.dot_general(
                h_m, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            db_ref[:] += jnp.sum(dgates, axis=0, keepdims=True)

    return kernel


def _plan_ti(t_steps: int, n: int, cdim: int, itemsize: int):
    """Row tile for the T-inside backward kernel: the whole [T, tile, C]
    x/dx blocks live in VMEM alongside the h/c scratch, so the grid has
    ONE axis (row tiles). The unrolled T loop keeps several iterations'
    gate temporaries live at once — Mosaic's measured scoped-vmem stack for
    tile=128/C=256 is ~19 MB where a naive block sum says ~10 — so this
    plan uses a deliberately conservative 8 MB budget against the naive
    sum. Returns None if nothing fits."""
    budget = 8 * 1024 * 1024
    weights = 2 * cdim * 4 * cdim * itemsize
    accums = 2 * cdim * 4 * cdim * 4 + 4 * cdim * 4
    fixed = weights + accums
    tile = 512
    while tile >= 32:
        tile_eff = min(tile, max(32, n))
        hc = 2 * t_steps * tile_eff * cdim * 4            # h/c scratch (f32)
        xbuf = 2 * (2 * t_steps * tile_eff * cdim * itemsize)  # x+dx, 2-buf
        carry = 2 * tile_eff * cdim * 4
        gates = 5 * tile_eff * 4 * cdim * 4               # live gate temps
        if fixed + hc + xbuf + carry + gates <= budget:
            return tile_eff
        tile //= 2
    return None


def _make_bwd_kernel_ti(cdim, t_steps, tile, n):
    """T-inside backward: one grid step per row tile; the T recurrence is a
    Python-unrolled loop over the VMEM-resident [T, tile, C] x block. Same
    math (and recompute strategy) as the 2T-grid kernel, but 2T× fewer grid
    steps and x is DMA'd once instead of twice — the grid-step overhead and
    double x traffic are what invert the kernel vs scan at large C / small
    N (PERFORMANCE.md r3)."""
    def kernel(x_ref, w_ih_ref, w_hh_ref, b_ref, dh_ref,
               dx_ref, dwi_ref, dwh_ref, db_ref, h_seq, c_seq):
        nb = pl.program_id(0)
        f32 = jnp.float32

        @pl.when(nb == 0)
        def _():
            dwi_ref[:] = jnp.zeros_like(dwi_ref)
            dwh_ref[:] = jnp.zeros_like(dwh_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        row = nb * tile + lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        mask = row < n

        def gates_at(x_blk, h_prev):
            return (jnp.dot(x_blk, w_ih_ref[:], preferred_element_type=f32)
                    + jnp.dot(h_prev.astype(x_blk.dtype), w_hh_ref[:],
                              preferred_element_type=f32)
                    + b_ref[0].astype(f32))

        zeros = jnp.zeros((tile, cdim), f32)
        h_prev, c_prev = zeros, zeros
        for t in range(t_steps):  # forward recompute into VMEM scratch
            i, f, g, o = _gate_split(gates_at(x_ref[t], h_prev), cdim)
            c_prev = f * c_prev + i * g
            h_prev = o * jnp.tanh(c_prev)
            h_seq[t] = h_prev
            c_seq[t] = c_prev

        dh = jnp.where(mask, dh_ref[:].astype(f32), 0.0)
        dc_carry = zeros
        dwi_acc = jnp.zeros_like(dwi_ref)
        dwh_acc = jnp.zeros_like(dwh_ref)
        db_acc = jnp.zeros_like(db_ref)
        for t in range(t_steps - 1, -1, -1):
            h_prev = h_seq[t - 1] if t > 0 else zeros
            c_prev = c_seq[t - 1] if t > 0 else zeros
            i, f, g, o = _gate_split(gates_at(x_ref[t], h_prev), cdim)
            tanh_c = jnp.tanh(c_seq[t])
            do = dh * tanh_c
            dc = dc_carry + dh * o * (1.0 - tanh_c ** 2)
            dgates = jnp.concatenate([
                dc * g * i * (1.0 - i),
                dc * c_prev * f * (1.0 - f),
                dc * i * (1.0 - g ** 2),
                do * o * (1.0 - o)], axis=-1)
            dgates = jnp.where(mask, dgates, 0.0)
            dh = lax.dot_general(
                dgates, w_hh_ref[:].astype(f32),
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            dc_carry = jnp.where(mask, dc * f, 0.0)
            dx_ref[t] = lax.dot_general(
                dgates, w_ih_ref[:].astype(f32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32).astype(dx_ref.dtype)
            x_m = jnp.where(mask, x_ref[t].astype(f32), 0.0)
            h_m = jnp.where(mask, h_prev, 0.0)
            dwi_acc += lax.dot_general(
                x_m, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dwh_acc += lax.dot_general(
                h_m, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            db_acc += jnp.sum(dgates, axis=0, keepdims=True)
        dwi_ref[:] += dwi_acc
        dwh_ref[:] += dwh_acc
        db_ref[:] += db_acc

    return kernel


def _bwd_call_ti(x, w_ih, w_hh, b, dh, interpret):
    t_steps, n, cdim = x.shape
    tile = _plan_ti(t_steps, n, cdim, x.dtype.itemsize)
    if tile is None:
        raise ValueError("T-inside bwd kernel does not fit VMEM")
    grid = (pl.cdiv(n, tile),)
    dx, dwi, dwh, db = pl.pallas_call(
        _make_bwd_kernel_ti(cdim, t_steps, tile, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_steps, tile, cdim), lambda nb: (0, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cdim), lambda nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cdim), lambda nb: (nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_steps, tile, cdim), lambda nb: (0, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cdim), lambda nb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, n, cdim), x.dtype),
            jax.ShapeDtypeStruct((cdim, 4 * cdim), jnp.float32),
            jax.ShapeDtypeStruct((cdim, 4 * cdim), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * cdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_steps, tile, cdim), jnp.float32),
            pltpu.VMEM((t_steps, tile, cdim), jnp.float32),
        ],
        interpret=interpret,
    )(x, w_ih, w_hh, b.reshape(1, 4 * cdim), dh)
    return dx, dwi, dwh, db


def _bwd_call(x, w_ih, w_hh, b, dh, interpret):
    t_steps, n, cdim = x.shape
    tile = _require_plan(t_steps, n, cdim, x.dtype.itemsize)
    grid = (pl.cdiv(n, tile), 2 * t_steps)

    def x_index(nb, s):
        return (jnp.where(s < t_steps, s, 2 * t_steps - 1 - s), nb, 0)

    def dx_index(nb, s):
        return (jnp.where(s < t_steps, t_steps - 1, 2 * t_steps - 1 - s),
                nb, 0)

    dx, dwi, dwh, db = pl.pallas_call(
        _make_bwd_kernel(cdim, t_steps, tile, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cdim), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cdim), lambda nb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cdim), lambda nb, s: (nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, cdim), dx_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, 4 * cdim), lambda nb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cdim), lambda nb, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, n, cdim), x.dtype),
            jax.ShapeDtypeStruct((cdim, 4 * cdim), jnp.float32),
            jax.ShapeDtypeStruct((cdim, 4 * cdim), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * cdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_steps, tile, cdim), jnp.float32),
            pltpu.VMEM((t_steps, tile, cdim), jnp.float32),
            pltpu.VMEM((tile, cdim), jnp.float32),
            pltpu.VMEM((tile, cdim), jnp.float32),
        ],
        interpret=interpret,
    )(x, w_ih, w_hh, b.reshape(1, 4 * cdim), dh)
    return dx, dwi, dwh, db


def _bwd_dispatch(x, w_ih, w_hh, b, dh, interpret):
    """Backward routing: the T-inside kernel when its (conservative) VMEM
    plan fits — measured ~5-7% faster than the 2T-grid kernel at the
    C=64/128 scales that route fused (one x DMA instead of two, 2T× fewer
    grid steps) — else the 2T-grid streaming kernel."""
    t_steps, n, cdim = x.shape
    if _plan_ti(t_steps, n, cdim, x.dtype.itemsize) is not None:
        return _bwd_call_ti(x, w_ih, w_hh, b, dh, interpret)
    return _bwd_call(x, w_ih, w_hh, b, dh, interpret)


def lstm_fused_supported(t_steps: int, n: int, cdim: int,
                         itemsize: int) -> bool:
    return _plan(t_steps, n, cdim, itemsize) is not None


# ---------------------------------------------------------------------------
# GSPMD support: under a sharded mesh a bare pallas_call would be gathered
# onto every device. custom_partitioning declares the row (N) axis
# shardable: each device runs the kernel on its local rows; the backward's
# weight/bias grads are per-shard partials combined with a psum over the
# row-sharding mesh axes. The plain (single-device) path below bypasses
# this entirely.
# ---------------------------------------------------------------------------

def _row_axes(spec_entry):
    """PartitionSpec entry -> tuple of mesh axis names (or ())."""
    if spec_entry is None:
        return ()
    if isinstance(spec_entry, (tuple, list)):
        return tuple(spec_entry)
    return (spec_entry,)


@functools.lru_cache(maxsize=4)
def _partitioned_ops(interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fwd_op(x, w_ih, w_hh, b):
        return _fwd_call(x, w_ih, w_hh, b, interpret)

    def fwd_partition(mesh, arg_shapes, result_shape):
        row = _row_axes(arg_shapes[0].sharding.spec[1]
                        if len(arg_shapes[0].sharding.spec) > 1 else None)
        row_spec = row if row else None

        def lower_fn(x, w_ih, w_hh, b):
            return _fwd_call(x, w_ih, w_hh, b, interpret)

        arg_sh = (NamedSharding(mesh, P(None, row_spec, None)),
                  NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                  NamedSharding(mesh, P()))
        res_sh = NamedSharding(mesh, P(row_spec, None))
        return mesh, lower_fn, res_sh, arg_sh

    def fwd_infer(mesh, arg_shapes, result_shape):
        row = _row_axes(arg_shapes[0].sharding.spec[1]
                        if len(arg_shapes[0].sharding.spec) > 1 else None)
        return NamedSharding(mesh, P(row if row else None, None))

    fwd_op.def_partition(
        partition=fwd_partition,
        infer_sharding_from_operands=fwd_infer,
        sharding_rule="t n c, c d, c d, d -> n c")

    @custom_partitioning
    def bwd_op(x, w_ih, w_hh, b, dh):
        dx, dwi, dwh, db = _bwd_dispatch(x, w_ih, w_hh, b, dh, interpret)
        return dx, dwi, dwh, db

    def bwd_partition(mesh, arg_shapes, result_shape):
        row = _row_axes(arg_shapes[0].sharding.spec[1]
                        if len(arg_shapes[0].sharding.spec) > 1 else None)
        row_spec = row if row else None

        def lower_fn(x, w_ih, w_hh, b, dh):
            dx, dwi, dwh, db = _bwd_dispatch(x, w_ih, w_hh, b, dh, interpret)
            if row:  # weight/bias grads are partial sums over local rows
                dwi = jax.lax.psum(dwi, row)
                dwh = jax.lax.psum(dwh, row)
                db = jax.lax.psum(db, row)
            return dx, dwi, dwh, db

        arg_sh = (NamedSharding(mesh, P(None, row_spec, None)),
                  NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                  NamedSharding(mesh, P()),
                  NamedSharding(mesh, P(row_spec, None)))
        res_sh = (NamedSharding(mesh, P(None, row_spec, None)),
                  NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                  NamedSharding(mesh, P()))
        return mesh, lower_fn, res_sh, arg_sh

    def bwd_infer(mesh, arg_shapes, result_shape):
        row = _row_axes(arg_shapes[0].sharding.spec[1]
                        if len(arg_shapes[0].sharding.spec) > 1 else None)
        rs = row if row else None
        return (NamedSharding(mesh, P(None, rs, None)),
                NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                NamedSharding(mesh, P()))

    bwd_op.def_partition(
        partition=bwd_partition,
        infer_sharding_from_operands=bwd_infer,
        sharding_rule="t n c, c d, c d, d, n c -> t n c, c d, c d, q d")

    return fwd_op, bwd_op


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_lstm_last_x(x: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
                      b: jax.Array, interpret: bool = False,
                      partitioned: bool = False) -> jax.Array:
    """x [T, N, C] (RAW inputs — the input projection happens in-kernel),
    w_ih/w_hh [C, 4C], b [4C] -> h_T [N, C]. Differentiable: the backward
    is the fused recompute kernel above. partitioned=True routes through
    custom_partitioning so a GSPMD mesh shards the row axis instead of
    gathering the operands."""
    if partitioned:
        return _partitioned_ops(interpret)[0](x, w_ih, w_hh, b)
    return _fwd_call(x, w_ih, w_hh, b, interpret)


def _vjp_fwd(x, w_ih, w_hh, b, interpret, partitioned):
    return (fused_lstm_last_x(x, w_ih, w_hh, b, interpret, partitioned),
            (x, w_ih, w_hh, b))


def _vjp_bwd(interpret, partitioned, residuals, dh):
    x, w_ih, w_hh, b = residuals
    if partitioned:
        dx, dwi, dwh, db = _partitioned_ops(interpret)[1](x, w_ih, w_hh, b,
                                                          dh)
    else:
        dx, dwi, dwh, db = _bwd_dispatch(x, w_ih, w_hh, b, dh, interpret)
    return (dx, dwi.astype(w_ih.dtype), dwh.astype(w_hh.dtype),
            db.reshape(-1).astype(b.dtype))


fused_lstm_last_x.defvjp(_vjp_fwd, _vjp_bwd)
