"""Pallas TPU kernel: fused LSTM recurrence over the pixel-lane axis.

The pixel-LSTM (ops/lstm.py) is the hottest non-conv op in STF-LSTM-UNet
(ref:src/stf_lstm_unet.py:216-236). `fused_lstm_last` keeps the recurrent
state (h, c) in VMEM across all T steps and writes only the final
[TILE_N, C] h_T block — an inference fallback for scales where the fully
fused train/infer kernel (lstm_train_kernel.py) does not fit VMEM.

Grid: (row_tiles, T) with T innermost — TPU grid steps execute sequentially
per core, so VMEM scratch carries (h, c) across t; @pl.when(t == 0) resets.

Gate order matches torch nn.LSTM: [i, f, g, o].

History: a full-sequence variant with a custom VJP lived here through r1;
it lost ~8% to XLA's scan for training (it wrote both h and c sequences to
HBM) and was retired in r2 when the recompute-in-VMEM training kernel
(lstm_train_kernel.fused_lstm_last_x) beat the scan outright (measured in
tools/perf_lstm_kernel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 512


def _pick_tile(tile_n: int, n: int, cdim: int) -> int:
    """Bound the VMEM working set: double-buffered x_proj blocks dominate
    (tile * 4C * 4B * 2), plus w_hh (C*4C*4B), h/c outputs and scratch.
    Budget the x_proj block at ~2MB so the whole set stays well under the
    ~16MB/core VMEM ceiling even at C=512."""
    budget_rows = (2 * 1024 * 1024) // (4 * 4 * cdim)
    tile = min(tile_n, n, max(128, budget_rows))
    return max(8, (tile // 8) * 8)


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
    (No VJP — training routes through lstm_train_kernel or scan.)
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


# Below this many pixel rows the scan's residual traffic is small enough
# that XLA wins (measured r2, tools/perf_lstm_kernel.py: fused beats scan
# ~2x at N>=12544 for training but loses at N=3136).
FUSED_TRAIN_MIN_ROWS = 8192  # retained for reference; routing is C-based
# Roofline crossover (PERFORMANCE.md r3): the fused kernel's extra cost is
# gate-recompute matmul FLOPs (∝ T·N·C²), the scan's is residual HBM
# traffic (∝ T·N·C). On v5e (~240 bf16-FLOP per HBM byte) they cross at
# C ≈ 90–180 — matching the measured fused win at C=128 (2.1x) and loss at
# C=256 (4.4x). N cancels to first order, so the threshold is on C.
FUSED_TRAIN_MAX_C = 128


def lstm_backend_default(train: bool = True, *, n: int = 0, cdim: int = 0,
                         t_steps: int = 8, itemsize: int = 4) -> str:
    """TPU routing, measured (tools/perf_lstm_kernel.py, r2):

    * training: the fully-fused last-step kernel (lstm_train_kernel.py)
      when its VMEM plan fits AND C <= FUSED_TRAIN_MAX_C — it avoids the
      [T,N,4C] x_proj materialization and all h/c/gate residual traffic
      (the scan LSTMs were 23 of 57 ms of the flagship bf16 step). At
      large C the kernel's gate-recompute FLOPs (∝ C²) outgrow the
      residual traffic it saves (∝ C) and scan wins — the measured
      C=256 inversion, explained by roofline in PERFORMANCE.md r3 (the
      r2 N-threshold routed the same scales but for the wrong variable:
      a T-inside no-grid-overhead variant measured within 10%, ruling
      out grid overhead as the cause).
    * inference: fused kernel when it fits (in-kernel input projection
      beats pallas_last + external einsum at every scale), else the
      last-only kernel.
    Multi-device: the fused kernel rides a custom_partitioning wrapper
    (lstm_train_kernel._partitioned_ops) that shards the row axis and
    psums the weight grads, so routing is the same as single-device with
    the per-device row count n / device_count. CPU/GPU: scan."""
    if jax.default_backend() != "tpu":
        return "scan"
    if n and cdim:
        n = max(1, n // jax.device_count())
        from stf_unet_tpu.ops.pallas.lstm_train_kernel import (
            lstm_fused_supported)
        if lstm_fused_supported(t_steps, n, cdim, itemsize) and (
                not train or cdim <= FUSED_TRAIN_MAX_C):
            return "pallas_fused"
    return "scan" if train else "pallas_last"
