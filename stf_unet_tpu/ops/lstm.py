"""Per-pixel temporal LSTM as a `lax.scan` over fused gate matmuls.

The reference fuses DCE-MRI temporal features with nn.LSTM applied to
[B*H*W, T, C] lanes at each encoder scale (ref:src/stf_lstm_unet.py:124-127,
214-236) — a per-pixel (pointwise) LSTM, not a true ConvLSTM. TPU-native
design: time stays sequential (inherently recurrent, T=8 is tiny) while the
huge B*H*W batch axis becomes one big [N, C] x [C, 4C] matmul per step —
exactly the MXU's preferred shape, and the N axis shards perfectly over a
data-parallel mesh.

Gate order and arithmetic match torch.nn.LSTM (i, f, g, o; see torch docs)
so weights can be imported for golden parity tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def lstm_cell(x_proj: jax.Array, h: jax.Array, c: jax.Array,
              w_hh: jax.Array, b: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step. x_proj = x @ w_ih is precomputed for the whole sequence.

    x_proj, h, c: [N, 4C]/[N, C]/[N, C]; w_hh: [C, 4C]; b: [4C].
    """
    gates = x_proj + jnp.dot(h, w_hh, preferred_element_type=x_proj.dtype)
    if b is not None:
        gates = gates + b
    cdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :cdim])
    f = jax.nn.sigmoid(gates[..., cdim:2 * cdim])
    g = jnp.tanh(gates[..., 2 * cdim:3 * cdim])
    o = jax.nn.sigmoid(gates[..., 3 * cdim:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(x: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
              b: Optional[jax.Array], *, return_sequence: bool = False) -> jax.Array:
    """Run an LSTM over the leading time axis.

    x: [T, N, C]; w_ih: [C, 4C]; w_hh: [C, 4C]; b: [4C] (= b_ih + b_hh folded).
    Returns h_T [N, C] (the reference keeps only the last step,
    ref:src/stf_lstm_unet.py:239-242) or the full [T, N, C] sequence.

    The input projection for ALL T steps is one batched matmul (MXU saturating)
    before the scan; the scan carries only the [N, C] recurrent state.
    """
    t, n, cdim = x.shape
    x_proj = jnp.einsum("tnc,cd->tnd", x, w_ih,
                        preferred_element_type=x.dtype)

    def step(carry, xp):
        h, c = carry
        h_new, c_new = lstm_cell(xp, h, c, w_hh, b)
        return (h_new, c_new), (h_new if return_sequence else None)

    h0 = jnp.zeros((n, cdim), dtype=x.dtype)
    c0 = jnp.zeros((n, cdim), dtype=x.dtype)
    (h_final, _), seq = lax.scan(step, (h0, c0), x_proj)
    if return_sequence:
        return seq
    return h_final


def pixel_lstm(feat_seq: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
               b: Optional[jax.Array], backend: str = "auto",
               train: bool = True) -> jax.Array:
    """Temporal fusion of per-scale encoder features.

    feat_seq: [B, T, H, W, C] (NHWC per frame) -> [B, H, W, C]: last LSTM
    step per pixel (ref:src/stf_lstm_unet.py:216-242).

    backend: 'auto' (measured best per mode; see lstm_backend_default),
    'scan', 'pallas_fused' (fully-fused fwd+bwd last-step kernel, in-kernel
    input projection — ops/pallas/lstm_train_kernel.py), 'pallas_last'
    (inference-only fallback), or either with an '_interpret' suffix
    (CPU-testable emulation).
    """
    bsz, t, h, w, c = feat_seq.shape
    lanes = feat_seq.transpose(1, 0, 2, 3, 4).reshape(t, bsz * h * w, c)
    if backend == "auto":
        from stf_unet_tpu.ops.pallas.lstm_kernel import lstm_backend_default
        backend = lstm_backend_default(train, n=bsz * h * w, cdim=c,
                                       t_steps=t,
                                       itemsize=feat_seq.dtype.itemsize)
    elif backend in ("pallas", "pallas_interpret"):
        # r1 name for the retired full-sequence kernel -> its successor
        backend = backend.replace("pallas", "pallas_fused")
    if backend.startswith("pallas_fused"):
        from stf_unet_tpu.ops.pallas.lstm_train_kernel import fused_lstm_last_x
        bias = b if b is not None else jnp.zeros((4 * c,), lanes.dtype)
        # On a multi-device backend route through the custom_partitioning
        # wrapper so GSPMD shards the row axis (and psums weight grads)
        # instead of gathering operands onto every device.
        out = fused_lstm_last_x(lanes, w_ih, w_hh, bias,
                                backend.endswith("_interpret"),
                                len(jax.devices()) > 1)
    elif backend.startswith("pallas_last"):
        from stf_unet_tpu.ops.pallas.lstm_kernel import fused_lstm_last
        x_proj = jnp.einsum("tnc,cd->tnd", lanes, w_ih,
                            preferred_element_type=lanes.dtype)
        bias = b if b is not None else jnp.zeros((4 * c,), lanes.dtype)
        out = fused_lstm_last(x_proj, w_hh, bias,
                              interpret=backend.endswith("_interpret"))
    elif backend == "scan":
        out = lstm_scan(lanes, w_ih, w_hh, b)
    else:
        raise ValueError(f"Unknown LSTM backend: {backend}")
    return out.reshape(bsz, h, w, c)
