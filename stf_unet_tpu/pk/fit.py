"""Per-voxel extended-Tofts fitting (ref:pk_fitting.py:157-420), TPU-native.

Two solvers over the same quadrature forward model:
  * fit_adam — behavioral parity with the reference: Adam(lr=0.005),
    100 updates per voxel, params clamped into the physiological box after
    every step (ref:290-353). The reference steps Adam over 1024-voxel
    minibatches; Adam's per-element moments make the full-batch vectorized
    form equivalent per voxel (same update count, same hyperparameters,
    gradient scale cancels in Adam's normalizer) — validated by synthetic
    parameter-recovery tests rather than a bitwise trace.
  * fit_lm — the fast path: vectorized projected Levenberg-Marquardt with an
    analytic 3-parameter Jacobian and a closed-form 3x3 solve; converges in
    ~20 iterations instead of 100 Adam epochs.

Both stream voxel chunks to bound the [N, T, Q] working set in HBM; chunks
are padded to power-of-two buckets so a whole dataset run compiles each
solver O(1) times rather than once per distinct tissue-voxel count.

Documented divergence: the reference divides by 255 twice (once in
process_patient ref:662, again in preprocess_images ref:173), fitting
curves in [0, 1.5e-5] where every parameter collapses toward its
initialization. We normalize exactly once.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.core.config import PKConfig
from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch

CHUNK = 16384
MIN_BUCKET = 256


@functools.lru_cache(maxsize=None)
def _sharded_chunk_fn(chunk_fn, mesh, cfg: PKConfig):
    """Wrap a single-device chunk solver in shard_map over the voxel axis.

    Voxels are independent (every reduction in both solvers is per-voxel),
    so data-parallel PK fitting is an embarrassing split: each device runs
    the UNCHANGED single-device program — including the fused Pallas
    quadrature kernel, which GSPMD could not partition through — on its
    local slice of the chunk. No collectives are needed or inserted.
    Cached per (solver, mesh, cfg) so each combination compiles once.
    """
    from jax.sharding import PartitionSpec as P

    from stf_unet_tpu.core.mesh import DATA_AXIS

    def local(curves, quad):
        return chunk_fn(curves, quad, cfg)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P()), out_specs=P(DATA_AXIS),
        check_vma=False))


def _bucket_size(n: int) -> int:
    """Pad target for a voxel chunk: next power of two >= n, in
    [MIN_BUCKET, CHUNK]. Bounds the number of distinct compiled solver
    shapes at log2(CHUNK/MIN_BUCKET)+1 = 7 per solver across an entire
    dataset run (the reference's fixed-1024 batching envelope,
    ref:pk_fitting.py:316-353, never recompiles either)."""
    b = MIN_BUCKET
    while b < n:
        b *= 2
    return min(b, CHUNK)


def tissue_mask_morphology(mask, kernel: int = 5) -> np.ndarray:
    """Binary open then close with a kernel x kernel window
    (ref:pk_fitting.py:184-186) via scipy's C min/max filters.

    Border semantics match cv2.morphologyEx defaults: erode pads with 1,
    dilate pads with 0 (the border never spuriously grows/shrinks the mask).
    Host-side on purpose: it is a one-shot tiny preprocessing step, and a
    reduce_window formulation costs a multi-minute XLA compile per new
    image shape for zero runtime benefit.
    """
    from scipy import ndimage

    m = np.asarray(mask).astype(np.uint8)

    def erode(x):
        return ndimage.minimum_filter(x, size=kernel, mode="constant", cval=1)

    def dilate(x):
        return ndimage.maximum_filter(x, size=kernel, mode="constant", cval=0)

    opened = dilate(erode(m))
    closed = erode(dilate(opened))
    return closed > 0


def preprocess_images(images: np.ndarray, cfg: PKConfig
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (normalized [T, H, W] float32 in [0,1], tissue mask [H, W] bool).

    Tissue mask: first_frame > 0.15 * mean(first_frame), then morphological
    open/close (ref:157-191). Accepts uint8 [0,255] or float already in [0,1];
    normalizes exactly once (see module docstring).
    """
    imgs = np.asarray(images, dtype=np.float32)
    if imgs.max() > 1.5:
        imgs = imgs / 255.0
    first = imgs[0]
    threshold = float(first.mean()) * cfg.tissue_threshold_factor
    mask = tissue_mask_morphology(first > threshold)
    return jnp.asarray(imgs), jnp.asarray(mask)


def _clamp(params: jax.Array, cfg: PKConfig) -> jax.Array:
    """Project into the physiological box (ref:303-307)."""
    lo = jnp.asarray([cfg.ktrans_bounds[0], cfg.ve_bounds[0], cfg.vp_bounds[0]])
    hi = jnp.asarray([cfg.ktrans_bounds[1], cfg.ve_bounds[1], cfg.vp_bounds[1]])
    return jnp.clip(params, lo, hi)


def _init_params(n: int, cfg: PKConfig) -> jax.Array:
    return jnp.broadcast_to(
        jnp.asarray([cfg.init_ktrans, cfg.init_ve, cfg.init_vp],
                    jnp.float32), (n, 3))


# ---------------------------------------------------------------------------
# Adam solver (reference parity)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3))
def _adam_fit_chunk(curves: jax.Array, quad_tree, cfg: PKConfig,
                    with_losses: bool = False) -> jax.Array:
    quad = quad_tree
    n = curves.shape[0]
    params = _init_params(n, cfg)

    # Adam with torch defaults (betas 0.9/0.999, eps 1e-8; ref uses
    # torch.optim.Adam(lr=0.005), ref:300).
    b1, b2, eps = 0.9, 0.999, 1e-8

    def mse_and_grad(params):
        def loss_fn(p):
            pred = extended_tofts_batch(quad, p[:, 0], p[:, 1], p[:, 2])
            row_mse = jnp.mean((pred - curves) ** 2, axis=1)
            # Fixed 1/1024 gradient scale — the reference's minibatch-mean
            # scale (ref:pk_fitting.py:316-330, batch_size=1024). A
            # bucket-sized mean would make the update depend (at Adam-eps
            # level) on the padding bucket and on mesh sharding; a fixed
            # constant makes single-device, any-bucket, and mesh-sharded
            # runs bitwise-identical per voxel.
            return jnp.sum(row_mse) * (1.0 / 1024.0), row_mse
        (_, rows), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return rows, g

    def step(carry, i):
        params, m, v = carry
        loss, g = mse_and_grad(params)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        t = i + 1
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        params = params - cfg.lr * mhat / (jnp.sqrt(vhat) + eps)
        params = _clamp(params, cfg)
        # per-row losses feed the debug loss-curve render only; return
        # None otherwise so the production path never materializes the
        # [num_epochs, N] history in HBM
        return (params, m, v), (loss if with_losses else None)

    init = (params, jnp.zeros_like(params), jnp.zeros_like(params))
    (params, _, _), row_losses = jax.lax.scan(
        step, init, jnp.arange(cfg.num_epochs, dtype=jnp.float32))
    if with_losses:
        return params, row_losses  # [N, 3], [num_epochs, N]
    return params


# ---------------------------------------------------------------------------
# Levenberg-Marquardt solver (fast path)
# ---------------------------------------------------------------------------

def _solve3x3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Closed-form adjugate solve of batched 3x3 systems a @ x = b
    ([N,3,3], [N,3] -> [N,3]) — pure VPU elementwise ops.

    jnp.linalg.solve lowers to batched LU, which is pathological on TPU for
    tiny matrices: measured 714 ms vs 9.5 ms for 50 x 16384 solves (75x).
    The systems here are damped JtJ (SPD, conditioned by the LM lambda), so
    f32 Cramer is well within the accuracy an LM step direction needs — the
    step-acceptance check guards the rest.
    """
    a00, a01, a02 = a[:, 0, 0], a[:, 0, 1], a[:, 0, 2]
    a10, a11, a12 = a[:, 1, 0], a[:, 1, 1], a[:, 1, 2]
    a20, a21, a22 = a[:, 2, 0], a[:, 2, 1], a[:, 2, 2]
    c00 = a11 * a22 - a12 * a21
    c10 = -(a01 * a22 - a02 * a21)
    c20 = a01 * a12 - a02 * a11
    c01 = -(a10 * a22 - a12 * a20)
    c11 = a00 * a22 - a02 * a20
    c21 = -(a00 * a12 - a02 * a10)
    c02 = a10 * a21 - a11 * a20
    c12 = -(a00 * a21 - a01 * a20)
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) / det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) / det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


@functools.partial(jax.jit, static_argnums=(2,))
def _lm_fit_chunk(curves: jax.Array, quad_tree, cfg: PKConfig) -> jax.Array:
    quad = quad_tree
    n, t_steps = curves.shape
    params = _init_params(n, cfg)

    from stf_unet_tpu.pk.tofts import (_dual_sums, extended_tofts_from_sums,
                                       extended_tofts_with_jacobian)

    def res_and_jac(p):
        pred, jac = extended_tofts_with_jacobian(quad, p[:, 0], p[:, 1],
                                                 p[:, 2])
        return pred - curves, jac  # [N, T], [N, T, 3]

    def residuals(p):
        # forward-only: ride the fused kernel on TPU too
        s, _ = _dual_sums(quad, p[:, 0] / p[:, 1], "auto")
        return extended_tofts_from_sums(quad, p[:, 0], p[:, 2], s) - curves

    def step(carry, _):
        p, lam = carry
        r, jac = res_and_jac(p)
        cost_p = jnp.sum(r * r, axis=1)                  # free from r
        jtj = jnp.einsum("nti,ntj->nij", jac, jac)       # [N,3,3]
        jtr = jnp.einsum("nti,nt->ni", jac, r)           # [N,3]
        damped = jtj + (lam[:, None, None] + 1e-12) * jnp.eye(3)[None]
        delta = _solve3x3(damped, -jtr)
        cand = _clamp(p + delta, cfg)
        r_cand = residuals(cand)                         # one extra forward
        cost_cand = jnp.sum(r_cand * r_cand, axis=1)
        improved = cost_cand < cost_p
        p_next = jnp.where(improved[:, None], cand, p)
        lam_next = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam_next = jnp.clip(lam_next, 1e-8, 1e8)
        return (p_next, lam_next), None

    lam0 = jnp.full((n,), 1e-3, jnp.float32)
    (params, _), _ = jax.lax.scan(step, (params, lam0), None,
                                  length=cfg.lm_iters)
    return params


def _fit_chunked(curves: np.ndarray, quad: ToftsQuadrature, cfg: PKConfig,
                 chunk_fn: Callable, mesh=None) -> np.ndarray:
    n = curves.shape[0]
    if n == 0:
        return np.zeros((0, 3), np.float32)
    n_shards = 1 if mesh is None else mesh.size
    if mesh is not None:
        sharded_fn = _sharded_chunk_fn(chunk_fn, mesh, cfg)
        from stf_unet_tpu.core.mesh import batch_sharding, replicated_sharding
        in_sharding = batch_sharding(mesh, 2)
        quad = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, replicated_sharding(mesh)), quad)
    # Each device keeps the same per-shard working-set cap (CHUNK voxels),
    # so an N-device mesh fits N*CHUNK voxels per dispatch — linear scaling.
    step = CHUNK * n_shards
    out = []
    for start in range(0, n, step):
        chunk = curves[start:start + step]
        m = chunk.shape[0]
        # Bucket the PER-SHARD size (ceil(m / n_shards)) so the compile-count
        # bound stays O(log2(CHUNK/MIN_BUCKET)) per (solver, mesh).
        pad = _bucket_size(-(-m // n_shards)) * n_shards - m
        if pad > 0:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        if mesh is not None:
            x = jax.device_put(jnp.asarray(chunk), in_sharding)
            res = sharded_fn(x, quad)
        else:
            res = chunk_fn(jnp.asarray(chunk), quad, cfg)
        fitted = np.asarray(res[0] if isinstance(res, tuple) else res)
        out.append(fitted[:m])
    return np.concatenate(out, axis=0)


def fit_adam(curves: np.ndarray, quad: ToftsQuadrature, cfg: PKConfig,
             mesh=None) -> np.ndarray:
    """[N, T] signal curves -> [N, 3] (Ktrans, ve, vp), Adam parity path.

    mesh: optional 1-D data mesh (core.mesh.create_mesh) — shards the voxel
    axis across devices; results are identical to the single-device path
    (per-voxel solver, tested bitwise on the simulated 8-device mesh).
    """
    return _fit_chunked(curves, quad, cfg, _adam_fit_chunk, mesh=mesh)


def fit_adam_debug(curves: np.ndarray, quad: ToftsQuadrature, cfg: PKConfig
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """fit_adam plus the per-epoch loss history (mean over chunks) for the
    reference's training_loss.png debug render (ref:pk_fitting.py:357-366)."""
    n = curves.shape[0]
    if n == 0:
        return (np.zeros((0, 3), np.float32),
                np.zeros((cfg.num_epochs,), np.float32))
    out, losses = [], []
    for start in range(0, n, CHUNK):
        chunk = curves[start:start + CHUNK]
        m = chunk.shape[0]
        pad = _bucket_size(m) - m
        if pad > 0:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        fitted, row_losses = _adam_fit_chunk(jnp.asarray(chunk), quad, cfg,
                                             True)
        out.append(np.asarray(fitted)[:m])
        losses.append(np.asarray(row_losses)[:, :m].sum(axis=1))
    return (np.concatenate(out, axis=0),
            np.sum(losses, axis=0) / n)


def fit_lm(curves: np.ndarray, quad: ToftsQuadrature, cfg: PKConfig,
           mesh=None) -> np.ndarray:
    """[N, T] signal curves -> [N, 3], projected Levenberg-Marquardt.

    mesh: optional 1-D data mesh — voxel-axis data parallelism (see
    fit_adam); the fused Pallas quadrature kernel runs per-shard under
    shard_map.
    """
    return _fit_chunked(curves, quad, cfg, _lm_fit_chunk, mesh=mesh)


def convert_signal_to_concentration(signal: jax.Array,
                                    baseline_indices=(0,)) -> jax.Array:
    """Relative enhancement (S - S0)/S0 (ref:131-155; defined but unused by
    the reference fit path — provided for completeness)."""
    baseline = jnp.mean(signal[:, jnp.asarray(baseline_indices)], axis=1,
                        keepdims=True)
    return (signal - baseline) / (baseline + 1e-6)
