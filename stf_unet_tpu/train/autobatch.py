"""Automatic batch sizing from the XLA compiler's memory analysis.

`--batch-size auto` on the train CLI: instead of trial-OOM runs (the usual
torch workflow; the reference hard-codes batch sizes, ref:train.py:99),
AOT-compile the REAL train step — the exact model/optimizer/remat/dtype
configuration about to run — at two probe batches and read
`compiled.memory_analysis()`. Temp bytes (activations + workspace) scale
linearly in batch while state bytes (params, Adam moments, BN stats) are
constant, so two points give bytes/sample and the largest batch under the
device budget. AOT lowering never executes, so probing costs two compiles
and no device memory.

The returned batch is the largest power of two that fits (predictable MXU
tiling, stable step-time scaling — PERFORMANCE.md batch-scaling table),
scaled by the mesh shard count for data-parallel runs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

DEFAULT_BUDGET_FRAC = 0.9  # leave headroom for fragmentation + async d2h


def device_budget_bytes() -> Optional[int]:
    """The accelerator's usable memory, or None when the backend does not
    report one (CPU; then an explicit budget is required)."""
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    limit = stats.get("bytes_limit")
    return int(limit) if limit else None


_MEASURE_MEMO: dict = {}


def measure_step_memory(cfg, t_total: int, batch: int,
                        canvas: Optional[Tuple[int, int]] = None
                        ) -> Tuple[int, int]:
    """-> (temp_bytes, state_bytes) at `batch`, from AOT compilation of the
    exact program cli/train runs: the FUSED augment+train step — uint8
    [B, T, ch, cw] frames in, device-side warp, forward/backward,
    AdamW update (incl. the EMA update when cfg.optim.ema_decay > 0) — so
    augmentation temps, the EMA params copy, and the uint8 wire layout
    are inside the measurement, not approximated.

    canvas: the loader's FIXED dataset canvas (HostLoader.canvas — the
    max native slice size rounded up to 32). The warp casts the whole
    canvas to the compute dtype inside the step, so probing at
    cfg.data.base_size when the dataset's native slices are larger would
    undercount every canvas-proportional term and pick an OOMing batch.
    Defaults to (base_size, base_size) for datasets already at base
    scale.

    Memoized per process (the measurement is a pure function of the
    config): pick_batch_size probes two batches, and repeated calls —
    retries, tests, a second pick in the same run — must not pay the AOT
    compile again."""
    from stf_unet_tpu.core.config import config_to_json
    memo_key = (config_to_json(cfg), t_total, batch, canvas)
    if memo_key in _MEASURE_MEMO:
        return _MEASURE_MEMO[memo_key]
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    policy = make_policy(cfg.amp)
    pk_ch = cfg.model.pk_channels if cfg.data.use_pk_maps else 0
    model_cfg = dataclasses.replace(cfg.model, time_steps=t_total - pk_ch)
    model = create_model(model_cfg, dtype=policy.compute_dtype
                         if cfg.amp else None)
    # Schedule values don't affect memory; a placeholder keeps this
    # independent of the loader (whose size depends on the answer).
    sched = warmup_poly_schedule(cfg.optim.lr, 100, 100)
    optim = make_optimizer(cfg.optim, sched,
                           grad_accum=max(int(cfg.grad_accum), 1))
    crop = cfg.data.crop_size
    ch, cw = canvas if canvas is not None else (cfg.data.base_size,
                                                cfg.data.base_size)
    t_model = t_total - pk_ch
    frames = jnp.zeros((batch, t_model, ch, cw), jnp.uint8)
    masks = jnp.zeros((batch, ch, cw), jnp.uint8)
    sizes = jnp.full((batch, 2), min(ch, cw), jnp.int32)
    pk = (jnp.zeros((batch, pk_ch, ch, cw), jnp.uint8)
          if pk_ch else None)
    x0 = jnp.zeros((batch, t_total, crop, crop, 1), jnp.float32)
    use_ema = cfg.optim.ema_decay > 0.0
    state = create_train_state(jax.random.key(0), model_cfg, optim, x0,
                               ema=use_ema)
    step = make_train_step(model, optim, sched, model_cfg.total_classes,
                           augment=TrainAugment(cfg.data),
                           ema_decay=cfg.optim.ema_decay,
                           ema_every_k=max(int(cfg.grad_accum), 1),
                           ema_warmup=cfg.optim.ema_warmup)
    key = jax.random.key(0)
    ma = step.lower(state, key, 0, 0, frames, masks, sizes,
                    pk).compile().memory_analysis()
    if ma is None:
        raise RuntimeError("backend reports no memory analysis")
    sample_bytes = ((t_model + pk_ch) * ch * cw  # uint8 frames (+pk)
                    + ch * cw                    # uint8 mask
                    + 2 * 4)                     # sizes int32
    state_bytes = int(ma.argument_size_in_bytes) - batch * sample_bytes
    result = (int(ma.temp_size_in_bytes), state_bytes)
    _MEASURE_MEMO[memo_key] = result
    return result


def pick_batch_size(cfg, t_total: int, n_shards: int = 1,
                    budget_bytes: Optional[int] = None,
                    frac: float = DEFAULT_BUDGET_FRAC,
                    probes: Tuple[int, int] = (2, 4),
                    cap: int = 1024,
                    canvas: Optional[Tuple[int, int]] = None) -> int:
    """Largest power-of-two PER-DEVICE batch whose train step fits
    `frac * budget`, times `n_shards` -> the global batch.

    budget_bytes: per-device memory; defaults to the device's reported
    limit (raises on backends that report none, e.g. CPU).
    """
    if budget_bytes is None:
        budget_bytes = device_budget_bytes()
        if budget_bytes is None:
            raise RuntimeError(
                "--batch-size auto: this backend reports no memory limit; "
                "set an explicit --batch-size")
    b0, b1 = probes
    t0, state_bytes = measure_step_memory(cfg, t_total, b0, canvas=canvas)
    t1, _ = measure_step_memory(cfg, t_total, b1, canvas=canvas)
    per_sample = (t1 - t0) / (b1 - b0)
    fixed = t0 - per_sample * b0
    usable = frac * budget_bytes - state_bytes - fixed
    if per_sample <= 0:
        raise RuntimeError(
            f"memory analysis degenerate (per-sample {per_sample} B) — "
            "set an explicit --batch-size")
    max_batch = int(usable // per_sample)
    if max_batch < 1:
        raise RuntimeError(
            f"--batch-size auto: even batch 1 does not fit "
            f"({(state_bytes + fixed + per_sample) / 2**30:.2f} GiB needed, "
            f"budget {frac * budget_bytes / 2**30:.2f} GiB) — try "
            "--model-remat true or a smaller --data-crop-size")
    batch = 1
    while batch * 2 <= min(max_batch, cap):
        batch *= 2
    print(f"auto batch: {per_sample / 2**20:.1f} MiB/sample + "
          f"{(state_bytes + fixed) / 2**30:.2f} GiB fixed against "
          f"{frac * budget_bytes / 2**30:.2f} GiB budget -> "
          f"{batch}/device" + (f" x {n_shards} shards = {batch * n_shards}"
                               if n_shards > 1 else ""))
    return batch * n_shards
