"""Shared measurement helpers for bench.py and tools/perf_regression.py.

Each helper measures ONE headline workload (BASELINE.md configs 2-5) on the
current default JAX backend and returns a plain dict of numbers. They are
deliberately self-contained (build their own model/state) so the two
consumers cannot drift apart: the driver-visible bench line and the perf
gate read the SAME code.

Timing convention: materialize a scalar from the result to synchronize
(block_until_ready is unreliable over the tunneled axon platform), median
or mean over `iters` warm iterations after explicit warmup.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak (bf16)

_B, _T, _CROP, _SRC = 16, 8, 224, 256


def _sync(x) -> None:
    import jax.numpy as jnp
    float(jnp.sum(x))


def measure_train_step(model_name: str, amp: bool, iters: int = 20,
                       with_flops: bool = True,
                       lstm_backend: str = "auto") -> Dict[str, Optional[float]]:
    """Pure train step (no augmentation), batch 16 @ 224² T=8 — BASELINE
    configs 2 (unet) and 3 (stflstm). Returns ms_per_step,
    slices_per_sec, and (when XLA cost analysis is available) tflops +
    mfu_pct against the v5e bf16 peak."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    policy = make_policy(amp)
    cfg = ModelConfig(model=model_name, num_classes=1, time_steps=_T,
                      lstm_backend=lstm_backend)
    model = create_model(cfg, dtype=policy.compute_dtype if amp else None)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(_B, _T, _CROP, _CROP, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (_B, _CROP, _CROP)), jnp.int32)
    state = create_train_state(jax.random.key(0), cfg, optim, x)
    step = make_train_step(model, optim, sched, cfg.total_classes)

    flops = 0.0
    if with_flops:
        try:
            compiled = step.lower(state, x, y).compile()
            analysis = compiled.cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            flops = float(analysis.get("flops", 0.0))
            step = compiled
        except Exception:
            pass
    for _ in range(3):
        state, loss, _ = step(state, x, y)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, x, y)
    _sync(loss)
    step_s = (time.perf_counter() - t0) / iters
    tflops = flops / step_s / 1e12 if flops else None
    return {
        "ms_per_step": step_s * 1e3,
        "slices_per_sec": _B / step_s,
        "tflops": tflops,
        "mfu_pct": (100.0 * tflops / PEAK_BF16_TFLOPS) if tflops else None,
    }


def measure_fused_train(iters: int = 20,
                        model_name: str = "unet",
                        lstm_backend: str = "auto") -> Dict[str, float]:
    """Fused augment+train (the honest end-to-end train step a user gets
    from cli/train): raw uint8 [B,T,256,256] batches, device-side
    augmentation + PRNG fold-ins + update all in ONE program — the loop
    dispatches zero eager device ops per step."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import (DataConfig, ModelConfig,
                                          OptimConfig)
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    policy = make_policy(True)
    cfg = ModelConfig(model=model_name, num_classes=1, time_steps=_T,
                      lstm_backend=lstm_backend)
    model = create_model(cfg, dtype=policy.compute_dtype)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (_B, _T, _SRC, _SRC)),
                         jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (_B, _SRC, _SRC)), jnp.uint8)
    sizes = jnp.asarray(np.full((_B, 2), _SRC), jnp.int32)
    sample = jnp.zeros((_B, _T, _CROP, _CROP, 1), jnp.float32)
    state = create_train_state(jax.random.key(0), cfg, optim, sample)
    aug = TrainAugment(DataConfig(base_size=_SRC, crop_size=_CROP))
    step = make_train_step(model, optim, sched, cfg.total_classes,
                           augment=aug)
    root = jax.random.key(0)
    for i in range(3):
        state, loss, _ = step(state, root, 0, i, frames, masks, sizes, None)
    _sync(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss, _ = step(state, root, 1, i, frames, masks, sizes, None)
    _sync(loss)
    step_s = (time.perf_counter() - t0) / iters
    return {"ms_per_step": step_s * 1e3, "slices_per_sec": _B / step_s}


def measure_fused_rotsplit(iters: int = 20,
                           model_name: str = "unet",
                           timed_reps: int = 3) -> Dict[str, float]:
    """Fused augment+train with the rotation-probability split: raw uint8
    batches, host bucket routing, separable+warp augmentation + update in
    one program. Buckets vary per step exactly as in training, so the
    number is the DISTRIBUTION average (all ladder sizes are pre-warmed).
    RETIRED as the default (DataConfig.rotation_split=False): wins in
    isolation, loses fused — this keeps the measurement alive for future
    toolchains."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import (DataConfig, ModelConfig,
                                          OptimConfig)
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    policy = make_policy(True)
    cfg = ModelConfig(model=model_name, num_classes=1, time_steps=_T)
    model = create_model(cfg, dtype=policy.compute_dtype)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (_B, _T, _SRC, _SRC)),
                         jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (_B, _SRC, _SRC)), jnp.uint8)
    sizes = jnp.asarray(np.full((_B, 2), _SRC), jnp.int32)
    sample = jnp.zeros((_B, _T, _CROP, _CROP, 1), jnp.float32)
    state = create_train_state(jax.random.key(0), cfg, optim, sample)
    aug = TrainAugment(DataConfig(base_size=_SRC, crop_size=_CROP))
    step = make_train_step(model, optim, sched, cfg.total_classes,
                           augment=aug, rotation_split=True)

    root = jax.random.key(0)
    root_cpu = jax.device_put(root, jax.devices("cpu")[0])
    # pre-warm every bucket ladder size (each is its own executable)
    for size in aug.rotation_bucket_sizes(_B):
        idx = np.full((size,), _B, np.int32)
        idx[: min(size, _B)] = np.arange(min(size, _B))
        state, loss, _ = step(state, root, 0, 0, frames, masks,
                              sizes, jnp.asarray(idx), None)
    _sync(loss)
    # warm the host-side rotation_bucket CPU jit too: the timed loop is
    # the ONLY measured path with a per-step host CPU-jitted call + a
    # routing H2D, which makes single-window timings volatile (63-138 ms
    # across r4/r5 sessions with identical code) — take the MEDIAN of
    # timed_reps windows, same convention as the packed-val rows.
    aug.rotation_bucket(root_cpu, 0, 0, _B)
    import statistics
    times = []
    for rep in range(max(1, timed_reps)):
        t0 = time.perf_counter()
        for i in range(iters):
            rot_idx = aug.rotation_bucket(root_cpu, rep, i, _B)
            state, loss, _ = step(state, root, rep, i, frames, masks,
                                  sizes, rot_idx, None)
        _sync(loss)
        times.append((time.perf_counter() - t0) / iters)
    step_s = statistics.median(times)
    return {"ms_per_step": step_s * 1e3, "slices_per_sec": _B / step_s,
            "spread_ms_per_step": (max(times) - min(times)) * 1e3}


def measure_serving(model_name: str = "stflstm", int8: bool = False,
                    iters: int = 20) -> Dict[str, float]:
    """The serving engine's forward (device normalize -> forward -> argmax)
    at batch 16 @ 224², bf16 or post-training int8 (BASELINE config 4's
    inference half; tools/perf_int8.py is the exploratory twin)."""
    return measure_serving_both(model_name, iters=iters,
                                variants=("int8",) if int8
                                else ("bf16",))["int8" if int8 else "bf16"]


def measure_serving_both(model_name: str = "stflstm", iters: int = 20,
                         variants=("bf16", "int8")) -> Dict[str, Dict[str, float]]:
    """bf16 AND post-training-int8 serving forwards sharing ONE model
    build + flax init + calibration batch (the init is itself a full
    compile on this host, ~1-2 min over the tunnel — sharing it halves
    the serving extras' wall-clock in bench.py, VERDICT r4 #1c)."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig, ModelConfig
    from stf_unet_tpu.data.transforms import normalize
    from stf_unet_tpu.models.registry import create_model, preprocess_input

    data_cfg = DataConfig()
    cfg = ModelConfig(model=model_name, num_classes=1, time_steps=_T)
    base_model = create_model(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(rng.integers(
        0, 256, (_B, _T, _CROP, _CROP, 1), dtype=np.uint8))
    xin = preprocess_input(normalize(x_u8, data_cfg.mean, data_cfg.std),
                           base_model)
    base_vars = jax.jit(
        lambda k: base_model.init(k, xin, train=False))(jax.random.key(0))

    out: Dict[str, Dict[str, float]] = {}
    for variant in variants:
        model, variables = base_model, base_vars
        if variant == "int8":
            from stf_unet_tpu.ops import quant
            scales = quant.calibrate(base_model, base_vars, [xin])
            variables = quant.quantize_variables(base_vars, scales)
            model = quant.QuantizedModel(base_model)

        @jax.jit
        def fwd(v, xu, model=model):
            x = normalize(xu, data_cfg.mean, data_cfg.std)
            logits = model.apply(v, preprocess_input(x, model),
                                 train=False)["out"]
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        for _ in range(3):
            res = fwd(variables, x_u8)
        _sync(res)
        t0 = time.perf_counter()
        for _ in range(iters):
            res = fwd(variables, x_u8)
        _sync(res)
        dt = (time.perf_counter() - t0) / iters
        out[variant] = {"ms_per_batch": dt * 1e3, "slices_per_sec": _B / dt}
    return out


def measure_val_epoch_packed(model_name: str = "stflstm",
                             n_samples: int = 64,
                             batch_size: int = 1,
                             timed_reps: int = 3) -> Dict[str, float]:
    """Single-batch-size wrapper over measure_val_epoch_packed_multi."""
    return measure_val_epoch_packed_multi(
        model_name, n_samples, (batch_size,), timed_reps)[batch_size]


def measure_val_epoch_packed_multi(model_name: str = "stflstm",
                                   n_samples: int = 64,
                                   batch_sizes=(1, 8),
                                   timed_reps: int = 3,
                                   ) -> Dict[int, Dict[str, float]]:
    """Packed val epoch, end to end: synthetic BreaDM val tree ->
    eval-geometry pack (stf-pack --eval-size) -> eval_batches_from_index
    over the pack -> evaluate() — the decode-free val path cli/train runs
    every epoch under --data-pack (VERDICT r3 #3).

    All batch sizes share ONE tree/pack/model/state build (VERDICT r4
    #1c); batch_size > 1 rides shape bucketing (bitwise-identical to the
    decode path AT THE SAME batch size — asserted here — the
    eval-geometry pack is fixed-shape so every batch is full). The
    decode-path oracle runs once PER batch size: metrics across batch
    sizes agree only to float-sum reassociation (the per-slice dice mean
    accumulates in a different order under bucketing), so a b1 oracle
    cannot pin a b8 run bit-for-bit. Each size measures
    `timed_reps` warm epochs and reports the MEDIAN ms/slice plus the
    max-min spread: this metric rides the host link (pack read + uint8
    H2D per batch), so single-epoch point values vary with tunnel load
    session to session (17.9 vs 10.8 ms/slice recorded across r4
    sessions, VERDICT r4 weak 2/8)."""
    import shutil
    import statistics
    import tempfile

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.data.index import DatasetIndex
    from stf_unet_tpu.data.pack import open_split_pack, write_pack
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import eval_batches_from_index, evaluate
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    work = tempfile.mkdtemp(prefix="stf_valbench_")
    try:
        slices = max(1, n_samples // 4)
        make_synthetic_breadm(work + "/tree", splits=("val",),
                              patients_per_split=4,
                              slices_per_patient=slices,
                              size=_SRC, time_steps=_T)
        data_cfg = DataConfig(base_size=_SRC, crop_size=_CROP)
        index = DatasetIndex(work + "/tree", "val",
                             data_cfg.resolved_sequence_types)
        write_pack(index, work + "/pack/val", eval_size=_CROP)
        pack = open_split_pack(work + "/pack", "val")

        cfg = ModelConfig(model=model_name, num_classes=1, time_steps=_T)
        model = create_model(cfg, dtype=jnp.bfloat16)
        sched = warmup_poly_schedule(1e-3, 100, 100)
        optim = make_optimizer(OptimConfig(), sched)
        sample = jnp.zeros((1, _T, _CROP, _CROP, 1), jnp.float32)
        state = create_train_state(jax.random.key(0), cfg, optim, sample)

        def run(pack_arg, bs):
            return evaluate(state, model,
                            eval_batches_from_index(index, data_cfg,
                                                    pack=pack_arg,
                                                    batch_size=bs),
                            2, data_cfg=data_cfg)

        n = len(index)
        out: Dict[int, Dict[str, float]] = {}
        for bs in batch_sizes:
            decoded = run(None, bs)  # decode-path oracle, same bs
            packed = run(pack, bs)   # warm (compiles, page cache)
            assert packed["dice"] == decoded["dice"], (
                "packed val metrics diverged from the decode path")
            assert (packed["confusion_matrix"]
                    == decoded["confusion_matrix"]).all()
            times = []
            for _ in range(max(1, timed_reps)):
                t0 = time.perf_counter()
                run(pack, bs)
                times.append(time.perf_counter() - t0)
            dt = statistics.median(times)
            out[bs] = {"ms_per_slice": dt / n * 1e3,
                       "slices_per_sec": n / dt,
                       "spread_ms_per_slice": (max(times) - min(times))
                       / n * 1e3,
                       "n_samples": n, "timed_reps": len(times)}
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
