"""One-shot perf regression sweep: the framework's headline device numbers
in a single run, appended as one JSONL row (with git rev) so rounds can be
diffed. Uses the persistent compile cache — repeat runs skip the compiles.

  python tools/perf_regression.py [--out perf_history.jsonl] [--check]

--check GATES the run: each metric is compared against the most recent
value in the --out history and the process exits 1 if any regresses by
more than --tolerance (default 5%) — run at round close so kernel wins
can't silently rot. Host-link-sensitive metrics (packed val epochs, the
serving dispatch loop, bench wall-clock) get WIDER per-metric tolerances
(TOLERANCE_OVERRIDES): their point values ride the axon tunnel's
session-to-session bandwidth (17.9 vs 10.8 ms/slice packed-val across two
r4 sessions with zero code change — VERDICT r4 weak 2/8), so the default
5% would false-trip on link variance. Device-program metrics keep the
tight default. Packed-val rows additionally record the median of 3 timed
epochs plus a *_spread key (spread keys are recorded, never gated).

Rows measured (all real-chip, warm, B=16 @ 224² T=8):
  unet_f32_ms / unet_bf16_ms      pure train step (bench.py parity config)
  stflstm_bf16_ms                 flagship pure train step
  augment_ms                      device augmentation program alone
  fused_unet_bf16_ms              augment+train in one program
  fused_stflstm_bf16_ms           flagship augment+train in one program
                                  (the composed-run production step)
  rotsplit_unet_bf16_ms           augment+train with the rotation-
                                  probability split (opt-in
                                  --data-rotation-split; default off)
  eval_step_raw_bf16_ms           flagship batch-1 eval step on raw uint8
                                  (device normalize + forward + metrics)
  val_epoch_packed_ms_per_slice   full packed val epoch (eval-geometry
                                  pack -> evaluate()) per slice, flagship
  serve_bf16_ms / serve_int8_ms   serving forward ms/batch, flagship
  pk_lm_chunk_ms                  16384-voxel LM solver chunk
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Per-metric relative-regression tolerances overriding --tolerance.
# Rationale per row:
#   val_epoch_packed*: end-to-end epochs over the host link (pack read +
#     per-batch uint8 H2D); r4 measured 17.87 vs 10.8 ms/slice across two
#     sessions of the SAME code. Median-of-3 shrinks but cannot remove
#     session skew -> 0.35.
#   serve_*: per-batch dispatch loop, ~11 ms/dispatch tunnel latency is
#     ~half the serve_int8 figure -> 0.25.
#   bench_wallclock_s: dominated by compile+executable upload, measured
#     89-560 s/program across sessions (PERFORMANCE.md r4 §5) -> 0.75;
#     the gate exists to catch EXTRAS CREEP (adding programs, several
#     hundred seconds), not link weather.
#   rotsplit_unet_bf16_ms: the only measured path with a per-step host
#     CPU-jitted routing call + rot_idx H2D; single windows measured
#     63-138 ms across r4/r5 sessions with identical code. Now a
#     median-of-3 (benchkit.measure_fused_rotsplit), still
#     host-interplay-bound -> 0.35. Retired opt-in path (default off).
TOLERANCE_OVERRIDES = {
    "val_epoch_packed_ms_per_slice": 0.35,
    "val_epoch_packed_b8_ms_per_slice": 0.35,
    "serve_bf16_ms": 0.25,
    "serve_int8_ms": 0.25,
    "bench_wallclock_s": 0.75,
    "rotsplit_unet_bf16_ms": 0.35,
}


def _sync(x):
    # block_until_ready is unreliable over the axon tunnel; materialize.
    import jax.numpy as jnp
    float(jnp.sum(x if not isinstance(x, tuple) else x[0]))


def timeit(fn, *args, iters=10, key_arg=False):
    import jax
    out = fn(jax.random.key(0), *args) if key_arg else fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.key(i), *args) if key_arg else fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="JSONL history file to append to (default: print only)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if any metric regresses >--tolerance vs "
                         "its most recent value in --out")
    ap.add_argument("--tolerance", type=float, default=0.05)
    args = ap.parse_args()

    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.core.dtypes import make_policy
    from stf_unet_tpu.data.transforms import TrainAugment
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    B, T, CROP, SRC = 16, 8, 224, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, CROP, CROP, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (B, CROP, CROP)), jnp.int32)
    frames = jnp.asarray(rng.integers(0, 255, (B, T, SRC, SRC)), jnp.uint8)
    masks = jnp.asarray(rng.integers(0, 2, (B, SRC, SRC)), jnp.uint8)
    sizes = jnp.asarray(np.full((B, 2), SRC), jnp.int32)

    row = {}

    def train_step_ms(model_name, amp):
        policy = make_policy(amp)
        cfg = ModelConfig(model=model_name, num_classes=1, time_steps=T)
        model = create_model(cfg, dtype=policy.compute_dtype if amp else None)
        sched = warmup_poly_schedule(1e-3, 100, 100)
        optim = make_optimizer(OptimConfig(), sched)
        box = {"s": create_train_state(jax.random.key(0), cfg, optim, x)}
        step = make_train_step(model, optim, sched, cfg.total_classes)

        def run():
            # the step donates its state argument: rebind every call
            box["s"], loss, _ = step(box["s"], x, y)
            return loss
        return timeit(run, iters=args.iters)

    row["unet_f32_ms"] = round(train_step_ms("unet", False), 2)
    row["unet_bf16_ms"] = round(train_step_ms("unet", True), 2)
    row["stflstm_bf16_ms"] = round(train_step_ms("stflstm", True), 2)

    aug = TrainAugment(DataConfig(base_size=SRC, crop_size=CROP))
    row["augment_ms"] = round(timeit(
        lambda k: aug(k, frames, masks, sizes), iters=args.iters,
        key_arg=True), 2)

    # The XLA point-gather augment program, pinned regardless of the
    # production default (mxu Pallas kernel from r5): keeps the gather
    # floor visible so a toolchain move in EITHER lowering shows up.
    from stf_unet_tpu.data.transforms import force_warp_mode
    with force_warp_mode("point"):
        aug_pt = TrainAugment(DataConfig(base_size=SRC, crop_size=CROP))
        row["augment_point_ms"] = round(timeit(
            lambda k: aug_pt(k, frames, masks, sizes), iters=args.iters,
            key_arg=True), 2)

    policy = make_policy(True)
    cfg = ModelConfig(model="unet", num_classes=1, time_steps=T)
    model = create_model(cfg, dtype=policy.compute_dtype)
    sched = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), sched)
    sample = jnp.zeros((B, T, SRC, SRC, 1), jnp.float32)
    box = {"s": create_train_state(jax.random.key(0), cfg, optim, sample)}
    fused = make_train_step(model, optim, sched, cfg.total_classes,
                            augment=aug)

    # In-jit key derivation (r4): the fused step takes (root_key, epoch,
    # step) and folds augment_key inside the program — the timing loop,
    # like the real train loop, dispatches zero eager key ops.
    import jax as _jax
    fused_root = _jax.random.key(0)
    fused_i = {"i": 0}

    def run_fused():
        fused_i["i"] += 1
        box["s"], loss, _ = fused(box["s"], fused_root, 0, fused_i["i"],
                                  frames, masks, sizes, None)
        return loss
    row["fused_unet_bf16_ms"] = round(timeit(run_fused, iters=args.iters), 2)

    # Flagship fused augment+train — the production program cli/train
    # dispatches per step for the default model (the composed-run
    # workload; 60.6 ms first gate row, i.e. ~5.5 ms of augment/backward
    # overlap vs the 66 ms pure+augment sum — the 68 ms perf_loop_floor
    # figure was a higher-tunnel-load session).
    from stf_unet_tpu.utils.benchkit import (measure_fused_rotsplit,
                                             measure_fused_train,
                                             measure_serving_both,
                                             measure_val_epoch_packed_multi)
    row["fused_stflstm_bf16_ms"] = round(
        measure_fused_train(iters=args.iters,
                            model_name="stflstm")["ms_per_step"], 2)

    # Rotation-probability split variant (--data-rotation-split):
    # unrotated samples take the separable resample path.
    # NOTE: rotation split is default-OFF (loses fused on this toolchain,
    # PERFORMANCE.md r4); the row stays so a toolchain move that flips the
    # balance is visible.
    rotsplit = measure_fused_rotsplit(iters=max(args.iters, 20))
    row["rotsplit_unet_bf16_ms"] = round(rotsplit["ms_per_step"], 2)
    row["rotsplit_unet_bf16_ms_spread"] = round(
        rotsplit["spread_ms_per_step"], 2)

    # Flagship batch-1 eval step on raw uint8 inputs — the transfer-lean
    # val-epoch device program (device normalize + forward + confusion/dice).
    from stf_unet_tpu.train.loop import _EvalStepCache
    from stf_unet_tpu.metrics.confusion import confusion_init

    data_cfg = DataConfig(base_size=SRC, crop_size=CROP)
    ecfg = ModelConfig(model="stflstm", num_classes=1, time_steps=T)
    emodel = create_model(ecfg, dtype=make_policy(True).compute_dtype)
    esample = jnp.zeros((1, T, CROP, CROP, 1), jnp.float32)
    estate = create_train_state(jax.random.key(0), ecfg,
                                make_optimizer(OptimConfig(), sched), esample)
    stepper = _EvalStepCache(emodel, 2, mean=data_cfg.mean, std=data_cfg.std)
    evars = estate.variables()
    eimg = jnp.asarray(rng.integers(0, 255, (1, T, CROP, CROP, 1)), jnp.uint8)
    etgt = jnp.asarray(rng.integers(0, 2, (1, CROP, CROP)), jnp.uint8)
    econf = confusion_init(2)
    ecum = jnp.zeros((2,), jnp.float32)
    ecnt = jnp.zeros((), jnp.int32)
    row["eval_step_raw_bf16_ms"] = round(timeit(
        lambda: stepper(evars, eimg, etgt, econf, ecum, ecnt),
        iters=args.iters), 2)

    # Full packed val epochs (decode-free: eval-geometry pack ->
    # evaluate), flagship, batch 1 + batch 8 (--eval-batch-size 8: full
    # shape-bucketed batches amortize the ~11 ms/dispatch tunnel tax) —
    # ONE shared tree/pack/state build, packed==decoded metrics asserted,
    # median of 3 timed epochs + spread recorded (spread is informational,
    # never gated; the median is gated at the link-aware 0.35 tolerance).
    packed = measure_val_epoch_packed_multi(batch_sizes=(1, 8))
    row["val_epoch_packed_ms_per_slice"] = round(
        packed[1]["ms_per_slice"], 2)
    row["val_epoch_packed_ms_per_slice_spread"] = round(
        packed[1]["spread_ms_per_slice"], 2)
    row["val_epoch_packed_b8_ms_per_slice"] = round(
        packed[8]["ms_per_slice"], 2)
    row["val_epoch_packed_b8_ms_per_slice_spread"] = round(
        packed[8]["spread_ms_per_slice"], 2)

    # Serving forwards, flagship @ B16 224²: bf16 and post-training int8
    # (gates the measured int8 win — VERDICT r3 #6), shared model build.
    serving = measure_serving_both(iters=args.iters)
    row["serve_bf16_ms"] = round(serving["bf16"]["ms_per_batch"], 2)
    row["serve_int8_ms"] = round(serving["int8"]["ms_per_batch"], 2)

    from stf_unet_tpu.core.config import PKConfig
    from stf_unet_tpu.pk.aif import population_aif
    from stf_unet_tpu.pk.fit import _lm_fit_chunk
    from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch
    pk_cfg = PKConfig()
    quad = ToftsQuadrature.build(np.arange(T, dtype=np.float32) * 0.5,
                                 population_aif, pk_cfg.dt)
    true = np.stack([rng.uniform(0.05, 0.5, 16384),
                     rng.uniform(0.1, 0.4, 16384),
                     rng.uniform(0.01, 0.1, 16384)], 1).astype(np.float32)
    curves = jnp.asarray(extended_tofts_batch(
        quad, jnp.asarray(true[:, 0]), jnp.asarray(true[:, 1]),
        jnp.asarray(true[:, 2])))
    row["pk_lm_chunk_ms"] = round(timeit(
        lambda: _lm_fit_chunk(curves, quad, pk_cfg), iters=5), 2)

    # bench.py's own wall-clock (VERDICT r4 #1d: gate extras creep before
    # the driver's timeout finds it). bench.py writes bench_last.json after
    # a full run; a run that skipped extras is not comparable, so it is
    # recorded but not gated.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_path = os.path.join(repo, "bench_last.json")
    if os.path.exists(last_path):
        try:
            with open(last_path) as f:
                last = json.load(f)
            if not last.get("extras_skipped"):
                row["bench_wallclock_s"] = round(
                    float(last["bench_wallclock_s"]), 1)
            else:
                print(f"  bench_wallclock_s not gated: last bench run "
                      f"skipped extras {last['extras_skipped']}",
                      file=sys.stderr)
        except (OSError, KeyError, ValueError) as e:
            print(f"  bench_last.json unreadable: {e}", file=sys.stderr)

    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        rev = "unknown"
    record = {"rev": rev, **row}
    print(json.dumps(record))

    regressions = []
    if args.check and args.out and os.path.exists(args.out):
        # Most recent historical value per metric (rows may carry different
        # metric sets as the sweep grows).
        last = {}
        with open(args.out) as f:
            for line in f:
                line = line.strip()
                if line:
                    prev = json.loads(line)
                    for k, v in prev.items():
                        if k != "rev" and isinstance(v, (int, float)):
                            last[k] = (v, prev.get("rev", "?"))
        for k, v in row.items():
            if k not in last or not isinstance(v, (int, float)):
                continue
            if k.endswith("_spread"):
                continue  # informational only, never gated
            old, old_rev = last[k]
            tol = TOLERANCE_OVERRIDES.get(k, args.tolerance)
            delta = (v - old) / old if old else 0.0
            marker = ""
            if delta > tol:
                regressions.append(k)
                marker = f"  <-- REGRESSION (tol {tol * 100:.0f}%)"
            print(f"  {k}: {old} ({old_rev}) -> {v}  "
                  f"{delta * 100:+.1f}%{marker}")

    # A regressed row must NOT become the next run's baseline (the gate
    # would self-heal after reporting a persistent regression exactly
    # once), so the row is appended only when the gate passes.
    if args.out and not regressions:
        with open(args.out, "a") as f:
            f.write(json.dumps(record) + "\n")

    if regressions:
        print(f"perf regression gate FAILED (per-metric tolerance, default "
              f"{args.tolerance * 100:.0f}%): "
              f"{', '.join(regressions)} — row NOT appended to {args.out}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
