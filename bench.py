"""Benchmark: DCE-MRI slices/sec/chip, ours (TPU) vs reference (PyTorch CPU).

Prints the headline JSON line ({"metric", "value", "unit", "vs_baseline",
...}) TWICE: once the moment the core f32/bf16/baseline numbers are known
(deadline-proof: the driver reads the tail of stdout, so if a driver
timeout kills the extras phase the already-measured headline still lands —
BENCH_r04.json was rc=124/parsed:null because the old single-print-at-end
structure forfeited everything, VERDICT r4 #1), and once more at the end
with the extras merged in. Extras run under an explicit wall-clock budget
(env STF_BENCH_BUDGET_S, default 1500 s total bench wall-clock, calibrated
against r3's successful driver run); whatever doesn't fit is listed in
`extras_skipped` instead of risking the artifact.

Headline config = BASELINE.md config 2: 2-D UNet, batch 16, 224x224, 8
temporal frames as stacked channels, dice+CE loss, AdamW train step. The
headline value stays the f32 number (dtype-parity with the reference, whose
AMP is opt-in, ref:train.py:112-113) so rounds compare like-for-like; the
bf16 production number plus achieved TFLOP/s / MFU for both dtypes ride as
extra keys. The reference baseline is the SAME workload run through the
reference's own torch model (/root/reference/src/unet.py) on CPU, measured
once and cached in bench_baseline.json (the reference's STF-LSTM-UNet
cannot run at all: its decoder stops at half resolution and torchvision is
unavailable — see SURVEY.md §7).

Env knobs:
  STF_BENCH_BUDGET_S   total wall-clock budget, default 1500
  STF_BENCH_PROBE_S    TPU-reachability probe timeout, default 120
  STF_BENCH_ITERS      timed iterations per program, default 20
  STF_BENCH_SMOKE=1    tiny-shape CPU smoke (quick test tier): headline
                       path only, 2 iters, no probe/extras/torch run
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "bench_baseline.json")
LAST = os.path.join(REPO, "bench_last.json")

SMOKE = os.environ.get("STF_BENCH_SMOKE", "") == "1"
BATCH = 2 if SMOKE else 16
CROP = 32 if SMOKE else 224
T_FRAMES = 8
WARMUP = 1 if SMOKE else 3
ITERS = 2 if SMOKE else int(os.environ.get("STF_BENCH_ITERS", "20"))
BUDGET_S = float(os.environ.get("STF_BENCH_BUDGET_S", "1500"))
PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak (bf16)

T_START = time.monotonic()


def _elapsed() -> float:
    return time.monotonic() - T_START


def _log(msg: str) -> None:
    # Progress to stderr: if the driver kills us, the tail shows the stage.
    print(f"[bench +{_elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


def measure_ours(amp: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stf_unet_tpu.core.config import ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.loop import make_train_step
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    from stf_unet_tpu.core.dtypes import make_policy
    model_cfg = ModelConfig(model="unet", num_classes=1, time_steps=T_FRAMES)
    policy = make_policy(amp)
    model = create_model(model_cfg,
                         dtype=policy.compute_dtype if amp else None)
    schedule = warmup_poly_schedule(1e-3, 100, 100)
    optim = make_optimizer(OptimConfig(), schedule)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, T_FRAMES, CROP, CROP, 1)),
                    jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (BATCH, CROP, CROP)), jnp.int32)
    state = create_train_state(jax.random.key(0), model_cfg, optim, x)
    step = make_train_step(model, optim, schedule, model_cfg.total_classes)

    # One AOT compile serves both the FLOP count and the timed loop (a
    # separate lowering would double the minutes-long compile on this host).
    flops = 0.0
    try:
        compiled = step.lower(state, x, y).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        step = compiled
    except Exception:
        pass  # fall back to the jitted step

    for _ in range(WARMUP):
        state, loss, _ = step(state, x, y)
    float(loss)  # block_until_ready is unreliable on the tunneled axon
    # platform; materializing the loss value forces completion of the whole
    # dependency chain.
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss, _ = step(state, x, y)
    float(loss)
    dt = time.perf_counter() - t0
    step_s = dt / ITERS
    tflops = flops / step_s / 1e12 if flops else None
    return {
        "slices_per_sec": BATCH * ITERS / dt,
        "ms_per_step": step_s * 1000.0,
        "tflops": tflops,
        "mfu_pct": (100.0 * tflops / PEAK_BF16_TFLOPS) if tflops else None,
    }


def measure_reference_cpu() -> float:
    """Run the reference's own UNet + loss on torch CPU, same workload."""
    import importlib.util

    import numpy as np
    import torch

    def load_ref(name, rel):
        # Load module files directly: the reference packages' __init__ pulls
        # in torchvision, which this image lacks.
        spec = importlib.util.spec_from_file_location(
            name, os.path.join("/root/reference", rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    ref_unet = load_ref("ref_unet", "src/unet.py")
    ref_dice = load_ref("ref_dice", "train_utils/dice_coefficient_loss.py")

    torch.manual_seed(0)
    model = ref_unet.UNet(in_channels=T_FRAMES, num_classes=2)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)

    rng = np.random.default_rng(0)
    x = torch.tensor(rng.normal(size=(BATCH, T_FRAMES, CROP, CROP)),
                     dtype=torch.float32)
    y = torch.tensor(rng.integers(0, 2, (BATCH, CROP, CROP)),
                     dtype=torch.int64)

    def criterion(outputs, target):
        # the reference training loss: CE + multiclass dice
        # (ref:train_utils/train_and_eval.py:299-313), via the reference's
        # own dice implementation
        loss = torch.nn.functional.cross_entropy(outputs["out"], target)
        dice_target = ref_dice.build_target(target, 2)
        return loss + ref_dice.dice_loss(outputs["out"], dice_target,
                                         multiclass=True)

    # 20 timed iters (VERDICT r2 weak 4: 3 was fine for magnitude, too noisy
    # round-over-round) and the MEDIAN per-step time, robust to host
    # scheduling spikes on this 1-core machine.
    iters = 20
    times = []
    for i in range(iters + 1):
        t0 = time.perf_counter()
        out = model(x)
        loss = criterion(out, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if i > 0:  # skip first (allocation warmup)
            times.append(time.perf_counter() - t0)
    times.sort()
    median = times[len(times) // 2]
    return BATCH / median


def tpu_reachable(timeout_s: float):
    """Probe backend init in a SUBPROCESS with a timeout: when the axon
    TPU tunnel is down, jax.devices() hangs indefinitely (it does not
    error), which would hang the whole bench. Returns None when reachable,
    else a diagnostic string (timeout vs the subprocess's actual stderr —
    a fast ImportError/plugin failure is NOT a down tunnel)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return (f"jax.devices() hung past the {timeout_s:.0f}s probe "
                "timeout (axon tunnel down)")
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        return "backend init failed: " + " | ".join(tail)
    return None


def run_extras(rnd) -> dict:
    """BASELINE configs 3-5 extras (VERDICT r3 #2): the flagship train
    step, the honest end-to-end fused augment+train (the single fused
    program cli/train dispatches per step), flagship serving inference,
    and the packed val epoch. All ride as extra keys on the second
    headline print; the headline `value` stays the UNet f32 number for
    round-over-round continuity.

    Deadline behavior (VERDICT r4 #1b): extras run in priority order;
    before each, the remaining budget is checked against a conservative
    cost estimate (the largest cost observed so far this run — compile +
    executable upload dominates and is 89-560 s/program on this host,
    PERFORMANCE.md r4 §5). Anything skipped or failed is reported, never
    fatal."""
    from stf_unet_tpu.utils.benchkit import (measure_fused_train,
                                             measure_serving_both,
                                             measure_train_step,
                                             measure_val_epoch_packed_multi)
    extras: dict = {}
    skipped: list = []
    errors: list = []
    # Initial per-extra cost estimate: the headline phase compiled two
    # train-step programs; half its elapsed time is a same-host estimate
    # of one more compile+measure. Refined to the max observed as we go.
    est = {"s": max(60.0, _elapsed() / 2.0)}

    def stage(name, fn):
        remaining = BUDGET_S - _elapsed()
        if remaining < est["s"]:
            skipped.append(name)
            _log(f"skip {name}: {remaining:.0f}s left < {est['s']:.0f}s est")
            return
        _log(f"extra: {name}")
        t0 = time.monotonic()
        try:
            fn()
        except Exception as e:  # extras must never kill the artifact
            errors.append(f"{name}: {str(e)[-120:]}")
            _log(f"extra {name} FAILED: {e}")
        est["s"] = max(est["s"], (time.monotonic() - t0) * 1.1)

    def flagship_fused():
        extras["fused_stflstm_train_slices_per_sec"] = (
            measure_fused_train(iters=ITERS,
                                model_name="stflstm")["slices_per_sec"])

    def flagship_pure():
        stf = measure_train_step("stflstm", amp=True, iters=ITERS)
        extras["stflstm_train_bf16_slices_per_sec"] = stf["slices_per_sec"]
        extras["stflstm_train_bf16_tflops"] = stf["tflops"]
        extras["stflstm_train_bf16_mfu_pct"] = stf["mfu_pct"]

    def unet_fused():
        extras["fused_augment_train_slices_per_sec"] = (
            measure_fused_train(iters=ITERS)["slices_per_sec"])

    def serving():
        both = measure_serving_both(iters=ITERS)
        extras["flagship_infer_bf16_slices_per_sec"] = (
            both["bf16"]["slices_per_sec"])
        extras["flagship_infer_int8_slices_per_sec"] = (
            both["int8"]["slices_per_sec"])

    def packed_val():
        multi = measure_val_epoch_packed_multi(batch_sizes=(1, 8))
        extras["val_epoch_packed_slices_per_sec"] = (
            multi[1]["slices_per_sec"])
        extras["val_epoch_packed_b8_slices_per_sec"] = (
            multi[8]["slices_per_sec"])

    # Priority order: the production fused flagship step first (the number
    # the composed run lives on), then flagship MFU, then the rest.
    stage("fused_stflstm", flagship_fused)
    stage("stflstm_pure", flagship_pure)
    stage("fused_unet", unet_fused)
    stage("serving", serving)
    stage("packed_val", packed_val)

    if skipped:
        extras["extras_skipped"] = skipped
    if errors:
        extras["extras_error"] = "; ".join(errors)[-300:]
    return extras


def main() -> None:
    # CPU runs (either pin spelling) skip the TPU probe — but the env var
    # alone does not actually select cpu (the axon plugin overrides
    # JAX_PLATFORMS at import), so apply the pin via jax.config here,
    # exactly like tests/conftest.py and dryrun_multichip do.
    wants_cpu = (os.environ.get("STF_UNET_PLATFORM", "").lower() == "cpu"
                 or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
                 or SMOKE)
    if wants_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        probe_s = float(os.environ.get("STF_BENCH_PROBE_S", "120"))
        problem = tpu_reachable(probe_s)
        if problem is not None:
            print(json.dumps({
                "metric": "unet_train_slices_per_sec_per_chip",
                "value": None,
                "unit": "slices/sec",
                "vs_baseline": None,
                "error": f"TPU backend unreachable: {problem}",
            }), flush=True)
            raise SystemExit(1)
    try:  # warm-start repeat runs; the measured loop is warm either way
        from stf_unet_tpu.core.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    _log("headline: unet f32")
    f32 = measure_ours(amp=False)
    _log("headline: unet bf16")
    bf16 = measure_ours(amp=True)

    baseline = None
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        # the smoke tier must not compare tiny shapes to the full-size
        # cached baseline
        cfg = cached.get("config", {})
        if cfg.get("batch") == BATCH and cfg.get("crop") == CROP:
            baseline = cached.get("reference_cpu_slices_per_sec")
    if (baseline is None and not SMOKE
            and os.path.isdir("/root/reference")):
        _log("measuring torch-CPU reference baseline")
        try:
            baseline = measure_reference_cpu()
            with open(CACHE, "w") as f:
                json.dump({"reference_cpu_slices_per_sec": baseline,
                           "config": {"batch": BATCH, "crop": CROP,
                                      "frames": T_FRAMES,
                                      "model": "unet", "device": "cpu"}}, f)
        except Exception as e:  # pragma: no cover
            print(f"baseline measurement failed: {e}", file=sys.stderr)

    ours = f32["slices_per_sec"]
    rnd = lambda v, k=2: round(v, k) if v is not None else None
    headline = {
        "metric": "unet_train_slices_per_sec_per_chip",
        "value": round(ours, 2),
        "unit": "slices/sec",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
        "bf16_value": rnd(bf16["slices_per_sec"]),
        "bf16_vs_baseline": (round(bf16["slices_per_sec"] / baseline, 2)
                             if baseline else None),
        "f32_tflops": rnd(f32["tflops"], 1),
        "bf16_tflops": rnd(bf16["tflops"], 1),
        "f32_ms_per_step": rnd(f32["ms_per_step"], 1),
        "bf16_ms_per_step": rnd(bf16["ms_per_step"], 1),
        "bf16_mfu_pct": rnd(bf16["mfu_pct"], 1),
    }
    # FIRST print — the deadline-proof record. The driver parses the tail
    # of stdout, so this line survives even if everything after is killed.
    print(json.dumps(headline), flush=True)
    _log(f"headline printed at +{_elapsed():.0f}s; extras budget "
         f"{BUDGET_S - _elapsed():.0f}s")

    if SMOKE:
        return

    extras = run_extras(rnd)
    final = {
        **headline,
        **{k: (rnd(v) if isinstance(v, float) else v)
           for k, v in extras.items()},
        "bench_wallclock_s": round(_elapsed(), 1),
    }
    # SECOND print — the full record; being last, this is what the driver
    # parses when the run completes in time.
    print(json.dumps(final), flush=True)
    try:  # wall-clock record for the perf gate (tools/perf_regression.py)
        with open(LAST, "w") as f:
            json.dump({"bench_wallclock_s": final["bench_wallclock_s"],
                       "extras_skipped": extras.get("extras_skipped", []),
                       "extras_error": extras.get("extras_error"),
                       "budget_s": BUDGET_S,
                       "when": time.strftime("%Y-%m-%d %H:%M:%S")}, f)
    except OSError:
        pass


if __name__ == "__main__":
    main()
