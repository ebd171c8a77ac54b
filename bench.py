"""Benchmark: DCE-MRI slices/sec/chip, ours (TPU) vs reference (PyTorch CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

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
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "bench_baseline.json")

BATCH = 16
CROP = 224
T_FRAMES = 8
WARMUP = 3
ITERS = 20
PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak (bf16)


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


def tpu_reachable(timeout_s: float = 240.0):
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


def main() -> None:
    # CPU runs (either pin spelling) skip the TPU probe — but the env var
    # alone does not actually select cpu (the axon plugin overrides
    # JAX_PLATFORMS at import), so apply the pin via jax.config here,
    # exactly like tests/conftest.py and dryrun_multichip do.
    wants_cpu = (os.environ.get("STF_UNET_PLATFORM", "").lower() == "cpu"
                 or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu")
    if wants_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        problem = tpu_reachable()
        if problem is not None:
            print(json.dumps({
                "metric": "unet_train_slices_per_sec_per_chip",
                "value": None,
                "unit": "slices/sec",
                "vs_baseline": None,
                "error": f"TPU backend unreachable: {problem}",
            }))
            raise SystemExit(1)
    try:  # warm-start repeat runs; the measured loop is warm either way
        from stf_unet_tpu.core.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    f32 = measure_ours(amp=False)
    bf16 = measure_ours(amp=True)

    baseline = None
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            baseline = json.load(f).get("reference_cpu_slices_per_sec")
    if baseline is None and os.path.isdir("/root/reference"):
        try:
            baseline = measure_reference_cpu()
            with open(CACHE, "w") as f:
                json.dump({"reference_cpu_slices_per_sec": baseline,
                           "config": {"batch": BATCH, "crop": CROP,
                                      "frames": T_FRAMES,
                                      "model": "unet", "device": "cpu"}}, f)
        except Exception as e:  # pragma: no cover
            print(f"baseline measurement failed: {e}", file=sys.stderr)

    # BASELINE configs 3-5 extras (VERDICT r3 #2): the flagship train step,
    # the honest end-to-end fused augment+train (the single fused program
    # cli/train dispatches per step), flagship serving inference, and the
    # packed val epoch. All ride as extra keys; the headline `value` stays
    # the UNet f32 number for round-over-round continuity.
    from stf_unet_tpu.utils.benchkit import (measure_fused_train,
                                             measure_serving,
                                             measure_train_step,
                                             measure_val_epoch_packed)
    extras = {}
    try:
        stf = measure_train_step("stflstm", amp=True, iters=ITERS)
        extras["stflstm_train_bf16_slices_per_sec"] = stf["slices_per_sec"]
        extras["stflstm_train_bf16_tflops"] = stf["tflops"]
        extras["stflstm_train_bf16_mfu_pct"] = stf["mfu_pct"]
        extras["fused_augment_train_slices_per_sec"] = (
            measure_fused_train(iters=ITERS)["slices_per_sec"])
        extras["fused_stflstm_train_slices_per_sec"] = (
            measure_fused_train(iters=ITERS,
                                model_name="stflstm")["slices_per_sec"])
        extras["flagship_infer_bf16_slices_per_sec"] = (
            measure_serving(int8=False, iters=ITERS)["slices_per_sec"])
        extras["flagship_infer_int8_slices_per_sec"] = (
            measure_serving(int8=True, iters=ITERS)["slices_per_sec"])
        extras["val_epoch_packed_slices_per_sec"] = (
            measure_val_epoch_packed()["slices_per_sec"])
        extras["val_epoch_packed_b8_slices_per_sec"] = (
            measure_val_epoch_packed(batch_size=8)["slices_per_sec"])
    except Exception as e:  # extras must never kill the headline line
        extras["extras_error"] = str(e)[-200:]

    ours = f32["slices_per_sec"]
    rnd = lambda v, k=2: round(v, k) if v is not None else None
    print(json.dumps({
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
        **{k: (rnd(v) if isinstance(v, float) else v)
           for k, v in extras.items()},
    }))


if __name__ == "__main__":
    main()
