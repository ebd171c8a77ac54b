"""Post-training int8 quantization (PTQ) for the serving/eval forward path.

TPU rationale and an honest caveat: the v5e MXU advertises ~2x int8 peak,
but on the toolchain this repo was built against XLA's int8 CONV lowering
measured ~parity with bf16 (PERFORMANCE.md "int8 quantized inference" —
real-chip probes), so this module ships as a DEPLOYMENT capability with a
measured accuracy story, not a speedup claim: the scheme is
toolchain-portable (`lax.conv_general_dilated` on int8 operands with
`preferred_element_type=int32` is exactly what lowers onto the int8 MXU
where the runtime supports it), `tools/perf_int8.py` measures the
end-to-end bf16-vs-int8 ratio on whatever chip it runs on, and
`cli/quantize.py` prints the float-vs-int8 dice delta before anything
serves. The reference has no quantization story at all (its test.py runs
the f32 torch model, ref:test.py:137-196). No custom kernels — the
requantize/dequantize elementwise work fuses into the surrounding
program.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8, `wq = round(w / sw)`,
    `sw = absmax(w, axis=(kh,kw,in)) / 127` — computed offline once.
  * activations: per-tensor symmetric int8 with STATIC scales from a
    calibration pass over representative data (`calibrate`), so serving
    needs no data-dependent reductions before each conv.
  * accumulation in int32; dequantize `y * (sw * sx)` in f32, add bias,
    cast back to the model compute dtype. BatchNorm (running stats at
    inference) stays in the compute dtype and fuses as usual.

Mechanics: no model-code changes. `flax.linen.intercept_methods` swaps
every calibrated `nn.Conv.__call__` for the int8 form; the quantized
weights ride the variables tree as a `"quant"` collection whose nesting
mirrors `"params"`, so `core.mesh.replicate` / GSPMD sharding and the
serving engine's `model.apply(variables, ...)` contract work unchanged.
Non-conv compute (ConvTranspose upsamples, the pixel LSTM, resizes)
keeps the bf16/f32 path — convs are where the serving FLOPs are.

Flow:
  scales = calibrate(model, variables, batches)      # data pass
  qvars  = quantize_variables(model_vars, scales)    # adds "quant"
  qmodel = QuantizedModel(model)                     # .apply intercepts
  qmodel.apply(qvars, x, train=False)                # int8 convs

`cli/quantize.py` packages this as a user command (calibrate on a dataset
split, persist `quant_scales.json` next to the checkpoint, report the
int8-vs-float metric delta); `cli/serve.py --dtype int8` consumes it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SCALES_FILENAME = "quant_scales.json"
_EPS = 1e-8


def _path_of(mod: nn.Module) -> str:
    return "/".join(mod.path)


def _conv_geometry(mod: nn.Conv) -> Tuple[Any, Any]:
    """Canonicalize the nn.Conv stride/padding attributes used by the
    models in this package (int | tuple | 'SAME'/'VALID')."""
    strides = mod.strides if mod.strides is not None else 1
    if isinstance(strides, int):
        strides = (strides, strides)
    padding = mod.padding
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return tuple(strides), padding


def quantize_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO f32 kernel -> (int8 kernel, per-out-channel f32 scale)."""
    w = jnp.asarray(w, jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), _EPS) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _int8_conv(mod: nn.Conv, x: jnp.ndarray, wq: jnp.ndarray,
               sw: jnp.ndarray, sx: jnp.ndarray,
               bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    strides, padding = _conv_geometry(mod)
    sx_scale = jnp.maximum(sx.astype(jnp.float32), _EPS) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx_scale),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sw.astype(jnp.float32) * sx_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def calibration_interceptor(stats: Dict[str, jnp.ndarray]):
    """Interceptor recording per-conv input absmax into `stats` (traced
    values — return them from the traced function to fetch)."""

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.Conv) and context.method_name == "__call__":
            path = _path_of(mod)
            absmax = jnp.max(jnp.abs(args[0])).astype(jnp.float32)
            prev = stats.get(path)
            stats[path] = absmax if prev is None else jnp.maximum(prev,
                                                                  absmax)
        return next_fun(*args, **kwargs)

    return icpt


def calibrate(model, variables, inputs: Iterable[Any],
              apply_kwargs: Optional[Mapping[str, Any]] = None
              ) -> Dict[str, float]:
    """Run the model over representative `inputs` (each already in model
    input form — normalized, preprocess_input applied) and return
    {conv_path: activation absmax} maxed over all inputs."""
    apply_kwargs = dict({"train": False} if apply_kwargs is None
                        else apply_kwargs)

    @jax.jit
    def step(variables, x):
        stats: Dict[str, jnp.ndarray] = {}
        with nn.intercept_methods(calibration_interceptor(stats)):
            model.apply(variables, x, **apply_kwargs)
        return stats

    out: Dict[str, float] = {}
    n = 0
    for x in inputs:
        stats = jax.device_get(step(variables, x))
        for path, v in stats.items():
            out[path] = max(out.get(path, 0.0), float(v))
        n += 1
    if n == 0:
        raise ValueError("calibrate() got no inputs")
    return out


def quantize_variables(variables: Mapping[str, Any],
                       scales: Mapping[str, float],
                       exclude: Sequence[str] = ()) -> Dict[str, Any]:
    """Return variables plus a `"quant"` collection mirroring `"params"`
    nesting: for every calibrated conv path, `{wq, sw, sx}`. Paths in
    `exclude` (exact match) keep the float path."""
    params = variables["params"]
    quant: Dict[str, Any] = {}
    for path, absmax in scales.items():
        if path in exclude:
            continue
        node = params
        for part in path.split("/"):
            node = node[part]
        wq, sw = quantize_kernel(node["kernel"])
        leaf = {"wq": wq, "sw": sw, "sx": jnp.float32(absmax)}
        dst = quant
        parts = path.split("/")
        for part in parts[:-1]:
            dst = dst.setdefault(part, {})
        dst[parts[-1]] = leaf
    out = dict(variables)
    out["quant"] = quant
    return out


def quantized_interceptor():
    """Interceptor replacing each nn.Conv that has a `"quant"` entry at
    its path with the int8 form; convs without one (excluded or never
    calibrated) fall through to the float path."""

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if not (isinstance(mod, nn.Conv)
                and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        q = mod.variables.get("quant")
        if not q or "wq" not in q:
            return next_fun(*args, **kwargs)
        bias = (mod.variables["params"].get("bias")
                if mod.use_bias else None)
        return _int8_conv(mod, args[0], q["wq"], q["sw"], q["sx"], bias)

    return icpt


class QuantizedModel:
    """Drop-in model wrapper: `.apply` runs with the int8-conv
    interceptor active; everything else delegates to the wrapped model
    (num_classes, input_format, ... — the engine/eval contracts)."""

    def __init__(self, model):
        object.__setattr__(self, "_model", model)

    def apply(self, variables, *args, **kwargs):
        with nn.intercept_methods(quantized_interceptor()):
            return self._model.apply(variables, *args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._model, name)


def save_scales(path: str, scales: Mapping[str, float],
                checkpoint_meta: Optional[Mapping[str, Any]] = None) -> None:
    """checkpoint_meta: identity of the calibrated checkpoint (epoch /
    best_dice from its meta.json sidecar) — consumers warn when the
    checkpoint has been retrained since calibration (stale scales serve a
    different network than the one whose accuracy delta was printed)."""
    doc: Dict[str, Any] = {"version": 1, "scales": dict(scales)}
    if checkpoint_meta:
        doc["checkpoint"] = {k: checkpoint_meta.get(k)
                             for k in ("epoch", "best_dice")}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)


def load_scales(path: str, checkpoint_meta: Optional[Mapping[str, Any]]
                = None) -> Dict[str, float]:
    """checkpoint_meta: pass the CURRENT checkpoint's meta to get a loud
    warning when the scales were calibrated against a different save
    (re-run cli/quantize after retraining)."""
    with open(path) as f:
        doc = json.load(f)
    if "scales" not in doc:
        raise ValueError(f"{path} is not a quant_scales file")
    saved = doc.get("checkpoint")
    if checkpoint_meta is not None and saved:
        current = {k: checkpoint_meta.get(k) for k in ("epoch", "best_dice")}
        if current != saved:
            print(f"WARNING: {path} was calibrated against checkpoint "
                  f"{saved} but the current checkpoint is {current} — "
                  "the printed accuracy delta no longer applies; re-run "
                  "cli/quantize")
    return {k: float(v) for k, v in doc["scales"].items()}


def scales_path_for(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, SCALES_FILENAME)
