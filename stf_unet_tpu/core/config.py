"""Typed configuration system.

Mirrors every reference CLI flag and hardcoded constant
(ref:train.py:96-121 flags; ref:train.py:51-74,147-148,171 constants)
as dataclass fields with CLI overrides. One config tree per entry point.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


@dataclass
class DataConfig:
    """Dataset + transform pipeline config (ref:train.py:51-74,146-148)."""

    data_path: str = "./BreaDM"
    # BreaDM DCE-MRI sequence selection (ref:my_dataset.py:31-35).
    use_subtraction: bool = False
    sequence_types: Optional[Sequence[str]] = None
    use_pk_maps: bool = False
    # Transform presets (ref:train.py:51-74).
    base_size: int = 256
    crop_size: int = 224
    hflip_prob: float = 0.5
    vflip_prob: float = 0.5
    rotate_degrees: float = 30.0
    rotate_prob: float = 0.5
    # Dataset statistics computed offline (ref:train.py:146-148).
    mean: float = 0.709
    std: float = 0.127
    # Beyond-reference on-device augmentations (all default OFF = the
    # reference's augmentation distribution exactly). They run inside the
    # same fused jitted augment program; when off they add zero ops.
    # Elastic deformation (Simard-style, control-grid form): each sample
    # draws a [grid, grid, 2] normal field scaled by alpha (source-space
    # pixels), bilinearly upsampled to the crop and added to the warp
    # coordinates — the nearest-sampled mask shares the SAME displaced
    # coordinates, so labels stay aligned. Shared-augmentation mode only.
    elastic_alpha: float = 0.0
    elastic_grid: int = 4
    elastic_prob: float = 0.5
    # Photometric jitter on the [0,1] frame intensities (PK maps and mask
    # untouched; one draw per sample shared across T — DCE-MRI semantics
    # live in temporal intensity DIFFERENCES, so per-frame photometric
    # draws would corrupt the signal the models read).
    brightness: float = 0.0    # multiplicative factor ~ U(1-b, 1+b)
    contrast: float = 0.0      # (v - mean)*f + mean, f ~ U(1-c, 1+c)
    gamma_jitter: float = 0.0  # v ** f, f ~ U(1-g, 1+g)
    noise_std: float = 0.0     # additive N(0, std) in [0,1] scale
    # Mask pixel encoding: "binary" = //255 like the reference
    # (ref:my_dataset.py:166-168 — tumor stored as 255); "index" = pixels
    # already hold class indices 0..num_classes (the multiclass extension
    # the reference's --num-classes flag implies but its /255 dataset
    # cannot feed).
    mask_format: str = "binary"
    # Loader behavior.
    prefetch: int = 2
    # Cache decoded uint8 samples in host RAM after the first epoch
    # (loader._cached_batch): converts decode-bound epochs to device-bound
    # on few-core hosts. Prints the memory estimate at startup.
    cache_ram: bool = False
    # Packed dataset root (data/pack.py; build with stf-pack): holds one
    # pack per split (train/val/test) of pre-decoded, canvas-packed uint8
    # samples served by memmap — zero image decode at run time, any epoch,
    # no RAM pin. "" = decode from the image tree as usual.
    pack_dir: str = ""
    # Background-thread host->device transfer depth for the train loop
    # (train/loop.py:_batch_to_device); 0 transfers inline.
    device_prefetch: int = 2
    # Deliberate divergence from the reference (ref:my_dataset.py:173-179):
    # the reference re-rolls the random transform per temporal frame; we use
    # one shared draw across all T frames of a sample (see SURVEY.md §7).
    shared_frame_augmentation: bool = True
    # Rotation-probability split (single-device fused train step only):
    # p(rotate)=0.5 (ref:transforms.py:137-157) means half of every batch
    # needs no per-pixel warp — those samples take a separable 2-pass slice
    # gather while the rotated bucket takes the general warp. Identical
    # augmentation distribution (the same threefry draw decides, replayed
    # on the host); unrotated samples differ from the single-program path
    # only in float association order (≤1 ulp at uint8 scale).
    # DEFAULT OFF: the split augment program alone wins (~21 vs 26.8 ms
    # avg, r4 chip session) but the fused augment+train step LOSES on the
    # current toolchain (≈94 vs 64.9 ms — the two-program structure defeats
    # XLA's augment/backward overlap; PERFORMANCE.md "rotation split").
    # The implementation stays tested and gated (perf_regression
    # rotsplit row) so a future toolchain can flip this back on.
    rotation_split: bool = False

    @property
    def resolved_sequence_types(self) -> Sequence[str]:
        if self.sequence_types is not None:
            return tuple(self.sequence_types)
        if self.use_subtraction:
            return tuple(f"SUB{i}" for i in range(1, 9))
        return tuple(f"VIBRANT+C{i}" for i in range(1, 9))


@dataclass
class ModelConfig:
    """Model family selection (ref:train.py:76-92)."""

    model: str = "stflstm"  # {"stflstm", "unet"}
    # `--num-classes` is foreground classes; +1 background applied by the
    # trainer exactly like ref:train.py:144.
    num_classes: int = 1
    # Per-frame channel count; retained for reference CLI compatibility
    # (ref:train.py:214) — the NHWC models infer it from the input shape.
    in_channels: int = 1
    time_steps: int = 8
    base_c: int = 64  # vanilla UNet width (ref:src/unet.py:7)
    use_pk_maps: bool = False
    pk_channels: int = 3
    # TPU execution knobs (stflstm only).
    # {"auto", "scan", "pallas_fused", "pallas_last"}; "pallas" (the retired
    # r1 sequence kernel) is accepted as an alias of "pallas_fused".
    lstm_backend: str = "auto"
    remat: bool = False         # rematerialize encoder activations

    @property
    def total_classes(self) -> int:
        return self.num_classes + 1


@dataclass
class OptimConfig:
    """Optimizer + schedule (ref:train.py:227-247, train_and_eval.py:414-438)."""

    lr: float = 1e-3
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    warmup: bool = True
    warmup_epochs: int = 1
    warmup_factor: float = 1e-3
    poly_power: float = 0.9
    # EMA of the weights (0 = off): ema = d*ema + (1-d)*params after each
    # optimizer apply, fused into the train-step program. Val/test/serving
    # then use the EMA weights (checkpointed alongside the raw params).
    # Typical values 0.99-0.9999. No reference counterpart.
    ema_decay: float = 0.0
    # Decay warmup d_eff = min(ema_decay, (1+n)/(10+n)) over the apply
    # count n (EfficientDet/timm scheme). Without it the EMA carries
    # 0.95^n of the INIT weights after n applies, so on short epochs val
    # (which evaluates the EMA copy) plateaus at the untrained score and
    # --early-stop-patience can fire before the average warms up.
    ema_warmup: bool = True


@dataclass
class TrainConfig:
    """Top-level training config (ref:train.py:96-121)."""

    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)

    # Global batch; 0 (CLI spelling: --batch-size auto) sizes it from the
    # XLA compiler's memory analysis of the actual train step against the
    # device's HBM budget (train/autobatch.py).
    batch_size: int = 16
    # Per-device memory budget in GiB for --batch-size auto; 0 = the
    # device's reported limit (required on backends that report none).
    auto_batch_budget_gb: float = 0.0
    # Gradient accumulation: average grads over k steps, apply AdamW once
    # per k — effective batch k*batch_size within one chip's memory
    # envelope (train/state.make_optimizer; no reference counterpart).
    grad_accum: int = 1
    # Reference evaluates with batch 1 (ref:train.py:206-211). Larger values
    # batch eval with cat_list-style 255 target padding — an APPROXIMATION:
    # pad pixels fold into class 0 of the dice (the reference's own
    # DiceCoefficient semantics, ref:train_and_eval.py:87-90) and zero-padded
    # image regions perturb predictions near pad boundaries, so metrics can
    # differ slightly from batch-1 eval.
    eval_batch_size: int = 1
    epochs: int = 100
    start_epoch: int = 0
    print_freq: int = 10
    resume: str = ""
    save_best: bool = True
    # bf16 compute policy is the TPU-native stand-in for --amp
    # (ref:train.py:112-113,240-242); no loss scaling needed on TPU.
    amp: bool = False
    # Matmul precision knob; 'default' already uses the TPU's reduced-
    # precision passes (the analogue of the reference's opt-in TF32,
    # ref:train.py:113,129-133); 'highest' forces full f32 accumulation.
    matmul_precision: str = "default"
    # Auxiliary-head loss weight flag, accepted for reference CLI parity
    # (ref:train.py:102); neither reference model emits an 'aux' head, and
    # the criterion already applies the 0.5 weighting when one exists.
    aux: bool = False
    # Per-class cross-entropy weights, comma-separated ("1.0,4.0"),
    # length = TOTAL classes (background first). The reference's criterion
    # accepts a loss_weight tensor but no flag ever wires it
    # (ref:train_and_eval.py:299-305); class weighting is the standard
    # lever for lesion/background imbalance. The dice term stays
    # unweighted, exactly like the reference's criterion. "" = uniform.
    loss_class_weights: str = ""
    silent: bool = False
    test_only: bool = False
    generate_pk_maps: bool = False
    early_stop_patience: int = 20  # ref:train.py:171
    # Stop gracefully after N train steps with a step-exact resumable
    # checkpoint (0 = off) — step-boxed runs for time-boxed TPU
    # reservations; SIGTERM/first-SIGINT trigger the same path
    # (train/preempt.py; no reference counterpart).
    stop_after_steps: int = 0
    save_dir: str = "./save_weights"
    output_dir: str = "./output"
    seed: int = 0
    # Device mesh: number of data-parallel shards; 0 = all visible devices.
    data_parallel: int = 0
    # Spatial parallelism: shard image rows over this many devices in a
    # 2-D ('data', 'space') mesh — for crops too large for one chip's
    # activations (parallel/spatial.py; GSPMD conv halo exchanges).
    # Single-process only. 1 = off.
    spatial_parallel: int = 1
    # Initialize jax.distributed for multi-host pods (core/distributed.py).
    multihost: bool = False
    # Observability (SURVEY §5): structured JSONL metrics alongside the
    # parity results .txt; optional profiler trace of the first train steps;
    # jax_debug_nans-style sanitizer for the jit'd step.
    jsonl_metrics: bool = True
    profile_dir: str = ""
    nan_check: bool = False
    # Persistent XLA compilation cache (core/cache.py): "auto" -> the
    # default per-user dir, "" -> disabled, anything else -> that path.
    compile_cache_dir: str = "auto"

    @property
    def tag_suffix(self) -> str:
        return "_pk" if self.data.use_pk_maps else ""


@dataclass(frozen=True)  # hashable: used as a static jit argument
class PKConfig:
    """Extended-Tofts fitter config (ref:pk_fitting.py:15-26,257,290-307)."""

    aif_method: str = "population"  # {"population", "modified", "auto"}
    aif_dose: float = 0.1
    time_points: Sequence[float] = tuple(float(i) for i in range(8))
    dt: float = 0.01
    # Fit hyperparameters (ref:pk_fitting.py:290-307,316).
    init_ktrans: float = 0.05
    init_ve: float = 0.1
    init_vp: float = 0.01
    lr: float = 0.005
    num_epochs: int = 100
    batch_size: int = 1024
    # Physiological clamp box (ref:pk_fitting.py:303-307).
    ktrans_bounds: Sequence[float] = (0.0, 1.0)
    ve_bounds: Sequence[float] = (0.001, 0.5)
    vp_bounds: Sequence[float] = (0.0, 0.2)
    # Tissue mask threshold factor (ref:pk_fitting.py:180).
    tissue_threshold_factor: float = 0.15
    # Fast path: vectorized Levenberg-Marquardt instead of Adam.
    solver: str = "lm"  # {"adam", "lm"}
    lm_iters: int = 50


def _parse_bool(s: str) -> bool:
    return s.lower() in ("1", "true", "yes")


def _parse_int_auto(s: str) -> int:
    return 0 if s.strip().lower() == "auto" else int(s)


def _add_dataclass_args(parser: argparse.ArgumentParser, dc: Any, prefix: str = "") -> None:
    for f in dataclasses.fields(dc):
        if dataclasses.is_dataclass(f.type) or dataclasses.is_dataclass(getattr(dc, f.name, None)):
            _add_dataclass_args(parser, getattr(dc, f.name), prefix=f"{prefix}{f.name}.")
            continue
        name = f"--{(prefix + f.name).replace('_', '-').replace('.', '-')}"
        default = getattr(dc, f.name)
        if isinstance(default, bool):
            # Bare flag sets True (reference store_true style,
            # ref:train.py:102-118); an explicit true/false value also works.
            parser.add_argument(name, type=_parse_bool, default=None,
                                nargs="?", const=True, metavar="BOOL")
        elif f.name == "batch_size" and prefix == "":
            # --batch-size auto -> 0 sentinel (train/autobatch sizing).
            parser.add_argument(name, type=_parse_int_auto, default=None)
        elif isinstance(default, (int, float, str)):
            parser.add_argument(name, type=type(default), default=None)
        else:
            parser.add_argument(name, type=str, default=None)


# Fields whose CLI value is a comma-separated tuple even for one element.
_TUPLE_FIELDS = {"sequence_types", "time_points", "ktrans_bounds",
                 "ve_bounds", "vp_bounds"}


def _apply_overrides(dc: Any, ns: argparse.Namespace, prefix: str = "") -> Any:
    updates = {}
    for f in dataclasses.fields(dc):
        val = getattr(dc, f.name)
        if dataclasses.is_dataclass(val):
            updates[f.name] = _apply_overrides(val, ns, prefix=f"{prefix}{f.name}.")
            continue
        key = (prefix + f.name).replace(".", "_")
        ov = getattr(ns, key, None)
        if ov is not None:
            if isinstance(ov, str) and (isinstance(val, tuple)
                                        or f.name in _TUPLE_FIELDS):
                ov = tuple(x.strip() for x in ov.split(",") if x.strip())
            updates[f.name] = ov
    return dataclasses.replace(dc, **updates)


def parse_config(argv: Optional[Sequence[str]] = None,
                 defaults: Optional[TrainConfig] = None) -> TrainConfig:
    """Build a TrainConfig from CLI args mirroring ref:train.py:96-121.

    Both spellings work: the reference's flat flags (`--batch-size`,
    `--use-pk-maps`, ...) and dotted dataclass paths (`--data-crop-size`).
    """
    cfg = defaults or TrainConfig()
    parser = argparse.ArgumentParser(description="STF-UNet TPU Training")
    _add_dataclass_args(parser, cfg)
    # Reference-compatible aliases (ref:train.py:96-121).
    alias = {
        "--model": ("model_model", str),
        "--data-path": ("data_data_path", str),
        "--num-classes": ("model_num_classes", int),
        "--lr": ("optim_lr", float),
        "--weight-decay": ("optim_weight_decay", float),
        "--use-pk-maps": ("data_use_pk_maps", _parse_bool),
        "--use-subtraction": ("data_use_subtraction", _parse_bool),
        "--tf32": ("matmul_precision_fast", _parse_bool),
        "--data-pack": ("data_pack_dir", str),
    }
    existing = {opt for a in parser._actions for opt in a.option_strings}
    for flag, (dest, typ) in alias.items():
        if flag not in existing:
            if typ is _parse_bool:
                parser.add_argument(flag, dest=dest, type=typ, default=None,
                                    nargs="?", const=True, metavar="BOOL")
            else:
                parser.add_argument(flag, dest=dest, type=typ, default=None)
    # Vestigial reference flags, accepted and ignored so a reference user's
    # exact command line runs unchanged: --device (JAX owns device
    # placement; use --data-parallel/--multihost), --workers (the threaded
    # HostLoader replaces worker processes; see --data-prefetch),
    # --momentum (unused by the reference too — its optimizer is AdamW,
    # ref:train.py:106,227-237; betas via --optim-beta1/2).
    for flag, dest in (("--device", "_ignored_device"),
                       ("--workers", "_ignored_workers"),
                       ("--momentum", "_ignored_momentum")):
        if flag not in existing:
            parser.add_argument(flag, dest=dest, type=str, default=None,
                                help=argparse.SUPPRESS)
    ns = parser.parse_args(argv)
    for flag, dest in (("--device", "_ignored_device"),
                       ("--workers", "_ignored_workers"),
                       ("--momentum", "_ignored_momentum")):
        if getattr(ns, dest, None) is not None:
            print(f"note: {flag} is accepted for reference compatibility "
                  "and ignored (see MIGRATION.md)")
    cfg = _apply_overrides(cfg, ns)
    if getattr(ns, "matmul_precision_fast", None):
        # --tf32: the reduced-precision matmul mode; TPU 'default' is it.
        cfg = dataclasses.replace(cfg, matmul_precision="default")
    # Keep the coupled flags in sync (ref wires --use-pk-maps into both the
    # dataset and the model, ref:train.py:181,221).
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pk_maps=cfg.data.use_pk_maps)
    )
    return cfg


def config_to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


_NESTED = {"data": DataConfig, "model": ModelConfig, "optim": OptimConfig}


def config_from_dict(cls, d: dict):
    kwargs = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for name, v in d.items():
        if name not in field_names:
            continue
        if isinstance(v, dict) and name in _NESTED:
            v = config_from_dict(_NESTED[name], v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[name] = v
    return cls(**kwargs)
