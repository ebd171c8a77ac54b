"""Serving export: serialize the trained model's inference function as a
portable StableHLO artifact (jax.export), weights baked in.

The reference has no serving story at all (its test.py re-imports torch +
the full source tree); this gives deployments a single self-contained
artifact that any JAX runtime of a compatible version can load with
`jax.export.deserialize(blob).call(x)` — no model code, no checkpoint
plumbing, optional symbolic batch dimension.

Usage: python -m stf_unet_tpu.cli.export --model stflstm
       --model-dir ./save_weights --output model.stablehlo
       [--crop-size 224] [--batch 0 (symbolic)] [--check]

The exported function is the unified inference forward: x [B, T(+pk), H,
W, 1] float32 -> logits [B, H, W, num_classes] float32. The LSTM runs the
scan formulation (portable across platforms; the Pallas kernels are
TPU-lowering-specific).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence


def build_inference_fn(model, variables):
    """Bake variables into a pure x -> logits closure."""
    from stf_unet_tpu.models.registry import preprocess_input

    def forward(x):
        return model.apply(variables, preprocess_input(x, model),
                           train=False)["out"]

    return forward


def export_model(args: argparse.Namespace) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from stf_unet_tpu.core.config import DataConfig, ModelConfig, OptimConfig
    from stf_unet_tpu.models.registry import create_model
    from stf_unet_tpu.train.checkpoint import CheckpointManager
    from stf_unet_tpu.train.schedule import warmup_poly_schedule
    from stf_unet_tpu.train.state import create_train_state, make_optimizer

    data_cfg = DataConfig(use_subtraction=args.use_subtraction,
                          use_pk_maps=args.use_pk_maps)
    seqs = data_cfg.resolved_sequence_types
    model_cfg = ModelConfig(model=args.model,
                            num_classes=args.num_classes - 1,
                            time_steps=len(seqs),
                            use_pk_maps=args.use_pk_maps,
                            base_c=args.base_c,
                            lstm_backend="scan")  # portable lowering
    model = create_model(model_cfg)

    t_total = len(seqs) + (3 if args.use_pk_maps else 0)
    s = args.crop_size
    optim = make_optimizer(OptimConfig(), warmup_poly_schedule(1e-3, 1, 1))
    sample = jnp.zeros((1, t_total, s, s, 1), jnp.float32)
    state = create_train_state(jax.random.key(0), model_cfg, optim, sample)

    ckpt = CheckpointManager(args.model_dir, args.model,
                             "_pk" if args.use_pk_maps else "")
    kind = "best" if ckpt.exists("best") else "latest"
    if ckpt.exists(kind):
        from stf_unet_tpu.cli.common import restore_inference_state
        state, _ = restore_inference_state(ckpt, kind)
        print(f"exporting weights from {ckpt._path(kind)}")
    else:
        if not args.allow_random_weights:
            raise FileNotFoundError(
                f"no checkpoint in {args.model_dir}; pass "
                f"--allow-random-weights to export an untrained model")
        print("warning: exporting RANDOM weights (no checkpoint found)")

    forward = build_inference_fn(model, state.variables())

    if args.batch > 0:
        x_spec = jax.ShapeDtypeStruct((args.batch, t_total, s, s, 1),
                                      jnp.float32)
    else:  # symbolic batch dimension
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, t_total, s, s, 1), jnp.float32)

    exported = jexport.export(jax.jit(forward))(x_spec)
    blob = exported.serialize()

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(blob)
    meta = {
        "model": args.model,
        "input": f"[{'b' if args.batch <= 0 else args.batch}, {t_total}, "
                 f"{s}, {s}, 1] float32",
        "output_classes": args.num_classes,
        "platforms": list(exported.platforms),
        "use_pk_maps": args.use_pk_maps,
        "lstm_backend": "scan",
        "bytes": len(blob),
    }
    with open(args.output + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {args.output} ({len(blob) / 1e6:.1f} MB) "
          f"for platforms {exported.platforms}")

    if args.check:
        restored = jexport.deserialize(blob)
        rng = np.random.default_rng(0)
        check_b = args.batch if args.batch > 0 else 2
        x = jnp.asarray(rng.normal(size=(check_b, t_total, s, s, 1)),
                        jnp.float32)
        got = np.asarray(restored.call(x))
        want = np.asarray(jax.jit(forward)(x))
        err = float(np.max(np.abs(got - want)))
        print(f"roundtrip max|diff| = {err:.2e}")
        assert err < 1e-5, "exported artifact diverges from the live model"
    return args.output


def main(argv: Optional[Sequence[str]] = None) -> str:
    from stf_unet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", type=str, default="stflstm",
                    choices=["stflstm", "unet"])
    ap.add_argument("--model-dir", type=str, default="./save_weights")
    ap.add_argument("--output", type=str, default="./model.stablehlo")
    ap.add_argument("--crop-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=0,
                    help="fixed batch size; 0 = symbolic (any batch)")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--base-c", type=int, default=64)
    ap.add_argument("--use-subtraction", action="store_true")
    ap.add_argument("--use-pk-maps", action="store_true")
    ap.add_argument("--allow-random-weights", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="deserialize and verify against the live model")
    return export_model(ap.parse_args(argv))


if __name__ == "__main__":
    main()
