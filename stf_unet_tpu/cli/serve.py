"""Model-serving entry point: one process owns the chip and serves
segmentation over HTTP with dynamic batching.

The reference has no deployment path (ref:test.py is a batch CLI); this is
the production serving story of the TPU rebuild — see serve/engine.py
(compiled shape-bucketed forward, request coalescing) and serve/http.py
(stdlib HTTP front end, /healthz /metrics /v1/segment).

Usage: python -m stf_unet_tpu.cli.serve --model stflstm
       --model-dir ./save_weights [--host 0.0.0.0] [--port 8421]
       [--max-batch 8] [--batch-window-ms 5] [--no-warmup]
       [--dtype bf16|f32|int8] [--data-parallel N] [--tiled]

--data-parallel N shards request batches over N chips from ONE serving
process (params replicated, GSPMD collectives over ICI); batch buckets
floor at N so every shard stays non-empty.

Client example:
    buf = io.BytesIO(); np.savez(buf, frames=frames_u8_THW)
    r = requests.post(f"http://host:port/v1/segment?format=npz",
                      data=buf.getvalue())
    mask = np.load(io.BytesIO(r.content))["mask"]
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="STF-UNet TPU serving")
    p.add_argument("--model", type=str, default="stflstm",
                   choices=["unet", "stflstm"])
    p.add_argument("--model-dir", type=str, default="./save_weights")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8421)
    p.add_argument("--use-subtraction", action="store_true")
    p.add_argument("--use-pk-maps", action="store_true")
    p.add_argument("--num-classes", type=int, default=None,
                   help="default: from checkpoint config")
    p.add_argument("--base-c", type=int, default=None,
                   help="default: from checkpoint config")
    p.add_argument("--crop-size", type=int, default=None,
                   help="default: from checkpoint config")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["bf16", "f32", "int8"],
                   help="serving compute dtype (bf16 default — the TPU "
                        "inference policy; params stay f32). int8 runs "
                        "every calibrated conv as s8xs8->s32 with the rest "
                        "in bf16 — requires quant_scales.json from "
                        "cli/quantize next to the checkpoint; whether it "
                        "beats bf16 is toolchain-dependent, see "
                        "PERFORMANCE.md and tools/perf_int8.py")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard request batches over N chips from one "
                        "serving process (0 = all visible devices); "
                        "batch buckets floor at N")
    p.add_argument("--max-batch", type=int, default=8,
                   help="dynamic batching cap (power-of-two buckets)")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="how long a request waits for batch peers")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip pre-compiling the square-input buckets")
    p.add_argument("--tiled", action="store_true",
                   help="segment volumes whose geometry differs from the "
                        "trained crop at NATIVE resolution via "
                        "sliding-window tiles (serve/tiled) instead of a "
                        "per-shape full-conv compile")
    p.add_argument("--tile-overlap", type=float, default=0.5,
                   help="tile overlap fraction for --tiled (default 0.5)")
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation: serve the 4-"
                        "orientation logit ensemble (ops/tta.py) — ~4x "
                        "device time per request for a quality bump; "
                        "composes with --tiled/--dtype/--data-parallel")
    p.add_argument("--warmup-geometries", type=str, default="",
                   help="comma-separated HxW native-resolution geometries "
                        "to pre-compile for --tiled at startup (e.g. "
                        "520x520,448x448) — the first request at a cold "
                        "geometry otherwise pays the XLA compile in-line")
    return p.parse_args(argv)


def build_server(args: argparse.Namespace):
    from stf_unet_tpu.cli.common import restore_for_inference
    from stf_unet_tpu.core.cache import enable_compilation_cache
    from stf_unet_tpu.serve.http import SegmentationServer

    import jax.numpy as jnp

    enable_compilation_cache()
    model, state, data_cfg, model_cfg, ckpt, kind, _ = restore_for_inference(
        args.model, args.model_dir,
        use_pk_maps=args.use_pk_maps,
        use_subtraction=args.use_subtraction,
        num_classes=args.num_classes, base_c=args.base_c,
        crop_size=args.crop_size,
        dtype=jnp.bfloat16 if args.dtype in ("bf16", "int8") else None)
    print(f"serving {ckpt._path(kind)}")

    variables = state.variables()
    if args.dtype == "int8":
        import os

        from stf_unet_tpu.ops import quant

        spath = quant.scales_path_for(ckpt._path(kind))
        if not os.path.exists(spath):
            raise SystemExit(
                f"error: {spath} not found — calibrate first: python -m "
                f"stf_unet_tpu.cli.quantize --model {args.model} "
                f"--model-dir {args.model_dir} --root <dataset>")
        scales = quant.load_scales(spath,
                                   checkpoint_meta=ckpt.read_meta(kind))
        variables = quant.quantize_variables(variables, scales)
        model = quant.QuantizedModel(model)
        print(f"int8 serving: {len(scales)} convs quantized ({spath})")

    if args.tta:
        from stf_unet_tpu.ops.tta import FlipTTAModel

        model = FlipTTAModel(model)
        print("flip TTA: serving the 4-orientation logit ensemble")

    mesh = None
    if args.data_parallel != 1:
        from stf_unet_tpu.core.mesh import create_mesh

        mesh = create_mesh(args.data_parallel)
        print(f"data-parallel serving over {mesh.devices.size} devices")
    tiled = None
    if args.tiled:
        from stf_unet_tpu.serve.tiled import TiledPredictor

        tiled = TiledPredictor(model, variables, data_cfg.mean,
                               data_cfg.std, tile=data_cfg.crop_size,
                               overlap=args.tile_overlap, mesh=mesh)
        print(f"tiled mode: non-{data_cfg.crop_size}² volumes segment at "
              f"native resolution (stride {tiled.stride}"
              + (f", tile batch sharded over {mesh.devices.size} devices"
                 if mesh is not None else "") + ")")
    def reloader():
        """POST /v1/reload support: re-read the (possibly newer) best/
        latest checkpoint and, for int8, the scales file — so a training
        run can promote a new best model into a live server."""
        from stf_unet_tpu.cli.common import restore_inference_state

        kind2 = "best" if ckpt.exists("best") else "latest"
        state2, meta = restore_inference_state(ckpt, kind2)
        v2 = state2.variables()
        if args.dtype == "int8":
            from stf_unet_tpu.ops import quant

            v2 = quant.quantize_variables(
                v2, quant.load_scales(
                    quant.scales_path_for(ckpt._path(kind2)),
                    checkpoint_meta=meta))
        return v2, {"checkpoint": ckpt._path(kind2),
                    "epoch": meta.get("epoch"),
                    "best_dice": meta.get("best_dice")}

    server = SegmentationServer(
        model, variables, data_cfg, model_name=args.model,
        host=args.host, port=args.port, max_batch=args.max_batch,
        window_ms=args.batch_window_ms, mesh=mesh, tiled=tiled,
        reloader=reloader)
    geometries = [g.strip() for g in args.warmup_geometries.split(",")
                  if g.strip()]
    if geometries and tiled is None:
        print("warning: --warmup-geometries ignored without --tiled")
    if geometries and args.no_warmup:
        print("warning: --warmup-geometries ignored with --no-warmup — "
              "the first request at each geometry pays the compile in-line")
    if not args.no_warmup:
        t_total = len(data_cfg.resolved_sequence_types) + \
            (3 if args.use_pk_maps else 0)
        print("warming up (compiling batch buckets)...")
        server.engine.warmup(t_total, data_cfg.crop_size, data_cfg.crop_size)
        if tiled is not None:
            import numpy as np
            for geom in geometries:
                try:
                    h, w = (int(v) for v in geom.lower().split("x"))
                except ValueError:
                    raise SystemExit(
                        f"error: bad --warmup-geometries entry {geom!r} "
                        "(expected HxW, e.g. 520x520)")
                print(f"warming up tiled geometry {h}x{w} "
                      f"({tiled.num_tiles(h, w)} tiles)...")
                tiled.predict(np.zeros((t_total, h, w, 1), np.uint8))
    return server


def main(argv: Optional[Sequence[str]] = None) -> None:
    args = parse_args(argv)
    server = build_server(args)
    server.start()
    host, port = server.address
    print(f"listening on http://{host}:{port}  "
          f"(POST /v1/segment, POST /v1/reload, GET /healthz, GET /metrics)")
    import signal
    import threading
    stop = threading.Event()
    # SIGTERM (the orchestrator's stop signal) drains like Ctrl-C: stop
    # accepting, finish in-flight batches, exit 0.
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    try:
        stop.wait()
        print("SIGTERM: shutting down")
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        server.stop()


if __name__ == "__main__":
    main()
