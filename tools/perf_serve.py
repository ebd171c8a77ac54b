"""Serving-path perf on the real chip at flagship scale.

Usage: python tools/perf_serve.py [--model stflstm] [--size 224]
                                  [--iters 50] [--clients 8]

Measures, for {f32, bf16} serving dtype:
  * engine batch-1 latency (p50/p99) — the interactive floor
  * engine batch-8 throughput — the MXU-efficiency ceiling
  * dynamic-batcher throughput + p50/p99 with N concurrent clients
  * HTTP end-to-end p50/p99 with N concurrent npz clients (localhost),
    isolating the serialization/transport overhead over the engine

No checkpoint needed: perf is weight-agnostic, so the model is random-init.
Inputs are served-contract uint8 frames at the crop size (resize happens
client/ingest-side; see serve/http.py).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def bench_engine(eng, frames, iters):
    """Batch-1 latency and batch-8 throughput (seconds lists / rate)."""
    one = frames[:1]
    eng.predict(one)  # compile
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        eng.predict(one)
        lat.append(time.perf_counter() - t0)
    full = frames
    eng.predict(full)  # compile
    t0 = time.perf_counter()
    reps = max(1, iters // 4)
    for _ in range(reps):
        eng.predict(full)
    thru = reps * full.shape[0] / (time.perf_counter() - t0)
    return lat, thru


def bench_concurrent(call, images, clients, per_client):
    """Run `call(img)` from N threads; return (latencies, wall_rate)."""
    lats = [[] for _ in range(clients)]
    barrier = threading.Barrier(clients + 1)

    def worker(i):
        barrier.wait()
        for k in range(per_client):
            t0 = time.perf_counter()
            call(images[(i + k) % len(images)])
            lats[i].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    flat = [x for l in lats for x in l]
    return flat, clients * per_client / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="stflstm")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--time-steps", type=int, default=8)
    ap.add_argument("--base-c", type=int, default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.cache import enable_compilation_cache
    from stf_unet_tpu.core.config import DataConfig, ModelConfig
    from stf_unet_tpu.models.registry import create_model, preprocess_input
    from stf_unet_tpu.serve.engine import DynamicBatcher, InferenceEngine
    from stf_unet_tpu.serve.http import SegmentationServer

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    data_cfg = DataConfig(crop_size=args.size)
    T, S = args.time_steps, args.size
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (args.max_batch, T, S, S, 1),
                          dtype=np.uint8)
    kw = {"base_c": args.base_c} if args.base_c else {}
    model_cfg = ModelConfig(model=args.model, num_classes=1, time_steps=T,
                            **kw)

    model_f32 = create_model(model_cfg)
    x0 = preprocess_input(jnp.zeros((1, T, S, S, 1)), model_f32)
    variables = model_f32.init(jax.random.key(0), x0, train=False)

    report = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        model = create_model(model_cfg, dtype=dtype)
        eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                              max_batch=args.max_batch)
        lat, thru = bench_engine(eng, frames, args.iters)
        row = {"b1_p50_ms": _pct(lat, 50) * 1e3,
               "b1_p99_ms": _pct(lat, 99) * 1e3,
               f"b{args.max_batch}_slices_per_s": thru}
        print(f"[{name}] engine: b1 p50 {row['b1_p50_ms']:.2f} ms  "
              f"p99 {row['b1_p99_ms']:.2f} ms  "
              f"b{args.max_batch} {thru:.1f} slices/s")

        eng.warmup(T, S, S)
        batcher = DynamicBatcher(eng, max_batch=args.max_batch,
                                 window_ms=5.0)
        try:
            imgs = [frames[i] for i in range(frames.shape[0])]
            blat, brate = bench_concurrent(
                batcher.infer, imgs, args.clients,
                max(4, args.iters // args.clients))
        finally:
            batcher.close()
        row["batcher_p50_ms"] = _pct(blat, 50) * 1e3
        row["batcher_p99_ms"] = _pct(blat, 99) * 1e3
        row["batcher_slices_per_s"] = brate
        print(f"[{name}] batcher x{args.clients} clients: "
              f"p50 {row['batcher_p50_ms']:.2f} ms  "
              f"p99 {row['batcher_p99_ms']:.2f} ms  {brate:.1f} slices/s")

        srv = SegmentationServer(model, variables, data_cfg,
                                 model_name=args.model, port=0,
                                 max_batch=args.max_batch, window_ms=5.0)
        srv.start()
        try:
            srv.engine.warmup(T, S, S)  # pre-compile ALL batch buckets
            host, port = srv.address
            url = f"http://{host}:{port}/v1/segment?format=npz"
            payloads = []
            for i in range(frames.shape[0]):
                buf = io.BytesIO()
                np.savez(buf, frames=frames[i, :, :, :, 0])
                payloads.append(buf.getvalue())

            import urllib.request

            def call(body):
                req = urllib.request.Request(url, data=body, method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()

            call(payloads[0])  # warm the served-shape buckets
            hlat, hrate = bench_concurrent(
                call, payloads, args.clients,
                max(4, args.iters // args.clients))
        finally:
            srv.stop()
        row["http_p50_ms"] = _pct(hlat, 50) * 1e3
        row["http_p99_ms"] = _pct(hlat, 99) * 1e3
        row["http_slices_per_s"] = hrate
        print(f"[{name}] http x{args.clients} clients:    "
              f"p50 {row['http_p50_ms']:.2f} ms  "
              f"p99 {row['http_p99_ms']:.2f} ms  {hrate:.1f} slices/s")
        report[name] = row

    import json
    print(json.dumps(report))


if __name__ == "__main__":
    main()
