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


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def _hbm_mb():
    import jax
    stats = jax.local_devices()[0].memory_stats() or {}
    b = stats.get("bytes_in_use")
    return b / 1e6 if b is not None else None


def soak(args) -> None:
    """Minutes-long sustained HTTP load (VERDICT r3 #7): N npz clients loop
    against the full server stack (batcher + per-shape compile caches +
    bounded batch-stats) for --soak seconds, with a POST /v1/reload at the
    halfway mark. Asserts zero request errors, a working mid-stream
    reload, and host-RSS / device-HBM stability: growth from the
    25%-elapsed sample to the final sample must stay under
    --soak-rss-slack MB (leaks in the request path compound per request,
    so minutes of load make even slow ones visible)."""
    import json
    import urllib.request

    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.cache import enable_compilation_cache
    from stf_unet_tpu.core.config import DataConfig, ModelConfig
    from stf_unet_tpu.models.registry import create_model, preprocess_input
    from stf_unet_tpu.serve.http import SegmentationServer

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    data_cfg = DataConfig(crop_size=args.size)
    T, S = args.time_steps, args.size
    rng = np.random.default_rng(0)
    kw = {"base_c": args.base_c} if args.base_c else {}
    model_cfg = ModelConfig(model=args.model, num_classes=1, time_steps=T,
                            **kw)
    model = create_model(model_cfg, dtype=jnp.bfloat16)
    x0 = preprocess_input(jnp.zeros((1, T, S, S, 1)), model)
    variables = create_model(model_cfg).init(jax.random.key(0), x0,
                                             train=False)

    def reloader():
        # fresh same-shaped weights: exercises the zero-downtime swap
        v = create_model(model_cfg).init(jax.random.key(1), x0, train=False)
        return v, {"source": "soak-reinit"}

    srv = SegmentationServer(model, variables, data_cfg,
                             model_name=args.model, port=0,
                             max_batch=args.max_batch, window_ms=5.0,
                             reloader=reloader)
    srv.start()
    errors = []
    lats = []
    samples = []  # (t_elapsed, rss_mb, hbm_mb)
    stop_at = None
    try:
        srv.engine.warmup(T, S, S)
        host, port = srv.address
        url = f"http://{host}:{port}/v1/segment?format=npz"
        # two request geometries so per-shape ingest paths stay live
        payloads = []
        for s in (S, max(64, S - 32)):
            buf = io.BytesIO()
            np.savez(buf, frames=rng.integers(
                0, 256, (T, s, s), dtype=np.uint8))
            payloads.append(buf.getvalue())

        def call(body):
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                r.read()

        for p in payloads:
            call(p)  # warm both geometries
        stop_at = time.perf_counter() + args.soak
        reload_at = time.perf_counter() + args.soak / 2.0
        reload_done = threading.Event()
        lock = threading.Lock()

        def worker(i):
            k = 0
            while time.perf_counter() < stop_at:
                t0 = time.perf_counter()
                try:
                    call(payloads[(i + k) % len(payloads)])
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(repr(e))
                with lock:
                    lats.append(time.perf_counter() - t0)
                k += 1

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.clients)]
        t_start = time.perf_counter()
        for t in threads:
            t.start()
        while time.perf_counter() < stop_at:
            time.sleep(min(2.0, args.soak / 20.0))
            samples.append((time.perf_counter() - t_start, _rss_mb(),
                            _hbm_mb()))
            if not reload_done.is_set() and time.perf_counter() >= reload_at:
                req = urllib.request.Request(
                    f"http://{host}:{port}/v1/reload", data=b"",
                    method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    body = json.loads(r.read())
                assert body.get("reloaded") is True, body
                reload_done.set()
                print(f"  mid-soak reload ok at t={samples[-1][0]:.0f}s: "
                      f"{body}")
        for t in threads:
            t.join()
    finally:
        srv.stop()

    n = len(lats)
    wall = samples[-1][0] if samples else 1.0
    print(f"soak: {n} requests over {wall:.0f}s "
          f"({n / wall:.1f} req/s, {args.clients} clients), "
          f"{len(errors)} errors")
    print(f"  latency p50 {_pct(lats, 50)*1e3:.1f} ms  "
          f"p99 {_pct(lats, 99)*1e3:.1f} ms")
    assert not errors, f"soak saw {len(errors)} errors: {errors[:3]}"
    assert reload_done.is_set(), "mid-soak reload never ran (soak too short?)"
    # stability: compare the 25%-elapsed sample with the final one — the
    # first quarter absorbs allocator/cache warm-up
    q = max(1, len(samples) // 4)
    rss_growth = samples[-1][1] - samples[q][1]
    print(f"  RSS {samples[q][1]:.0f} -> {samples[-1][1]:.0f} MB "
          f"(growth {rss_growth:+.0f} MB over the last 75%)")
    hbm0, hbm1 = samples[q][2], samples[-1][2]
    if hbm0 is not None and hbm1 is not None:
        print(f"  HBM {hbm0:.0f} -> {hbm1:.0f} MB")
        assert hbm1 - hbm0 <= args.soak_rss_slack, (
            f"device HBM grew {hbm1 - hbm0:.0f} MB during the soak")
    assert rss_growth <= args.soak_rss_slack, (
        f"host RSS grew {rss_growth:.0f} MB during the soak "
        f"(> {args.soak_rss_slack} MB slack)")
    print("soak PASSED")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="stflstm")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--time-steps", type=int, default=8)
    ap.add_argument("--base-c", type=int, default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--soak", type=float, default=0.0,
                    help="run the sustained-load soak for N seconds "
                         "(with a mid-stream /v1/reload and RSS/HBM "
                         "stability asserts) instead of the perf sweep")
    ap.add_argument("--soak-rss-slack", type=float, default=200.0,
                    help="max tolerated RSS/HBM growth (MB) from the "
                         "25%%-elapsed sample to the end of the soak")
    args = ap.parse_args()

    if args.soak > 0:
        soak(args)
        return

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
