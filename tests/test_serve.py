"""Serving subsystem tests: engine bucketing, dynamic batching, and the
HTTP front end (all on the CPU backend with a tiny UNet)."""

import io
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_unet_tpu.core.config import DataConfig, ModelConfig
from stf_unet_tpu.models.registry import create_model, preprocess_input
from stf_unet_tpu.serve.engine import DynamicBatcher, InferenceEngine
from stf_unet_tpu.serve.http import SegmentationServer

T_STEPS = 2
CROP = 32


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(model="unet", num_classes=1, base_c=4,
                      time_steps=T_STEPS)
    model = create_model(cfg)
    x = jnp.zeros((1, T_STEPS, CROP, CROP, 1))
    variables = model.init(jax.random.key(0), preprocess_input(x, model),
                           train=False)
    return model, variables


@pytest.fixture(scope="module")
def data_cfg():
    return DataConfig(crop_size=CROP)


def _frames(rng, h=40, w=48):
    return rng.integers(0, 256, (T_STEPS, h, w), dtype=np.uint8)


def test_engine_pads_to_power_of_two_buckets(tiny_model, data_cfg):
    model, variables = tiny_model
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                          max_batch=8)
    rng = np.random.default_rng(0)
    x1 = rng.integers(0, 256, (1, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    x3 = rng.integers(0, 256, (3, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    x5 = rng.integers(0, 256, (5, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    assert eng.predict(x1).shape == (1, CROP, CROP)
    assert eng.predict(x3).shape == (3, CROP, CROP)
    assert eng.predict(x5).shape == (5, CROP, CROP)
    compiled_batches = sorted(s[0] for s in eng._fns)
    assert compiled_batches == [1, 4, 8]
    # padding rows must not change real rows: batch-3 result == batch-1 runs
    per = np.stack([eng.predict(x3[i:i + 1])[0] for i in range(3)])
    np.testing.assert_array_equal(eng.predict(x3), per)


def test_engine_bf16_dtype(tiny_model, data_cfg):
    """bf16 serving dtype (cli/serve.py --dtype bf16): params stay f32 so the
    f32 checkpoint restores unchanged, and masks agree with f32 compute on
    nearly every pixel (argmax is robust to the precision change)."""
    _, variables = tiny_model
    cfg = ModelConfig(model="unet", num_classes=1, base_c=4,
                      time_steps=T_STEPS)
    model_bf16 = create_model(cfg, dtype=jnp.bfloat16)
    # param dtype is independent of compute dtype: init stays f32
    x0 = preprocess_input(jnp.zeros((1, T_STEPS, CROP, CROP, 1)), model_bf16)
    v2 = model_bf16.init(jax.random.key(0), x0, train=False)
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(v2["params"]))

    model_f32, _ = tiny_model
    eng32 = InferenceEngine(model_f32, variables, data_cfg.mean, data_cfg.std)
    eng16 = InferenceEngine(model_bf16, variables, data_cfg.mean,
                            data_cfg.std)
    rng = np.random.default_rng(6)
    x = rng.integers(0, 256, (2, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    m32, m16 = eng32.predict(x), eng16.predict(x)
    assert m16.shape == m32.shape and m16.dtype == m32.dtype
    assert np.mean(m16 == m32) > 0.99


def test_engine_matches_direct_forward(tiny_model, data_cfg):
    """Served masks == direct normalize->forward->argmax (bit-identical)."""
    model, variables = tiny_model
    from stf_unet_tpu.data.transforms import normalize

    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (2, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    logits = model.apply(variables,
                         preprocess_input(
                             normalize(jnp.asarray(x), data_cfg.mean,
                                       data_cfg.std), model),
                         train=False)["out"]
    expect = np.argmax(np.asarray(logits), axis=-1)
    np.testing.assert_array_equal(eng.predict(x), expect)


def test_batcher_coalesces_concurrent_requests(tiny_model, data_cfg):
    model, variables = tiny_model
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                          max_batch=8)
    eng.warmup(T_STEPS, CROP, CROP)  # so the first batch isn't compile-bound
    batcher = DynamicBatcher(eng, max_batch=8, window_ms=300.0)
    try:
        rng = np.random.default_rng(2)
        imgs = [rng.integers(0, 256, (T_STEPS, CROP, CROP, 1), dtype=np.uint8)
                for _ in range(4)]
        results = [None] * 4

        def call(i):
            results[i] = batcher.infer(imgs[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r is not None and r.shape == (CROP, CROP) for r in results)
        # The 300 ms window must have coalesced them into few batches, and
        # at least one real multi-request batch must exist.
        assert sum(batcher.batch_sizes) == 4
        assert max(batcher.batch_sizes) >= 2
        # coalesced results == solo results
        for i in range(4):
            np.testing.assert_array_equal(results[i],
                                          eng.predict(imgs[i][None])[0])
    finally:
        batcher.close()


def test_batcher_groups_by_shape(tiny_model, data_cfg):
    model, variables = tiny_model
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std)
    batcher = DynamicBatcher(eng, max_batch=8, window_ms=50.0)
    try:
        rng = np.random.default_rng(3)
        a = batcher.infer(rng.integers(0, 256, (T_STEPS, CROP, CROP, 1),
                                       dtype=np.uint8))
        b = batcher.infer(rng.integers(0, 256, (T_STEPS, CROP, CROP + 16, 1),
                                       dtype=np.uint8))
        assert a.shape == (CROP, CROP)
        assert b.shape == (CROP, CROP + 16)
    finally:
        batcher.close()


def test_batcher_surfaces_errors(tiny_model, data_cfg):
    model, variables = tiny_model
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std)
    batcher = DynamicBatcher(eng, max_batch=4, window_ms=5.0)
    try:
        bad = np.zeros((T_STEPS, 7, 5, 2), np.uint8)  # channel dim 2: invalid
        with pytest.raises(Exception):
            batcher.infer(bad, timeout=30)
    finally:
        batcher.close()


@pytest.fixture(scope="module")
def server(tiny_model, data_cfg):
    model, variables = tiny_model
    srv = SegmentationServer(model, variables, data_cfg,
                             model_name="unet", port=0, max_batch=4,
                             window_ms=2.0)
    srv.start()
    yield srv
    srv.stop()


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def _post_npz(server, frames, query=""):
    buf = io.BytesIO()
    np.savez(buf, frames=frames)
    req = urllib.request.Request(_url(server, "/v1/segment" + query),
                                 data=buf.getvalue(), method="POST")
    return urllib.request.urlopen(req, timeout=60)


def test_http_healthz_and_metrics(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=10) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["model"] == "unet"
    with urllib.request.urlopen(_url(server, "/metrics"), timeout=10) as r:
        m = json.loads(r.read())
    assert {"requests", "errors", "latency_ms"} <= set(m)


def test_http_segment_json_npz_png_and_full_size(server, data_cfg):
    rng = np.random.default_rng(4)
    frames = _frames(rng)  # 40x48 -> short-edge resize to crop 32

    with _post_npz(server, frames) as r:
        body = json.loads(r.read())
    from stf_unet_tpu.ops.resize import short_edge_size
    oh, ow = short_edge_size(40, 48, CROP)
    assert body["mask_shape"] == [oh, ow]
    assert sum(body["class_pixels"].values()) == oh * ow

    with _post_npz(server, frames, "?format=npz") as r:
        mask = np.load(io.BytesIO(r.read()))["mask"]
    assert mask.shape == (oh, ow)

    with _post_npz(server, frames, "?format=png") as r:
        from PIL import Image
        png = np.asarray(Image.open(io.BytesIO(r.read())))
    assert png.shape == (oh, ow)
    assert set(np.unique(png)) <= {0, 255}
    np.testing.assert_array_equal((png > 0).astype(np.uint8),
                                  (mask > 0).astype(np.uint8))

    with _post_npz(server, frames, "?format=npz&full_size=1") as r:
        full = np.load(io.BytesIO(r.read()))["mask"]
    assert full.shape == frames.shape[1:]

    # served mask == the engine's own prediction on the same preprocessing
    expect = server.segment(frames)
    np.testing.assert_array_equal(mask, expect)


def test_http_bad_payload_is_400(server):
    req = urllib.request.Request(_url(server, "/v1/segment"),
                                 data=b"not an npz", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    with urllib.request.urlopen(_url(server, "/metrics"), timeout=10) as r:
        assert json.loads(r.read())["errors"] >= 1


def test_engine_mesh_data_parallel(tiny_model, data_cfg):
    """One serving process owning N devices: request batches shard over
    the 8-device CPU mesh, buckets floor at the mesh size, masks are
    bit-identical to the unmeshed engine (cli/serve.py --data-parallel)."""
    from stf_unet_tpu.core.mesh import create_mesh

    model, variables = tiny_model
    mesh = create_mesh(8)
    eng1 = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                           max_batch=16)
    engN = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                           max_batch=16, mesh=mesh)
    rng = np.random.default_rng(8)
    for n in (1, 3, 8, 11):
        x = rng.integers(0, 256, (n, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
        np.testing.assert_array_equal(engN.predict(x), eng1.predict(x))
    # every compiled bucket is mesh-divisible (floored at 8)
    assert sorted(s[0] for s in engN._fns) == [8, 16]
    with pytest.raises(ValueError):
        InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                        max_batch=4, mesh=mesh)


def test_client_sdk_roundtrip(server, data_cfg):
    from stf_unet_tpu.serve.client import SegmentationClient, ServerError

    host, port = server.address
    c = SegmentationClient(f"http://{host}:{port}")
    assert c.healthz()["status"] == "ok"
    assert "latency_ms" in c.metrics()

    rng = np.random.default_rng(7)
    frames = _frames(rng)  # 40x48
    mask = c.segment(frames)
    np.testing.assert_array_equal(mask, server.segment(frames))
    full = c.segment(frames, full_size=True)
    assert full.shape == frames.shape[1:]
    summary = c.segment_summary(frames)
    assert summary["mask_shape"] == list(mask.shape)
    assert sum(summary["class_pixels"].values()) == mask.size
    png = c.segment_png(frames)
    from PIL import Image
    assert np.asarray(Image.open(io.BytesIO(png))).shape == mask.shape

    with pytest.raises(ValueError):
        c.segment(frames.astype(np.float32))
    with pytest.raises(ServerError) as ei:
        c._request("/v1/segment", b"not an npz")
    assert ei.value.code == 400


def test_http_concurrent_clients_batch(server):
    rng = np.random.default_rng(5)
    frames = [_frames(rng, 64, 64) for _ in range(4)]
    results = [None] * 4

    def call(i):
        with _post_npz(server, frames[i], "?format=npz") as r:
            results[i] = np.load(io.BytesIO(r.read()))["mask"]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i in range(4):
        assert results[i] is not None
        np.testing.assert_array_equal(results[i], server.segment(frames[i]))


def test_engine_tiled_routing(tiny_model, data_cfg):
    """With a TiledPredictor attached, off-geometry volumes segment at
    native resolution (== TiledPredictor directly); trained-crop inputs
    keep the batched fast path (== engine without tiling)."""
    from stf_unet_tpu.serve.tiled import TiledPredictor

    model, variables = tiny_model
    tp = TiledPredictor(model, variables, data_cfg.mean, data_cfg.std,
                        tile=CROP, overlap=0.5)
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                          tiled=tp)
    plain = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std)
    rng = np.random.default_rng(7)

    big = rng.integers(0, 256, (2, T_STEPS, 48, 56, 1), dtype=np.uint8)
    masks = eng.predict(big)
    assert masks.shape == (2, 48, 56)
    np.testing.assert_array_equal(
        masks, np.stack([tp.predict(b) for b in big]))

    small = rng.integers(0, 256, (2, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    np.testing.assert_array_equal(eng.predict(small), plain.predict(small))


def test_http_tiled_native_resolution(tiny_model, data_cfg):
    """Tiled serving over HTTP: a native-resolution volume comes back as a
    native-resolution mask equal to TiledPredictor directly (no resize in
    the server preprocess)."""
    from stf_unet_tpu.serve.client import SegmentationClient
    from stf_unet_tpu.serve.tiled import TiledPredictor

    model, variables = tiny_model
    tp = TiledPredictor(model, variables, data_cfg.mean, data_cfg.std,
                        tile=CROP, overlap=0.5)
    srv = SegmentationServer(model, variables, data_cfg, model_name="unet",
                             port=0, max_batch=4, window_ms=2.0, tiled=tp)
    srv.start()
    try:
        host, port = srv.address
        client = SegmentationClient(f"http://{host}:{port}")
        rng = np.random.default_rng(8)
        frames = rng.integers(0, 256, (T_STEPS, 48, 56), dtype=np.uint8)
        mask = client.segment(frames)
        assert mask.shape == (48, 56)
        np.testing.assert_array_equal(mask, tp.predict(frames[..., None]))
    finally:
        srv.stop()


def test_tiled_warmup_geometries_precompile(tiny_model, data_cfg):
    """--warmup-geometries pre-compiles the tiled program for each listed
    native geometry so the first request never pays the compile in-line."""
    from stf_unet_tpu.serve.tiled import TiledPredictor

    model, variables = tiny_model
    tp = TiledPredictor(model, variables, data_cfg.mean, data_cfg.std,
                        tile=CROP)
    assert not tp._fns
    # the serve CLI warmup loop, inlined
    for geom in "40x48,52x36".split(","):
        h, w = (int(v) for v in geom.split("x"))
        tp.predict(np.zeros((T_STEPS, h, w, 1), np.uint8))
    assert set(tp._fns) == {(T_STEPS, 40, 48, 1), (T_STEPS, 52, 36, 1)}


def test_http_reload_swaps_weights_without_recompile(tiny_model, data_cfg):
    """POST /v1/reload: the reloader's variables replace the serving
    weights in place — predictions change, compiled buckets are reused,
    and a tree/shape mismatch is rejected with 409."""
    model, variables = tiny_model
    state = {"v": variables, "info": {"checkpoint": "ck0", "epoch": 1,
                                      "best_dice": 0.5}}

    def reloader():
        return state["v"], dict(state["info"])

    srv = SegmentationServer(model, variables, data_cfg, model_name="unet",
                             port=0, max_batch=2, reloader=reloader)
    srv.start()
    try:
        host, port = srv.address
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (T_STEPS, CROP, CROP), dtype=np.uint8)

        def segment():
            buf = io.BytesIO()
            np.savez(buf, frames=frames)
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/segment?format=npz",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                with np.load(io.BytesIO(r.read())) as npz:
                    return np.asarray(npz["mask"])

        def post_reload():
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/reload", data=b"", method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        logits_before = segment()
        compiled = set(srv.engine._fns)

        # new weights: re-init with a different seed -> predictions differ
        x = jnp.zeros((1, T_STEPS, CROP, CROP, 1))
        state["v"] = model.init(jax.random.key(7),
                                preprocess_input(x, model), train=False)
        state["info"] = {"checkpoint": "ck1", "epoch": 2, "best_dice": 0.9}
        out = post_reload()
        assert out["reloaded"] and out["checkpoint"] == "ck1"
        logits_after = segment()
        assert set(srv.engine._fns) == compiled  # no recompile
        assert not np.array_equal(logits_before, logits_after)

        # shape mismatch -> 409 and the serving weights stay usable
        bad_cfg = ModelConfig(model="unet", num_classes=1, base_c=8,
                              time_steps=T_STEPS)
        bad = create_model(bad_cfg)
        state["v"] = bad.init(jax.random.key(0),
                              preprocess_input(x, bad), train=False)
        try:
            post_reload()
            assert False, "expected 409"
        except urllib.error.HTTPError as e:
            assert e.code == 409
        np.testing.assert_array_equal(segment(), logits_after)
    finally:
        srv.stop()


def test_metrics_prometheus_format(server):
    host, port = server.address
    with urllib.request.urlopen(
            f"http://{host}:{port}/metrics?format=prometheus",
            timeout=30) as r:
        body = r.read().decode()
        assert r.headers["Content-Type"].startswith("text/plain")
    assert "stf_requests_total" in body
    assert 'stf_latency_ms{quantile="0.50"}' in body
    assert "stf_mean_batch_size" in body


def test_bucket_never_exceeds_max_batch(tiny_model, data_cfg):
    """--max-batch is an operator memory cap: a non-power-of-two value
    must never be padded PAST (the old doubling overshot 5->8 under
    max_batch=6)."""
    model, variables = tiny_model
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                          max_batch=6)
    assert [eng._bucket(n, 6) for n in (1, 2, 3, 4, 5, 6)] == \
        [1, 2, 4, 4, 6, 6]
    rng = np.random.default_rng(2)
    x5 = rng.integers(0, 256, (5, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    assert eng.predict(x5).shape == (5, CROP, CROP)
    assert max(s[0] for s in eng._fns) <= 6


def test_http_timeout_maps_to_503(tiny_model, data_cfg):
    """Server-side inference timeouts are 503 (retryable), not 400: load
    balancers must not treat a slow compile / busy device as a client
    error."""
    model, variables = tiny_model
    srv = SegmentationServer(model, variables, data_cfg, model_name="unet",
                             port=0, max_batch=2,
                             infer_timeout_s=1e-6)  # guaranteed to trip
    srv.start()
    try:
        host, port = srv.address
        frames = np.zeros((T_STEPS, CROP, CROP), np.uint8)
        buf = io.BytesIO()
        np.savez(buf, frames=frames)
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/segment", data=buf.getvalue(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert "timed out" in json.loads(e.read())["error"]
    finally:
        srv.stop()


def test_engine_return_probs(tiny_model, data_cfg):
    """predict(return_probs=True): same masks as the plain path (same
    compiled forward, argmax from logits) + float16 softmax probs that
    sum to 1 and argmax back to the mask; works through batch padding."""
    model, variables = tiny_model
    eng = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std)
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (3, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
    masks, probs = eng.predict(x, return_probs=True)
    np.testing.assert_array_equal(masks, eng.predict(x))
    assert probs.dtype == np.float16
    assert probs.shape == masks.shape + (2,)  # binary tiny_model
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-3)
    # masks argmax from LOGITS; f16 rounding can flip near-ties, so
    # require agreement only where the class gap exceeds f16 resolution
    p32 = probs.astype(np.float32)
    decided = np.abs(p32[..., 1] - p32[..., 0]) > 2e-3
    assert decided.mean() > 0.5
    np.testing.assert_array_equal(np.argmax(probs, -1)[decided],
                                  masks[decided])


def test_engine_mesh_return_probs_matches_unmeshed(tiny_model, data_cfg):
    """return_probs under a data mesh: masks AND float16 probabilities are
    bit-identical to the unmeshed engine (stf-predict --save-probs
    --data-parallel)."""
    from stf_unet_tpu.core.mesh import create_mesh

    model, variables = tiny_model
    eng1 = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                           max_batch=16)
    engN = InferenceEngine(model, variables, data_cfg.mean, data_cfg.std,
                           max_batch=16, mesh=create_mesh(8))
    rng = np.random.default_rng(9)
    for n in (2, 8, 11):
        x = rng.integers(0, 256, (n, T_STEPS, CROP, CROP, 1), dtype=np.uint8)
        m1, p1 = eng1.predict(x, return_probs=True)
        mN, pN = engN.predict(x, return_probs=True)
        np.testing.assert_array_equal(mN, m1)
        # GSPMD changes the softmax reduction/fusion order: probs agree
        # to one f16 ulp — which is 4.88e-4 for values in [0.5, 1), the
        # dominant class (masks above are from logits — bit-equal)
        np.testing.assert_allclose(pN.astype(np.float32),
                                   p1.astype(np.float32), atol=5e-4)


def test_http_probs_roundtrip(server, data_cfg):
    """?probs=1 returns an npz with mask + float16 probs consistent with
    the plain mask path; png+probs is a 400; the client SDK decodes it."""
    rng = np.random.default_rng(11)
    frames = _frames(rng, CROP, CROP)
    with _post_npz(server, frames, "?probs=1") as r:
        with np.load(io.BytesIO(r.read())) as npz:
            mask, probs = np.asarray(npz["mask"]), np.asarray(npz["probs"])
    assert probs.dtype == np.float16
    assert probs.shape == mask.shape + (2,)
    np.testing.assert_allclose(probs.astype(np.float32).sum(-1), 1.0,
                               atol=2e-3)
    # plain mask path agrees (same compiled forward family)
    with _post_npz(server, frames, "?format=npz") as r:
        with np.load(io.BytesIO(r.read())) as npz:
            np.testing.assert_array_equal(np.asarray(npz["mask"]), mask)

    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_npz(server, frames, "?probs=1&format=png")
    assert e.value.code == 400

    from stf_unet_tpu.serve.client import SegmentationClient
    host, port = server.address
    m2, p2 = SegmentationClient(f"http://{host}:{port}").segment_probs(
        frames, full_size=True)
    assert m2.shape == frames.shape[1:]
    assert p2.shape == frames.shape[1:] + (2,)
