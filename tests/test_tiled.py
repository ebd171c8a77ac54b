"""Tiled (sliding-window) native-resolution inference (serve/tiled.py).

Beyond-reference capability: the reference evaluates only at the resized
224² geometry (ref:train.py:70-74, test.py:148-160); TiledPredictor
segments at native resolution through the trained tile size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stf_unet_tpu.core.config import ModelConfig
from stf_unet_tpu.models.registry import create_model, preprocess_input
from stf_unet_tpu.serve.tiled import (TiledPredictor, gaussian_window,
                                      plan_tiles)

T_STEPS = 2
TILE = 32


def test_plan_tiles_coverage_and_flush():
    for size, tile, stride in [(224, 224, 112), (520, 224, 112),
                               (225, 224, 112), (64, 32, 16), (65, 32, 32),
                               (97, 32, 24)]:
        offs = plan_tiles(size, tile, stride)
        assert offs[0] == 0 and offs[-1] == size - tile
        assert list(offs) == sorted(set(offs))
        covered = np.zeros(size, bool)
        for o in offs:
            covered[o:o + tile] = True
        assert covered.all()
        # interior spacing respects the stride
        assert all(b - a <= stride for a, b in zip(offs, offs[1:]))
    assert plan_tiles(TILE, TILE, 16) == (0,)
    with pytest.raises(ValueError):
        plan_tiles(31, 32, 16)


def test_gaussian_window_shape_peak_floor():
    w = gaussian_window(33, sigma_frac=0.125, floor=1e-4)
    assert w.shape == (33, 33) and w.dtype == np.float32
    assert w[16, 16] == w.max() == pytest.approx(1.0)
    np.testing.assert_allclose(w, w.T)
    np.testing.assert_allclose(w, w[::-1, ::-1])
    assert w.min() >= 1e-4


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(model="unet", num_classes=1, base_c=4,
                      time_steps=T_STEPS)
    model = create_model(cfg)
    x = jnp.zeros((1, T_STEPS, TILE, TILE, 1))
    variables = model.init(jax.random.key(0), preprocess_input(x, model),
                           train=False)
    return model, variables


def _direct_mask(model, variables, img_u8, mean, std):
    from stf_unet_tpu.data.transforms import normalize
    x = normalize(jnp.asarray(img_u8), mean, std)[None]
    logits = model.apply(variables, preprocess_input(x, model),
                         train=False)["out"]
    return np.argmax(np.asarray(logits[0]), axis=-1)


def test_single_tile_equals_direct_forward(tiny_model):
    model, variables = tiny_model
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (T_STEPS, TILE, TILE, 1), dtype=np.uint8)
    tp = TiledPredictor(model, variables, mean=0.5, std=0.25, tile=TILE)
    got = tp.predict(img)
    want = _direct_mask(model, variables, img, 0.5, 0.25)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.int32


def test_native_resolution_mask(tiny_model):
    model, variables = tiny_model
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (T_STEPS, 48, 56, 1), dtype=np.uint8)
    tp = TiledPredictor(model, variables, mean=0.5, std=0.25, tile=TILE,
                        overlap=0.5, max_tile_batch=3)
    mask = tp.predict(img)
    assert mask.shape == (48, 56)
    assert mask.min() >= 0 and mask.max() <= 1  # num_classes=1 -> 2 logits
    assert tp.num_tiles(48, 56) == len(plan_tiles(48, TILE, 16)) * len(
        plan_tiles(56, TILE, 16))
    # deterministic across calls (same compiled program)
    np.testing.assert_array_equal(mask, tp.predict(img))


def test_small_input_edge_padding(tiny_model):
    model, variables = tiny_model
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (T_STEPS, 20, 24, 1), dtype=np.uint8)
    tp = TiledPredictor(model, variables, mean=0.5, std=0.25, tile=TILE)
    mask = tp.predict(img)
    assert mask.shape == (20, 24)
    # one padded tile == direct forward on the edge-padded image, cropped
    padded = np.pad(img, ((0, 0), (0, 12), (0, 8), (0, 0)), mode="edge")
    want = _direct_mask(model, variables, padded, 0.5, 0.25)[:20, :24]
    np.testing.assert_array_equal(mask, want)


class _IdentityModel:
    """Fake model: class-1 logit = frame-0 pixel value, class-0 = 0.5.
    Every tile agrees on every shared pixel, so the blended argmax must
    equal (pixel/255 > 0.5) EXACTLY at native resolution — any off-by-one
    between tile extraction offsets and scatter placement breaks this."""
    num_classes = 2
    input_format = "time_sequence"

    def apply(self, variables, x, train=False):
        p = x[:, 0, :, :, 0]
        logits = jnp.stack([jnp.full_like(p, 0.5), p], axis=-1)
        return {"out": logits}


def test_tile_scatter_alignment_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (T_STEPS, 50, 71, 1), dtype=np.uint8)
    tp = TiledPredictor(_IdentityModel(), {}, mean=0.0, std=1.0, tile=TILE,
                        overlap=0.5, max_tile_batch=2)
    mask = tp.predict(img)
    want = (img[0, :, :, 0].astype(np.float32) / 255.0 > 0.5).astype(np.int32)
    np.testing.assert_array_equal(mask, want)


def test_overlap_validation(tiny_model):
    model, variables = tiny_model
    with pytest.raises(ValueError):
        TiledPredictor(model, variables, 0.5, 0.25, overlap=1.0)
    with pytest.raises(ValueError):
        TiledPredictor(model, variables, 0.5, 0.25).predict(
            np.zeros((TILE, TILE, 1), np.uint8))


def test_cli_test_tiled_end_to_end(tmp_path, synthetic_root):
    """--tiled on cli/test: native-resolution metrics (confusion totals the
    NATIVE pixel count, not the resized one) + per-sample overlays."""
    import glob
    import os

    from stf_unet_tpu.cli.train import run

    run(["--model", "unet", "--data-path", str(synthetic_root),
         "--batch-size", "2", "--epochs", "1", "--model-base-c", "4",
         "--data-base-size", "40", "--data-crop-size", "32",
         "--save-dir", str(tmp_path / "w"),
         "--output-dir", str(tmp_path / "o"), "--silent", "true"])

    from stf_unet_tpu.cli.test import main as test_main
    res = test_main(["--model", "unet", "--model-dir", str(tmp_path / "w"),
                     "--root", str(synthetic_root),
                     "--output-dir", str(tmp_path / "tiled_out"),
                     "--tiled", "--per-patient"])
    assert 0.0 <= res["dice"] <= 1.0
    mat = res["confusion_matrix"]
    assert mat.shape == (2, 2)
    # 4 test samples at NATIVE 64x64 (the resize path would count 32x32)
    assert mat.sum() == 4 * 64 * 64
    assert len(glob.glob(str(tmp_path / "tiled_out" / "unet_*.png"))) == 4
    # --per-patient on the tiled path: per-patient confusions partition the
    # global one (2 fixture patients x 2 slices at native resolution)
    rep = res["patient_report"]
    assert rep["summary"]["num_patients"] == 2
    assert sum(p["pixels"] for p in rep["patients"].values()) == 4 * 64 * 64


def test_mesh_sharded_tiles_match_single_device(tiny_model):
    """TiledPredictor(mesh=...): the tile batch shards over the 8-device
    mesh (per-volume latency scaling); the blended mask must be identical
    to the single-device program. Exercises an uneven final chunk (10
    tiles in groups of 8 -> remainder 2 < mesh size)."""
    from stf_unet_tpu.core.mesh import create_mesh

    model, variables = tiny_model
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (T_STEPS, 64, 72, 1), dtype=np.uint8)
    kw = dict(mean=0.5, std=0.25, tile=TILE, overlap=0.5, max_tile_batch=8)
    single = TiledPredictor(model, variables, **kw).predict(img)
    sharded = TiledPredictor(model, variables, mesh=create_mesh(8),
                             **kw).predict(img)
    np.testing.assert_array_equal(sharded, single)


def test_tiled_composes_with_quantized_and_tta_models():
    """TiledPredictor drives any .apply-contract model: the int8
    QuantizedModel and FlipTTAModel wrappers must tile identically to
    their direct forwards (the cli/serve --tiled --dtype int8 / --tta
    compositions)."""
    import jax
    import jax.numpy as jnp

    from stf_unet_tpu.core.config import DataConfig, ModelConfig
    from stf_unet_tpu.models.registry import create_model, preprocess_input
    from stf_unet_tpu.ops import quant
    from stf_unet_tpu.ops.tta import FlipTTAModel
    from stf_unet_tpu.serve.tiled import TiledPredictor

    data_cfg = DataConfig(crop_size=16)
    cfg = ModelConfig(model="unet", num_classes=1, base_c=4, time_steps=2)
    model = create_model(cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 1)).astype(np.float32))
    xin = preprocess_input(x, model)
    variables = model.init(jax.random.key(0), xin, train=False)

    scales = quant.calibrate(model, variables, [xin])
    qvars = quant.quantize_variables(variables, scales)
    qmodel = quant.QuantizedModel(model)
    vol = rng.integers(0, 256, (2, 24, 24, 1), dtype=np.uint8)  # off-tile

    for m, v in ((qmodel, qvars), (FlipTTAModel(model), variables)):
        pred = TiledPredictor(m, v, data_cfg.mean, data_cfg.std,
                              tile=16, overlap=0.5).predict(vol)
        assert pred.shape == (24, 24)
        assert set(np.unique(pred)).issubset({0, 1})
