"""Flip test-time augmentation (ops/tta.py, cli/test --tta)."""

import jax
import jax.numpy as jnp
import numpy as np

from stf_unet_tpu.core.config import ModelConfig
from stf_unet_tpu.models.registry import create_model, preprocess_input
from stf_unet_tpu.ops.tta import FlipTTAModel, _flip


def _make(model_name, time_steps=2):
    cfg = ModelConfig(model=model_name, num_classes=1, base_c=4,
                      time_steps=time_steps)
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, time_steps, 16, 16, 1))
                    .astype(np.float32))
    xin = preprocess_input(x, model)
    variables = model.init(jax.random.key(0), xin, train=False)
    return model, variables, xin


def test_tta_equals_mean_of_flipped_forwards():
    model, variables, xin = _make("unet")
    tta = FlipTTAModel(model)
    out = np.asarray(tta.apply(variables, xin, train=False)["out"])
    manual = []
    for mode in ("", "h", "v", "hv"):
        logits = model.apply(variables, _flip(xin, mode),
                             train=False)["out"]
        manual.append(np.asarray(_flip(logits, mode)))
    np.testing.assert_allclose(out, np.mean(manual, axis=0),
                               rtol=1e-5, atol=1e-6)


def test_tta_constant_input_is_flip_symmetric():
    """For a flip-invariant (constant) input the ENSEMBLED logits must be
    flip-symmetric even though a single forward is not (the k2 s2
    ConvTranspose grid is parity-sensitive, so plain logits differ from
    their own flip near upsampling seams — exactly the asymmetry TTA
    averages away)."""
    model, variables, xin = _make("unet")
    xc = jnp.ones_like(xin)
    out = np.asarray(FlipTTAModel(model).apply(
        variables, xc, train=False)["out"])
    np.testing.assert_allclose(out, out[:, ::-1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out, out[:, :, ::-1], rtol=1e-5, atol=1e-6)


def test_tta_flagship_5d_layout():
    model, variables, xin = _make("stflstm")
    out = FlipTTAModel(model).apply(variables, xin, train=False)["out"]
    assert out.shape == (2, 16, 16, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_tta_delegates_attrs():
    model, _, _ = _make("unet")
    tta = FlipTTAModel(model)
    assert tta.num_classes == model.num_classes
    assert tta.input_format == model.input_format


def test_cli_tta_end_to_end(tmp_path):
    from stf_unet_tpu.cli import test as test_cli
    from stf_unet_tpu.cli import train as train_cli
    from stf_unet_tpu.core import config as config_lib
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = str(tmp_path / "data")
    make_synthetic_breadm(root, size=40, time_steps=8)
    cfg = config_lib.parse_config([
        "--data-path", root, "--model", "unet", "--epochs", "1",
        "--batch-size", "2", "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--save-dir", str(tmp_path / "w"),
        "--output-dir", str(tmp_path / "o")])
    train_cli.main(cfg)
    m = test_cli.main(["--model", "unet", "--model-dir", str(tmp_path / "w"),
                       "--root", root, "--tta",
                       "--output-dir", str(tmp_path / "t")])
    assert np.isfinite(m["dice"])
