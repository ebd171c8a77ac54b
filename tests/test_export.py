"""Serving export (cli/export.py): StableHLO artifact roundtrip parity and
symbolic-batch calls."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_export_unet_roundtrip_and_symbolic_batch(tmp_path):
    from stf_unet_tpu.cli.export import main
    out = str(tmp_path / "unet.stablehlo")
    path = main(["--model", "unet", "--model-dir", str(tmp_path / "none"),
                 "--output", out, "--crop-size", "16", "--base-c", "4",
                 "--allow-random-weights", "--check"])
    assert os.path.exists(path)
    meta = json.load(open(path + ".json"))
    assert meta["model"] == "unet" and meta["bytes"] > 0

    from jax import export as jexport
    restored = jexport.deserialize(open(path, "rb").read())
    rng = np.random.default_rng(1)
    # symbolic batch: the same artifact serves batch 1 and batch 3
    for b in (1, 3):
        x = jnp.asarray(rng.normal(size=(b, 8, 16, 16, 1)), jnp.float32)
        got = np.asarray(restored.call(x))
        assert got.shape == (b, 16, 16, 2)
        assert np.isfinite(got).all()

    # batch-1 rows of a batch-3 call match a batch-1 call (stateless fn)
    x3 = jnp.asarray(rng.normal(size=(3, 8, 16, 16, 1)), jnp.float32)
    full = np.asarray(restored.call(x3))
    one = np.asarray(restored.call(x3[:1]))
    np.testing.assert_allclose(full[:1], one, atol=1e-5)


def test_export_refuses_random_weights_without_flag(tmp_path):
    from stf_unet_tpu.cli.export import main
    with pytest.raises(FileNotFoundError):
        main(["--model", "unet", "--model-dir", str(tmp_path / "none"),
              "--output", str(tmp_path / "x.stablehlo"),
              "--crop-size", "16", "--base-c", "4"])


def test_export_after_training_matches_live_model(tmp_path):
    """End-to-end: train 1 epoch via the CLI, export the checkpoint,
    deserialize, and compare against the live restored model."""
    from stf_unet_tpu.cli.train import run
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    root = make_synthetic_breadm(str(tmp_path / "tree"), size=24,
                                 time_steps=8, patients_per_split=1,
                                 slices_per_patient=2)
    run(["--data-path", root, "--model", "unet", "--epochs", "1",
         "--batch-size", "2", "--model-base-c", "4",
         "--data-base-size", "20", "--data-crop-size", "16",
         "--save-dir", str(tmp_path / "w"),
         "--output-dir", str(tmp_path / "o")])

    from stf_unet_tpu.cli.export import main
    path = main([
        "--model", "unet", "--model-dir", str(tmp_path / "w"),
        "--output", str(tmp_path / "m.stablehlo"),
        "--crop-size", "16", "--base-c", "4", "--check"])
    assert os.path.exists(path)  # --check already asserted parity
