"""CLI tool tests: stats, merge, val (config write-back + metrics)."""

import glob
import os

import numpy as np
import pytest
from PIL import Image


def test_stats_cli_breadm_layout(synthetic_root, capsys):
    from stf_unet_tpu.cli.stats import main
    mean, std = main([str(synthetic_root)])
    out = capsys.readouterr().out
    assert "mean:" in out and "std:" in out
    assert 0.0 < mean < 1.0
    assert 0.0 < std < 1.0


def test_stats_cli_flat_dir(tmp_path):
    from stf_unet_tpu.cli.stats import compute_mean_std, collect_images
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (16, 16), dtype=np.uint8)).save(
            str(tmp_path / f"img_{i}.png"))
    paths = collect_images(str(tmp_path), flat=True)
    assert len(paths) == 3
    mean, std = compute_mean_std(paths)
    assert 0.3 < mean < 0.7


def test_merge_cli(tmp_path):
    from stf_unet_tpu.cli.merge import main
    sub_dir = tmp_path / "subs"
    mask_dir = tmp_path / "masks"
    out_dir = tmp_path / "out"
    sub_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32), dtype=np.uint8)).save(
            str(sub_dir / f"007_{i}.jpg"), quality=95)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:20, 8:20] = 255
        Image.fromarray(mask).save(str(mask_dir / f"007_{i}.png"))
    written = main(["--patient-id", "007", "--output-dir", str(out_dir),
                    "--subtraction-dir", str(sub_dir),
                    "--mask-dir", str(mask_dir),
                    "--overlay-color", "0,255,0", "--overlay-alpha", "0.5"])
    assert written == 2
    outs = sorted(glob.glob(str(out_dir / "007_*_merged.png")))
    assert len(outs) == 2
    merged = np.asarray(Image.open(outs[0]))
    # overlay region is visibly greener than red channel
    assert merged[14, 14, 1] > merged[14, 14, 0]


def test_merge_cli_border_only(tmp_path):
    pytest.importorskip("cv2")
    from stf_unet_tpu.cli.merge import main
    sub_dir = tmp_path / "s"
    mask_dir = tmp_path / "m"
    sub_dir.mkdir()
    mask_dir.mkdir()
    Image.fromarray(np.full((32, 32), 100, np.uint8)).save(
        str(sub_dir / "001_0.jpg"))
    mask = np.zeros((32, 32), np.uint8)
    mask[10:22, 10:22] = 255
    Image.fromarray(mask).save(str(mask_dir / "001_0.png"))
    written = main(["--patient-id", "001", "--output-dir", str(tmp_path / "o"),
                    "--subtraction-dir", str(sub_dir),
                    "--mask-dir", str(mask_dir), "--border-only"])
    assert written == 1
    merged = np.asarray(Image.open(
        str(tmp_path / "o" / "001_001_merged.png")))
    # interior untouched, border colored
    assert (merged[16, 16] == 100).all()
    assert merged[10, 16, 0] > 100


def test_val_cli_config_writeback(tmp_path, monkeypatch, synthetic_root):
    """val CLI: creates config.yml with defaults when missing
    (ref:val.py:62-70), runs eval with device timing, dumps masks."""
    monkeypatch.chdir(tmp_path)
    # train a tiny checkpoint first
    from stf_unet_tpu.cli.train import run
    run(["--model", "unet", "--data-path", str(synthetic_root),
         "--batch-size", "2", "--epochs", "1", "--model-base-c", "4",
         "--data-base-size", "40", "--data-crop-size", "32",
         "--save-dir", str(tmp_path / "w"),
         "--output-dir", str(tmp_path / "o"), "--silent", "true"])

    import yaml
    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"arch": "unet", "base_c": 4, "crop_size": 32}, f)

    from stf_unet_tpu.cli.val import main as val_main
    result = val_main(["--model-path", str(tmp_path / "w"),
                       "--root", str(synthetic_root),
                       "--config", cfg_path, "--name", "t"])
    assert 0.0 <= result["dice"] <= 1.0
    assert result["device_time"] > 0
    assert glob.glob(str(tmp_path / "outputs" / "t" / "0" / "*.jpg"))

    # missing config -> write-back of defaults
    from stf_unet_tpu.cli.val import DEFAULT_CONFIG, load_or_create_config
    missing = str(tmp_path / "fresh" / "config.yml")
    cfg = load_or_create_config(missing)
    assert cfg == DEFAULT_CONFIG
    assert os.path.exists(missing)


def test_pipeline_cli(tmp_path, synthetic_root):
    """Fused inference + PK pipeline renders a combined overlay per sample."""
    from stf_unet_tpu.cli.pipeline import main as pipe_main
    result = pipe_main(["--root", str(synthetic_root), "--model", "unet",
                        "--model-dir", str(tmp_path / "nonexistent"),
                        "--output-dir", str(tmp_path / "pipe"),
                        "--base-c", "4", "--split", "test"])
    assert result["samples"] == 4
    outs = glob.glob(str(tmp_path / "pipe" / "*_pipeline.png"))
    assert len(outs) == 4
    arr = np.asarray(Image.open(outs[0]))
    assert arr.ndim == 3 and arr.shape[2] == 3  # RGB overlay


def test_predict_mask_sigmoid_matches_torch_reference():
    """The --pred-mode sigmoid compat path reproduces the reference binary
    semantics: torch.sigmoid(outputs) > 0.5, channel 0 (ref:test.py:161-172)."""
    import numpy as np
    import torch
    from stf_unet_tpu.cli.test import predict_mask

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, (16, 16, 2)).astype(np.float32)
    got = predict_mask(logits, "sigmoid")

    t = torch.from_numpy(logits).permute(2, 0, 1)  # [C, H, W] as reference
    want = (torch.sigmoid(t) > 0.5).float()[0].numpy()
    np.testing.assert_array_equal(got, want.astype(np.int32))

    # argmax default unchanged
    np.testing.assert_array_equal(predict_mask(logits),
                                  np.argmax(logits, axis=-1))


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache points jax at the dir; a default (None)
    request after an enable is idempotent, but an EXPLICIT path re-points
    and an explicit empty path disables — so --compile-cache-dir takes
    effect even when an entry point already enabled the default dir."""
    import jax

    from stf_unet_tpu.core import cache

    monkeypatch.setattr(cache, "_ENABLED_DIR", None)
    monkeypatch.setattr(cache, "_DISABLED", False)
    assert cache.enable_compilation_cache("") is None
    # explicit disable is sticky vs later default calls...
    monkeypatch.setenv("STF_UNET_COMPILE_CACHE", str(tmp_path / "envdir"))
    assert cache.enable_compilation_cache(None) is None

    old_dir = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "xla_cache")
        # ...but an explicit dir overrides a prior disable
        got = cache.enable_compilation_cache(target)
        assert got == target and os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # default request keeps the already-enabled dir — even when the
        # env var says "" (env suppresses the DEFAULT enable only; it
        # never tears down an explicit choice)
        assert cache.enable_compilation_cache(None) == target
        monkeypatch.setenv("STF_UNET_COMPILE_CACHE", "")
        assert cache.enable_compilation_cache(None) == target
        assert jax.config.jax_compilation_cache_dir == target
        # explicit different dir re-points (the user's flag wins)
        other = str(tmp_path / "o")
        assert cache.enable_compilation_cache(other) == other
        assert jax.config.jax_compilation_cache_dir == other
        # explicit disable after an enable turns the cache off
        assert cache.enable_compilation_cache("") is None
        assert jax.config.jax_compilation_cache_dir is None
        monkeypatch.setattr(cache, "_ENABLED_DIR", None)
        monkeypatch.setattr(cache, "_DISABLED", False)
    finally:
        # jax.config is process-global: restore so later tests don't write
        # cache entries into this test's tmp dir
        jax.config.update("jax_compilation_cache_dir", old_dir)
