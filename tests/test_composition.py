"""Cross-feature composition: the production knobs must work TOGETHER.

One synthetic multiclass run exercises --num-classes 3 + --data-mask-format
index + --optim-ema-decay + --grad-accum in the train CLI, then the SAME
checkpoint through int8 calibration (cli/quantize), TTA inference
(cli/test --tta), and data-parallel eval — the combinations a real user
hits that single-feature tests never cross.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from stf_unet_tpu.cli import train as train_cli
    from stf_unet_tpu.core import config as config_lib
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    base = tmp_path_factory.mktemp("compose")
    root = str(base / "data")
    make_synthetic_breadm(root, size=40, time_steps=8, mask_classes=3)
    cfg = config_lib.parse_config([
        "--data-path", root, "--model", "unet", "--epochs", "1",
        "--batch-size", "2", "--model-base-c", "4",
        "--data-base-size", "40", "--data-crop-size", "32",
        "--num-classes", "3", "--data-mask-format", "index",
        "--optim-ema-decay", "0.9", "--grad-accum", "2",
        "--save-dir", str(base / "w"), "--output-dir", str(base / "o")])
    r = train_cli.main(cfg)
    assert np.isfinite(r["test"]["dice"])
    return root, str(base / "w"), base


def test_multiclass_ema_accum_checkpoint_tests_with_tta(trained):
    """cli/test self-configures (3+1 classes, index masks) from the EMA +
    MultiSteps checkpoint — template-free restore — and --tta runs the
    4-orientation ensemble over the multiclass head."""
    from stf_unet_tpu.cli import test as test_cli

    root, w, base = trained
    m = test_cli.main(["--model", "unet", "--model-dir", w, "--root", root,
                       "--tta", "--per-patient", "--surface-metrics",
                       "--output-dir", str(base / "t")])
    assert np.isfinite(m["dice"])
    assert m["confusion_matrix"].shape == (4, 4)
    # per-patient + surface reporting composes with multiclass + EMA + TTA:
    # 3 foreground classes per patient, boundary metrics per class
    rep = m["patient_report"]
    assert rep["summary"]["num_patients"] == 2
    for p in rep["patients"].values():
        assert len(p["class_dice"]) == 3
        assert "hd95" in p


def test_multiclass_ema_checkpoint_quantizes(trained):
    """cli/quantize calibrates the EMA weights of the multiclass model and
    reports a finite accuracy delta; the scales file lands next to the
    checkpoint for cli/serve --dtype int8."""
    from stf_unet_tpu.cli import quantize as quantize_cli

    root, w, _ = trained
    res = quantize_cli.main(["--model", "unet", "--model-dir", w,
                             "--root", root, "--calib-samples", "4",
                             "--batch-size", "2"])
    assert os.path.exists(res["scales_path"])
    assert np.isfinite(res["dice_delta"])


def test_multiclass_ema_checkpoint_data_parallel_eval(trained):
    """--data-parallel eval on the composed checkpoint matches the
    unmeshed run exactly."""
    from stf_unet_tpu.cli import test as test_cli

    root, w, base = trained
    m1 = test_cli.main(["--model", "unet", "--model-dir", w, "--root", root,
                        "--batch-size", "2",
                        "--output-dir", str(base / "d1")])
    m2 = test_cli.main(["--model", "unet", "--model-dir", w, "--root", root,
                        "--batch-size", "2", "--data-parallel", "2",
                        "--output-dir", str(base / "d2")])
    np.testing.assert_array_equal(m1["confusion_matrix"],
                                  m2["confusion_matrix"])
    assert abs(m1["dice"] - m2["dice"]) < 1e-6
