"""stf-plot: training-curve rendering from results .txt (ours AND the
reference's format, ref:train.py:288-301) and metrics .jsonl files."""

import json
import os

import pytest

from stf_unet_tpu.cli.plot import (main, parse_jsonl, parse_results_txt,
                                   parse_run, run)

REF_STYLE_BLOCKS = """\
[epoch: 0]
train_loss: 0.9123
lr: 0.000500
dice: 0.5120
global_acc: 0.9011
mean_iou: 0.4410
mean_precision: 0.6012
mean_recall: 0.5521
global correct: 90.1
average row correct: ['91.2', '45.0']
IoU: ['89.9', '30.1']
mean IoU: 60.0

[epoch: 1]
train_loss: 0.6018
lr: 0.000450
dice: 0.7233
global_acc: 0.9455
mean_iou: 0.6120
mean_precision: 0.7512
mean_recall: 0.7021
global correct: 94.6
average row correct: ['95.2', '65.0']
IoU: ['93.9', '50.1']
mean IoU: 72.0

"""


def test_parse_results_txt(tmp_path):
    path = str(tmp_path / "unet_results_0101-1200.txt")
    # arg-dump preamble (the reference writes one) must be skipped
    with open(path, "w") as f:
        f.write("Namespace(lr=0.0005, epochs=2)\n\n" + REF_STYLE_BLOCKS)
    s = parse_results_txt(path)
    assert s["epoch"] == [0, 1]
    assert s["train_loss"] == [0.9123, 0.6018]
    assert s["dice"] == [0.512, 0.7233]
    assert s["miou"] == [0.441, 0.612]
    assert s["mrecall"] == [0.5521, 0.7021]
    assert s["lr"] == [0.0005, 0.00045]


def test_parse_jsonl(tmp_path):
    path = str(tmp_path / "unet_metrics_0101.jsonl")
    with open(path, "w") as f:
        for ep in range(3):
            f.write(json.dumps({"epoch": ep, "train_loss": 1.0 - ep * 0.2,
                                "lr": 1e-3, "dice": 0.5 + ep * 0.1,
                                "global_acc": 0.9, "miou": 0.6,
                                "mprecision": 0.7, "mrecall": 0.65}) + "\n")
        f.write(json.dumps({"event": "test_phase", "dice": 0.9}) + "\n")
    s = parse_jsonl(path)
    assert s["epoch"] == [0, 1, 2]
    assert s["dice"] == [0.5, 0.6, 0.7]
    assert s["mprecision"] == [0.7] * 3


def test_parse_run_rejects_empty(tmp_path):
    path = str(tmp_path / "empty_results.txt")
    open(path, "w").write("no epochs here\n")
    with pytest.raises(ValueError, match="no per-epoch records"):
        parse_run(path)


def test_plot_cli_single_run(tmp_path):
    pytest.importorskip("matplotlib")
    path = str(tmp_path / "run_results_.txt")
    open(path, "w").write(REF_STYLE_BLOCKS)
    written = run([path])
    assert written == [str(tmp_path / "run_results__curves.png")]
    assert os.path.getsize(written[0]) > 1000
    # the console-script entry (sys.exit(main())) must return status 0,
    # not the written list (exit code 1 + list repr on stderr otherwise)
    assert main([path]) == 0


def test_plot_cli_compare(tmp_path):
    pytest.importorskip("matplotlib")
    a = str(tmp_path / "a_results.txt")
    b = str(tmp_path / "b_metrics.jsonl")
    open(a, "w").write(REF_STYLE_BLOCKS)
    with open(b, "w") as f:
        for ep in range(2):
            f.write(json.dumps({"epoch": ep, "train_loss": 0.8 - ep * 0.1,
                                "dice": 0.6 + ep * 0.1}) + "\n")
    out = str(tmp_path / "cmp.png")
    written = run([a, b, "--output", out])
    assert written == [out] and os.path.getsize(out) > 1000


def test_plot_cli_compare_same_basename(tmp_path):
    """Same-named results files in different dirs must both appear in the
    comparison (labels disambiguated by parent dir), not silently collapse."""
    pytest.importorskip("matplotlib")
    from stf_unet_tpu.cli.plot import _run_labels
    a_dir, b_dir = tmp_path / "expA", tmp_path / "expB"
    a_dir.mkdir(), b_dir.mkdir()
    a, b = str(a_dir / "unet_results.txt"), str(b_dir / "unet_results.txt")
    open(a, "w").write(REF_STYLE_BLOCKS)
    open(b, "w").write(REF_STYLE_BLOCKS)
    assert _run_labels([a, b]) == ["expA/unet_results", "expB/unet_results"]
    out = str(tmp_path / "cmp.png")
    assert run([a, b, "--output", out]) == [out]
    with pytest.raises(ValueError, match="duplicate run inputs"):
        _run_labels([a, a])


def test_patient_report_render(tmp_path):
    """stf-plot renders a cli/test patient_report.json to per-patient
    bars (with the HD95 panel when surface metrics are present)."""
    import json

    from stf_unet_tpu.cli.plot import run as plot_run

    report = {
        "patients": {
            "P000": {"dice": 0.91, "class_dice": [0.91], "slices": 4,
                     "pixels": 4096, "hd95": 2.2, "assd": 0.4,
                     "surface_undefined": 0},
            "P001": {"dice": 0.77, "class_dice": [0.77], "slices": 4,
                     "pixels": 4096, "hd95": 6.0, "assd": 1.3,
                     "surface_undefined": 1},
        },
        "summary": {"num_patients": 2,
                    "dice": {"mean": 0.84, "std": 0.07, "median": 0.84},
                    "hd95": {"mean": 4.1, "std": 1.9, "median": 4.1},
                    "assd": {"mean": 0.85, "std": 0.45, "median": 0.85},
                    "surface_undefined": 1},
    }
    src = tmp_path / "patient_report.json"
    src.write_text(json.dumps(report))
    out = plot_run([str(src)])
    assert out == [str(tmp_path / "patient_report.png")]
    assert (tmp_path / "patient_report.png").stat().st_size > 2000

    # a json that is neither report artifact is rejected with a clear
    # message ('rows' without 'roc_auc' is not a sweep either)
    bad = tmp_path / "other.json"
    bad.write_text(json.dumps({"rows": []}))
    import pytest
    with pytest.raises(SystemExit):
        plot_run([str(bad)])


def test_threshold_sweep_render(tmp_path):
    """stf-plot renders a cli/test threshold_sweep.json to operating-point
    curves (dice/IoU + precision/recall vs threshold)."""
    pytest.importorskip("matplotlib")
    import numpy as np

    from stf_unet_tpu.cli.plot import run as plot_run
    from stf_unet_tpu.metrics.binary import ThresholdSweep

    # a real report (not a hand-rolled dict) so the render stays pinned to
    # ThresholdSweep.report()'s actual schema
    rng = np.random.default_rng(0)
    target = (rng.random((64, 64)) < 0.3).astype(np.uint8)
    prob = np.clip(target * 0.7 + rng.random((64, 64)) * 0.4, 0, 1)
    sweep = ThresholdSweep()
    sweep.update(prob, target)
    src = tmp_path / "threshold_sweep.json"
    src.write_text(json.dumps(sweep.report()))

    out = plot_run([str(src)])
    assert out == [str(tmp_path / "threshold_sweep.png")]
    assert (tmp_path / "threshold_sweep.png").stat().st_size > 2000


def test_threshold_sweep_empty_rows_clean_error(tmp_path):
    """A sweep artifact with 'rows': [] (plus the roc_auc key that passes
    the dispatcher check) exits with a clean message instead of an
    uncaught ValueError from max() (ADVICE r3)."""
    pytest.importorskip("matplotlib")
    from stf_unet_tpu.cli.plot import run as plot_run

    src = tmp_path / "threshold_sweep.json"
    src.write_text(json.dumps({"rows": [], "roc_auc": 0.5, "pr_auc": 0.5}))
    with pytest.raises(SystemExit, match="empty 'rows'"):
        plot_run([str(src)])
