"""Per-patient aggregation (metrics/patient.py) and surface-distance
metrics (metrics/surface.py) — both beyond the reference, which reports
only dataset-global overlap metrics (ref:train_and_eval.py:316-374)."""

import numpy as np
import pytest

from stf_unet_tpu.metrics.patient import (PatientAggregator,
                                          format_patient_report)
from stf_unet_tpu.metrics.surface import hd95_assd, surface_metrics


class TestHd95Assd:
    def test_identical_masks_are_zero(self):
        m = np.zeros((20, 20), bool)
        m[5:12, 6:14] = True
        assert hd95_assd(m, m) == (0.0, 0.0)

    def test_both_empty_is_zero(self):
        z = np.zeros((10, 10), bool)
        assert hd95_assd(z, z) == (0.0, 0.0)

    def test_one_empty_is_nan(self):
        z = np.zeros((10, 10), bool)
        m = z.copy()
        m[4, 4] = True
        assert np.isnan(hd95_assd(m, z)).all()
        assert np.isnan(hd95_assd(z, m)).all()

    def test_single_pixel_offset_distance(self):
        # Single-pixel masks 3 columns apart: every boundary distance is
        # exactly 3, so HD95 == ASSD == 3.
        a = np.zeros((12, 12), bool)
        b = np.zeros((12, 12), bool)
        a[5, 4] = True
        b[5, 7] = True
        hd95, assd = hd95_assd(a, b)
        assert hd95 == pytest.approx(3.0)
        assert assd == pytest.approx(3.0)

    def test_translated_square(self):
        # Two 6x6 squares shifted 2 px right: max boundary distance 2,
        # and symmetric, so HD95 <= 2 with many exact-2 distances.
        a = np.zeros((20, 20), bool)
        b = np.zeros((20, 20), bool)
        a[7:13, 4:10] = True
        b[7:13, 6:12] = True
        hd95, assd = hd95_assd(a, b)
        assert hd95 == pytest.approx(2.0)
        assert 0.0 < assd <= 2.0
        # symmetric in argument order
        assert hd95_assd(b, a) == pytest.approx((hd95, assd))

    def test_spacing_scales_distances(self):
        a = np.zeros((12, 12), bool)
        b = np.zeros((12, 12), bool)
        a[5, 4] = True
        b[5, 7] = True  # 3 columns apart
        hd95, assd = hd95_assd(a, b, spacing=(1.0, 0.5))  # col = 0.5 units
        assert hd95 == pytest.approx(1.5)
        assert assd == pytest.approx(1.5)

    def test_surface_metrics_excludes_ignore_region(self):
        # Stray prediction pixels inside the gt==255 region must not count.
        gt = np.zeros((16, 16), np.int32)
        gt[4:8, 4:8] = 1
        pred = np.zeros((16, 16), np.int32)
        pred[4:8, 4:8] = 1
        gt[:, 12:] = 255
        pred[5, 14] = 1  # inside ignore region only
        m = surface_metrics(pred, gt, num_classes=2)
        assert m[1]["hd95"] == 0.0
        assert m[1]["assd"] == 0.0

    def test_surface_metrics_per_class(self):
        gt = np.zeros((16, 16), np.int32)
        gt[2:6, 2:6] = 1  # class 1 present in gt only
        pred = np.zeros((16, 16), np.int32)
        pred[9:13, 9:13] = 2  # class 2 present in pred only
        m = surface_metrics(pred, gt, num_classes=3)
        assert np.isnan(m[1]["hd95"]) and np.isnan(m[2]["hd95"])

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            hd95_assd(np.zeros((4, 4), bool), np.zeros((5, 5), bool))


class TestPatientAggregator:
    def test_per_patient_dice_matches_direct_formula(self):
        agg = PatientAggregator(num_classes=2)
        gt = np.zeros((10, 10), np.int32)
        gt[2:6, 2:6] = 1  # 16 px
        pred = np.zeros((10, 10), np.int32)
        pred[2:6, 2:8] = 1  # 24 px, overlap 16
        agg.update("pA", gt, pred)
        agg.update("pA", gt, gt)  # a perfect second slice pools in
        rep = agg.report()
        # pooled: tp = 16+16, gt px = 32, pred px = 24+16
        expect = 2.0 * 32 / (32 + 40)
        assert rep["patients"]["pA"]["dice"] == pytest.approx(expect)
        assert rep["patients"]["pA"]["slices"] == 2

    def test_absent_class_in_both_is_perfect(self):
        # reference union==0 -> 1 quirk (ref:train_and_eval.py:104-107)
        agg = PatientAggregator(num_classes=2)
        z = np.zeros((8, 8), np.int32)
        agg.update("p", z, z)
        assert agg.report()["patients"]["p"]["dice"] == 1.0

    def test_ignore_label_pixels_dropped(self):
        agg = PatientAggregator(num_classes=2)
        gt = np.zeros((8, 8), np.int32)
        gt[0:4] = 1
        pred = gt.copy()
        gt_padded = gt.copy()
        gt_padded[:, 6:] = 255  # padding columns: pred disagrees there
        pred_wild = pred.copy()
        pred_wild[:, 6:] = 1 - pred[:, 6:]
        agg.update("p", gt_padded, pred_wild)
        assert agg.report()["patients"]["p"]["dice"] == pytest.approx(1.0)

    def test_summary_statistics_across_patients(self):
        agg = PatientAggregator(num_classes=2)
        gt = np.zeros((10, 10), np.int32)
        gt[2:6, 2:6] = 1
        half = gt.copy()
        half[2:6, 4:6] = 0  # half the gt area
        agg.update("pA", gt, gt)        # dice 1.0
        agg.update("pB", gt, half)      # dice 2*8/(16+8)
        rep = agg.report()
        d = [1.0, 2.0 * 8 / 24]
        s = rep["summary"]["dice"]
        assert s["mean"] == pytest.approx(np.mean(d))
        assert s["std"] == pytest.approx(np.std(d))
        assert s["median"] == pytest.approx(np.median(d))
        assert rep["summary"]["num_patients"] == 2

    def test_surface_aggregation_and_undefined_count(self):
        agg = PatientAggregator(num_classes=2, surface=True)
        gt = np.zeros((12, 12), np.int32)
        gt[4:8, 4:8] = 1
        agg.update("p", gt, gt)                       # hd95 0
        agg.update("p", gt, np.zeros_like(gt))        # undefined (nan)
        rep = agg.report()
        p = rep["patients"]["p"]
        assert p["hd95"] == 0.0 and p["assd"] == 0.0
        assert p["surface_undefined"] == 1
        assert rep["summary"]["surface_undefined"] == 1

    def test_multiclass_class_dice_vector(self):
        agg = PatientAggregator(num_classes=3)
        gt = np.zeros((10, 10), np.int32)
        gt[0:3] = 1
        gt[5:8] = 2
        agg.update("p", gt, gt)
        p = agg.report()["patients"]["p"]
        assert p["class_dice"] == [1.0, 1.0]
        assert p["dice"] == 1.0

    def test_format_report_is_stable(self):
        agg = PatientAggregator(num_classes=2, surface=True)
        gt = np.zeros((8, 8), np.int32)
        gt[2:5, 2:5] = 1
        agg.update("P000", gt, gt)
        txt = format_patient_report(agg.report())
        assert "P000" in txt and "dice" in txt and "hd95" in txt
        assert "over 1 patients" in txt


def test_cli_per_patient_end_to_end(tmp_path):
    """Full train -> test drive with --per-patient --surface-metrics: one
    row per fixture patient, finite summary dice, report attached to the
    returned metrics."""
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
                       "--root", root, "--per-patient", "--surface-metrics",
                       "--threshold-sweep",
                       "--output-dir", str(tmp_path / "t")])
    rep = m["patient_report"]
    assert rep["summary"]["num_patients"] == 2  # fixture patients_per_split
    for pid, p in rep["patients"].items():
        assert p["slices"] == 2
        assert 0.0 <= p["dice"] <= 1.0
    assert np.isfinite(rep["summary"]["dice"]["mean"])

    sweep = m["threshold_sweep"]
    assert len(sweep["rows"]) == 19
    assert 0.0 <= sweep["roc_auc"] <= 1.0
    # every test pixel lands in exactly one histogram (4 slices @ 32x32)
    assert sweep["positives"] + sweep["negatives"] == 4 * 32 * 32

    # reports persist as machine-readable artifacts next to the renders
    import json
    with open(tmp_path / "t" / "patient_report.json") as f:
        saved = json.load(f)
    assert saved["summary"]["num_patients"] == 2
    with open(tmp_path / "t" / "threshold_sweep.json") as f:
        assert len(json.load(f)["rows"]) == 19

    # batch_size != 1 is rejected (bucketing reorders samples)
    with pytest.raises(SystemExit):
        test_cli.main(["--model", "unet", "--model-dir", str(tmp_path / "w"),
                       "--root", root, "--per-patient", "--batch-size", "2",
                       "--output-dir", str(tmp_path / "t2")])
