"""Viz smoke tests: figures render and files appear (Agg backend)."""

import os

import numpy as np
from PIL import Image

from stf_unet_tpu.viz import (merge_images, plot_mask_center_tic,
                              plot_masked_time_intensity_curve,
                              save_comparison, save_overlay, save_predictions,
                              visualize_sequence)


def _seq(b=1, t=4, h=24, w=24):
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 255, (b, t, h, w, 1)).astype(np.float32)
    mask = np.zeros((b, h, w), np.uint8)
    mask[:, 8:16, 8:16] = 1
    return seq, mask


def test_visualize_sequence(tmp_path):
    seq, _ = _seq()
    path = str(tmp_path / "seq.png")
    visualize_sequence(seq, index=0, save_path=path)
    assert os.path.exists(path)


def test_tic_plots(tmp_path):
    seq, mask = _seq()
    p1 = str(tmp_path / "tic_center.png")
    p2 = str(tmp_path / "tic_max.png")
    plot_mask_center_tic(seq, mask, index=0, save_path=p1)
    plot_masked_time_intensity_curve(seq, mask, index=0, save_path=p2)
    assert os.path.exists(p1) and os.path.exists(p2)


def test_tic_empty_mask_warns(tmp_path, capsys):
    seq, _ = _seq()
    empty = np.zeros((1, 24, 24), np.uint8)
    plot_mask_center_tic(seq, empty, save_path=str(tmp_path / "x.png"))
    plot_masked_time_intensity_curve(seq, empty, save_path=str(tmp_path / "y.png"))
    out = capsys.readouterr().out
    assert "Warning" in out
    assert not os.path.exists(str(tmp_path / "x.png"))


def test_save_predictions(tmp_path):
    preds = np.random.default_rng(1).uniform(size=(3, 16, 16))
    save_predictions(preds, str(tmp_path), base_name="p")
    files = sorted(os.listdir(tmp_path))
    assert files == ["p_000.png", "p_001.png", "p_002.png"]
    arr = np.asarray(Image.open(tmp_path / "p_000.png"))
    assert set(np.unique(arr)).issubset({0, 255})


def test_save_comparison_with_metrics(tmp_path):
    pred = np.zeros((16, 16), np.float32)
    pred[4:10, 4:10] = 1
    gt = np.zeros((16, 16), np.float32)
    gt[5:11, 5:11] = 1
    raw = np.random.default_rng(2).uniform(size=(16, 16)).astype(np.float32)
    path = save_comparison(pred, gt, raw, str(tmp_path), base_name="cmp",
                           idx=7, dice_score=0.5, iou_score=0.3)
    assert path.endswith("cmp_007_compare.png")
    img = np.asarray(Image.open(path))
    assert img.shape[1] > 3 * 16  # triptych + padding


def test_save_overlay_and_merge(tmp_path):
    raw = np.full((16, 16), 80, np.float32)
    pred = np.zeros((16, 16), np.float32)
    pred[4:8, 4:8] = 1
    path = save_overlay(pred, raw, str(tmp_path), "003", prefix="m")
    assert path.endswith("m_003.png")
    merged = merge_images(np.full((16, 16), 80, np.uint8),
                          (pred * 255).astype(np.uint8), (0, 0, 255), 0.5)
    assert merged[5, 5, 2] > merged[5, 5, 0]  # blue overlay applied
    assert (merged[0, 0] == 80).all()         # background untouched
