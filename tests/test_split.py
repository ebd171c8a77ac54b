"""stf-split (cli/split.py): patient-level dataset splitting — the
reference assumes a pre-split seg/ tree (ref:my_dataset.py:22-26) and has
no tool to create one."""

import os
import shutil

import numpy as np
import pytest

from stf_unet_tpu.cli import split as split_cli
from stf_unet_tpu.cli.split import assign_patients


def _make_pool(root, n_patients=7):
    """Unsplit pool: flatten a synthetic BreaDM tree's splits into
    <root>/images + <root>/labels (+ pk_maps for some patients)."""
    from stf_unet_tpu.data.synthetic import make_synthetic_breadm

    tmp = os.path.join(root, "_gen")
    make_synthetic_breadm(tmp, size=24, time_steps=2,
                          patients_per_split=n_patients,
                          splits=("training",), slices_per_patient=1,
                          sequence_prefix="VIBRANT+C")
    src = os.path.join(root, "pool")
    for kind in ("images", "labels"):
        shutil.copytree(os.path.join(tmp, "seg", "training", kind),
                        os.path.join(src, kind))
    # pk maps for a subset (optional per patient)
    for p in sorted(os.listdir(os.path.join(src, "images")))[:2]:
        d = os.path.join(src, "pk_maps", p)
        os.makedirs(d)
        from PIL import Image
        for name in ("ktrans", "ve", "vp"):
            Image.fromarray(np.zeros((24, 24), np.uint8)).save(
                os.path.join(d, f"{name}.png"))
    return src


class TestAssign:
    def test_ratio_split_partitions_and_is_deterministic(self):
        pts = [f"P{i:03d}" for i in range(10)]
        a = assign_patients(pts, seed=1, ratios=[0.7, 0.2, 0.1])
        b = assign_patients(pts, seed=1, ratios=[0.7, 0.2, 0.1])
        assert a == b
        allp = a["training"] + a["val"] + a["test"]
        assert sorted(allp) == pts  # disjoint cover
        assert len(a["training"]) == 7 and len(a["val"]) == 2
        c = assign_patients(pts, seed=2, ratios=[0.7, 0.2, 0.1])
        assert c != a  # different seed, different shuffle

    def test_kfold_covers_every_patient_as_test_once(self):
        pts = [f"P{i:03d}" for i in range(11)]
        seen_test = []
        for fold in range(4):
            a = assign_patients(pts, seed=3, kfold=4, fold=fold)
            assert sorted(a["training"] + a["val"] + a["test"]) == pts
            assert not set(a["test"]) & set(a["val"])
            seen_test += a["test"]
        assert sorted(seen_test) == pts  # exact once

    def test_validation_errors(self):
        pts = [f"P{i}" for i in range(5)]
        with pytest.raises(SystemExit):
            assign_patients(pts, seed=0, ratios=[0.5, 0.5, 0.5])
        with pytest.raises(SystemExit):
            assign_patients(pts, seed=0, kfold=6)
        with pytest.raises(SystemExit):
            assign_patients(pts, seed=0, kfold=3, fold=3)

    def test_empty_split_configurations_rejected(self):
        pts = [f"P{i}" for i in range(6)]
        with pytest.raises(SystemExit):  # 2 folds leave train empty
            assign_patients(pts, seed=0, kfold=2)
        with pytest.raises(SystemExit):  # zero ratio empties its split
            assign_patients(pts, seed=0, ratios=[0.0, 0.5, 0.5])
        with pytest.raises(SystemExit):  # rounding can empty test too
            assign_patients(pts, seed=0, ratios=[0.9, 0.1, 0.0])


def test_split_cli_materializes_breadm_layout(tmp_path):
    src = _make_pool(str(tmp_path))
    res = split_cli.main([src, "--ratios", "0.6,0.2,0.2", "--seed", "0"])
    seg = os.path.join(src, "seg")
    assert sum(res["counts"].values()) == 7
    # the produced tree is a valid DatasetIndex source (symlinks resolve)
    from stf_unet_tpu.data.index import DatasetIndex
    seqs = ["VIBRANT+C1", "VIBRANT+C2"]
    total = 0
    for mode, split_name in (("train", "training"), ("val", "val"),
                             ("test", "test")):
        idx = DatasetIndex(src, mode, seqs)
        assert len(idx) == res["counts"][split_name]  # 1 slice/patient
        total += len(idx)
    assert total == 7
    # patient-level: no patient in two splits
    split_patients = [set(os.listdir(os.path.join(seg, s, "images")))
                      for s in ("training", "val", "test")]
    assert not (split_patients[0] & split_patients[1])
    assert not (split_patients[0] & split_patients[2])
    # pk_maps materialized only where the pool has them
    pk_total = sum(len(os.listdir(os.path.join(seg, s, "pk_maps")))
                   for s in ("training", "val", "test")
                   if os.path.isdir(os.path.join(seg, s, "pk_maps")))
    assert pk_total == 2

    # refuses to clobber without --force; --force rewrites
    with pytest.raises(SystemExit):
        split_cli.main([src])
    res2 = split_cli.main([src, "--force", "--kfold", "3", "--fold", "1"])
    assert sum(res2["counts"].values()) == 7

    # copy mode produces real files
    dest = str(tmp_path / "copydest")
    split_cli.main([src, "--dest", dest, "--mode", "copy"])
    some = os.path.join(dest, "seg", "training", "images")
    first = os.path.join(some, sorted(os.listdir(some))[0])
    assert not os.path.islink(first)


def test_split_then_train_end_to_end(tmp_path):
    """A split tree drives the full train CLI unchanged (symlinks resolve
    through the index/loader/native decoder)."""
    from stf_unet_tpu.cli import train as train_cli
    from stf_unet_tpu.core import config as config_lib

    src = _make_pool(str(tmp_path), n_patients=5)
    split_cli.main([src, "--ratios", "0.6,0.2,0.2"])
    cfg = config_lib.parse_config([
        "--data-path", src, "--model", "unet", "--epochs", "1",
        "--batch-size", "2", "--model-base-c", "4",
        "--data-base-size", "24", "--data-crop-size", "16",
        "--data-sequence-types", "VIBRANT+C1,VIBRANT+C2",
        "--save-dir", str(tmp_path / "w"),
        "--output-dir", str(tmp_path / "o"), "--silent", "true"])
    train_cli.main(cfg)
    assert os.path.exists(str(tmp_path / "w"))
